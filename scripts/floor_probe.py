"""Decompose the per-gate fixed floor (guide §1): what does a trivial gate
actually pay for? Times, min-of-N each:

  - noop_range:     spark.range(1) noop write           (job + commit floor)
  - noop_range32:   spark.range(32, numPartitions=32)   (32-task job floor)
  - read_schema:    spark.read.parquet(documents) construction only
                    (file listing + footer schema inference, driver-side)
  - read_cached:    spark.read.schema(known).parquet(...) construction only
  - scan_noop:      full q_scan_documents equivalent (read + select + noop)
  - shuffle_noop:   one groupBy over documents (adds 1 Exchange + AQE stage job)

Usage: python scripts/floor_probe.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from vectorflow_spark.session import get_spark

    spark = get_spark("floor_probe")
    doc_path = f"{sf_dir}/documents.parquet"

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timeit(label, fn):
        best = None
        for _ in range(n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label:>14}: {best * 1000:8.1f} ms (min of {n})")
        return best

    # warm
    noop(spark.range(1024, numPartitions=32))
    noop(spark.read.parquet(doc_path).select("doc_id", "text", "n_chars"))

    timeit("noop_range", lambda: noop(spark.range(1)))
    timeit("noop_range32", lambda: noop(spark.range(32, numPartitions=32)))
    timeit("read_schema", lambda: spark.read.parquet(doc_path))
    schema = spark.read.parquet(doc_path).schema
    timeit("read_cached", lambda: spark.read.schema(schema).parquet(doc_path))
    timeit(
        "scan_noop",
        lambda: noop(spark.read.parquet(doc_path).select("doc_id", "text", "n_chars")),
    )
    timeit(
        "scan_cached",
        lambda: noop(
            spark.read.schema(schema).parquet(doc_path).select("doc_id", "text", "n_chars")
        ),
    )
    timeit(
        "shuffle_noop",
        lambda: noop(
            spark.read.parquet(doc_path).groupBy("source").agg(F.count(F.lit(1)))
        ),
    )


if __name__ == "__main__":
    main()
