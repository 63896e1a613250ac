"""Per-gate construction-vs-action split profile (guide §1).

For every declared gate, times separately:
  - construct: fn(spark, sf_dir)  -> DataFrame   (driver-side: py4j, analysis,
    and any eager work the operator does at construction time)
  - action:    noop write of that DataFrame      (cluster-side execution)

min over N passes, warmed the same way bench.py warms. Writes one JSON file.

Usage: python scripts/profile_gates.py [out.json] [--passes N] [--only a,b,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = "/tmp/profile_gates.json"
    passes = 2
    only: set[str] | None = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--passes":
            passes = int(args.pop(0))
        elif a == "--only":
            only = set(args.pop(0).split(","))
        else:
            out_path = a

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from vectorflow_spark.session import get_spark

    spark = get_spark("profile")

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    _warm = F.pandas_udf(lambda s: s, LongType())
    spark.range(1024, numPartitions=32).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()
    hof = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(1), F.lit(64)),
            F.sequence(F.lit(1), F.lit(64)),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    spark.range(200_000, numPartitions=32).select(hof.alias("h")).write.format(
        "noop"
    ).mode("overwrite").save()

    qmap = entrymod.queries()
    rows: dict[str, dict] = {}
    for name, fn in qmap.items():
        if only is not None and name not in only:
            continue
        best_c, best_a = None, None
        for _ in range(passes):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            c, a = t1 - t0, t2 - t1
            best_c = c if best_c is None else min(best_c, c)
            best_a = a if best_a is None else min(best_a, a)
        rows[name] = {
            "construct": round(best_c, 3),
            "action": round(best_a, 3),
            "total": round(best_c + best_a, 3),
        }
        print(
            f"{name}: construct={best_c:.3f} action={best_a:.3f}",
            file=sys.stderr,
            flush=True,
        )

    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "passes": passes, "gates": rows}, f, indent=1)
    print(out_path)


if __name__ == "__main__":
    main()
