"""Full-suite sf1 bench (r8 verdict item 1): run EVERY queries() entry
(plus e2e_pipeline) at sf1 (.scaledata/sf1, scripts/make_sf1.py) and
record per-gate alpha(0.1 -> 1) against a same-code sf0.1 run — the
budgets and most scaling probes only cover sf0.1, so this converts
"plans I'd trust at 100x" from argued to measured for the whole suite.

Noise protocol: alpha > 1 is exactly the signal we must DETECT, so it
cannot be retried away wholesale — instead a query whose first sf1 run
lands above its LINEAR bound (sf0.1 time x 10, i.e. apparent alpha > 1)
is re-run once and the min kept: the periodic host load rarely strikes
the same query twice, while a genuinely super-linear gate stays above
the bound on both runs and gets flagged. Queries inside the linear
bound keep their first measurement.

Usage:
    python scripts/bench_sf1.py [--sf01 scripts/bench_r9_local.json]
                                [--sf1-dir /root/repo/.scaledata/sf1]
                                [--out BENCH_sf1_r9.json]
Prints ONE JSON line and writes it to --out.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def load_sf01(path: str) -> dict[str, float]:
    with open(path) as f:
        text = f.read()
    line = [ln for ln in text.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    if float(d.get("sf", -1)) != 0.1:
        raise SystemExit(f"{path} is not an sf0.1 bench output")
    return {k: float(v) for k, v in d["queries"].items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", default=os.path.join(repo, "scripts", "bench_r9_local.json"))
    ap.add_argument("--sf1-dir", default=os.path.join(repo, ".scaledata", "sf1"))
    ap.add_argument("--out", default=os.path.join(repo, "BENCH_sf1_r9.json"))
    args = ap.parse_args()

    sf01 = load_sf01(args.sf01)

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from vectorflow_spark.config import ChunkStrategy, PipelineConfig
    from vectorflow_spark.pipeline import run_pipeline
    from vectorflow_spark.session import get_spark

    spark = get_spark("bench_sf1")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    t_all = time.time()
    # same warmup as bench.py: pandas-UDF worker pool + interpreted-HOF JIT
    _warm = F.pandas_udf(lambda s: s, LongType())
    spark.range(1024, numPartitions=32).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()
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

    results: dict[str, dict] = {}
    items = list(entrymod.queries().items())
    for n_done, (name, fn) in enumerate(items):
        t0 = time.time()
        materialize(fn(spark, args.sf1_dir))
        t = time.time() - t0
        attempts = [round(t, 3)]
        base = sf01.get(name)
        linear = (base * 10) if base else None
        if linear is not None and t > max(linear, 1.0):
            t1 = time.time()
            materialize(fn(spark, args.sf1_dir))
            attempts.append(round(time.time() - t1, 3))
            t = min(attempts)
        alpha = (
            round(math.log10(max(t, 1e-3) / base), 3)
            if base and base > 0
            else None
        )
        results[name] = {
            "sf1_s": round(t, 3),
            "sf01_s": base,
            "alpha": alpha,
            "attempts": attempts,
        }
        print(
            f"[{n_done + 1}/{len(items)}] {name}: sf1 {t:.2f}s "
            f"(sf0.1 {base}, alpha {alpha})",
            file=sys.stderr,
            flush=True,
        )

    t0 = time.time()
    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.EXACT_BY_CHARACTERS,
        chunk_size=512,
        chunk_overlap=256,
        embeddings_type="deterministic",
        embedding_dim=64,
    )
    docs = spark.read.parquet(os.path.join(args.sf1_dir, "documents.parquet"))
    materialize(run_pipeline(docs, cfg))
    t = time.time() - t0
    base = sf01.get("e2e_pipeline")
    results["e2e_pipeline"] = {
        "sf1_s": round(t, 3),
        "sf01_s": base,
        "alpha": round(math.log10(t / base), 3) if base else None,
        "attempts": [round(t, 3)],
    }

    superlinear = {
        k: v for k, v in results.items() if v["alpha"] is not None and v["alpha"] > 1.0
    }
    doc = {
        "metric": "sf1_suite",
        "sf": 1.0,
        "sf01_source": os.path.basename(args.sf01),
        "n_queries": len(results),
        "total_sf1_s": round(sum(v["sf1_s"] for v in results.values()), 3),
        "wall_clock_s": round(time.time() - t_all, 3),
        "superlinear": sorted(superlinear),
        "superlinear_count": len(superlinear),
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: doc[k] for k in doc if k != "queries"}))


if __name__ == "__main__":
    main()
