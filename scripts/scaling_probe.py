"""Scaling-curve probe: time the most expensive queries across sf0.001 /
sf0.01 / sf0.1 in ONE warmed session and report the time-vs-data slope.

This is the empirical half of the 100x-scale claim the plan docstrings
make analytically: for each query, the effective scaling exponent
``alpha = log10(t_sf0.1 / t_sf0.01)`` (the SFs differ 10x in data, so
alpha ~ 1 is linear, < 1 is fixed-overhead-dominated, > 1 super-linear).
The sf0.001 -> sf0.01 leg is recorded too but is overhead-dominated
(JVM/jobs setup floors small-SF timings), so the headline slope is the
0.01 -> 0.1 leg. Each timing is the min of N attempts within the warmed
session — the host has a periodic external load that can inflate any
single run 5-10x.

Usage: python scripts/scaling_probe.py [--queries q1,q2,...] [--attempts N]
                                       [--sf1 DIR]
Prints one markdown table + one JSON line (for BASELINE.md).

``--sf1`` adds a fourth decade from locally synthesized 10x data
(scripts/make_sf1.py; /root/testdata ships no sf1) so queries whose
0.01->0.1 slope is still fixed-overhead-dominated (alpha ~ 0) get a
point where data cost exceeds round cost. Its slope column is
alpha1 = log10(t_sf1 / t_sf0.1).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["0.001", "0.01", "0.1"]

# the judge-audited >2s set from the round-2 bench, plus the two flagship
# iterative/audit queries whose slopes need explaining
DEFAULT_QUERIES = [
    "q_lsh_recall",
    "q_dedup_components",
    "q_pagerank3",
    "q_mad_prices",
    "q_winsorized_stats",
    "q_fuzzy_name_pairs",
    "q_ivfpq_search",
    "q_minhash_band_pairs",
    "q_important_parts",
    "q_late_priority",
    "q_triangle_count",
    "q_semantic_dedup",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--sf1", default=None, help="dir of make_sf1.py output; adds the sf1 decade")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    from vectorflow_spark.queries import QUERIES
    from vectorflow_spark.session import get_spark

    spark = get_spark("scaling_probe", cpus=32)

    # warm the JVM: one scan + one interpreted-HOF-heavy query (first HOF
    # query in a fresh JVM pays 10-50s of JIT that later runs do in 2-3s)
    materialize(QUERIES["q_scan_documents"](spark, "/root/testdata/sf0.01"))
    materialize(QUERIES["q_topk_cosine"](spark, "/root/testdata/sf0.01"))

    results: dict[str, dict[str, float]] = {}
    for name in names:
        if name not in QUERIES:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        per_sf: dict[str, float] = {}
        dirs = [(sf, f"/root/testdata/sf{sf}") for sf in SFS]
        if args.sf1:
            dirs.append(("1", args.sf1))
        for sf, sf_dir in dirs:
            best = float("inf")
            for _ in range(args.attempts):
                t0 = time.monotonic()
                materialize(QUERIES[name](spark, sf_dir))
                best = min(best, time.monotonic() - t0)
            per_sf[sf] = round(best, 3)
            print(f".. {name} sf{sf}: {per_sf[sf]:.2f}s", file=sys.stderr)
        results[name] = per_sf

    import math

    sf1_cols = " sf1 s | alpha (0.1→1) |" if args.sf1 else ""
    print(f"| query | sf0.001 s | sf0.01 s | sf0.1 s | alpha (0.01→0.1) |{sf1_cols}")
    print("|---|---|---|---|---|" + ("---|---|" if args.sf1 else ""))
    out = {}
    for name, per_sf in results.items():
        a, b, c = per_sf["0.001"], per_sf["0.01"], per_sf["0.1"]
        alpha = math.log10(c / b) if b > 0 else float("nan")
        flag = " **super-linear**" if alpha > 1.05 else ""
        row = f"| {name} | {a:.2f} | {b:.2f} | {c:.2f} | {alpha:.2f}{flag} |"
        out[name] = {**per_sf, "alpha": round(alpha, 3)}
        if args.sf1:
            d = per_sf["1"]
            alpha1 = math.log10(d / c) if c > 0 else float("nan")
            flag1 = " **super-linear**" if alpha1 > 1.05 else ""
            row += f" {d:.2f} | {alpha1:.2f}{flag1} |"
            out[name]["alpha1"] = round(alpha1, 3)
        print(row)
    print(json.dumps({"probe": "scaling", "attempts": args.attempts, "results": out}))


if __name__ == "__main__":
    main()
