"""Freeze per-gate sf1 budgets into BENCH_sf1_budgets.json.

Merges one or more sf1 run records (BENCH_sf1_r9.json and later fill /
touched runs; later files WIN for gates present in both — they are
newer measurements) into the budget file the standing gate
(scripts/bench_sf1.py --touched) classifies against. Refuses to freeze
a gate whose measured alpha exceeds 1.0 unless an adjudication for it is
passed via --adjudicate name=reason (super-linear scaling must never be
frozen silently).

Usage:
    python scripts/make_sf1_budgets.py RECORD.json [RECORD2.json ...]
        [--round N] [--adjudicate q_x="reason"] [--out BENCH_sf1_budgets.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("records", nargs="+")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--adjudicate", action="append", default=[])
    ap.add_argument("--out", default=os.path.join(repo, "BENCH_sf1_budgets.json"))
    args = ap.parse_args()

    adjudications: dict[str, str] = {}
    for item in args.adjudicate:
        name, _, reason = item.partition("=")
        if not reason:
            raise SystemExit(f"--adjudicate needs name=reason, got {item!r}")
        adjudications[name] = reason

    queries: dict[str, dict] = {}
    for path in args.records:
        with open(path) as f:
            rec = json.load(f)
        src = os.path.basename(path)
        for name, r in rec["queries"].items():
            queries[name] = {
                "sf1_s": r["sf1_s"],
                "sf01_s": r.get("sf01_s"),
                "alpha": r.get("alpha"),
                "source": src,
            }

    bad = {
        n: q["alpha"]
        for n, q in queries.items()
        if q["alpha"] is not None and q["alpha"] > 1.0 and n not in adjudications
    }
    if bad:
        print(f"REFUSED: super-linear gates need --adjudicate: {bad}", file=sys.stderr)
        sys.exit(2)

    doc = {
        "frozen_from_round": args.round,
        "tol": 2.0,
        "abs_slack": 0.75,
        "adjudications": adjudications,
        "n_queries": len(queries),
        "queries": dict(sorted(queries.items())),
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"froze {len(queries)} sf1 budgets (round {args.round}) -> {args.out}")


if __name__ == "__main__":
    main()
