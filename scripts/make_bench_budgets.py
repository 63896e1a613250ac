"""Regenerate BENCH_budgets.json from the newest BENCH_r*.json at sf0.1.

Per-query budget = recorded_time * tolerance + absolute floor. The suite
2x gate compares AVERAGES, so a single query could triple while the
average improves; bench.py checks every query against its budget and
reports breaches in the JSON tail (budget_breaches / budget_breach_count)
the same way the driver's regression field works. Re-run this after a
round whose headline timings legitimately moved (corpus growth, new
operator work inside a gate query) and commit the result."""

from __future__ import annotations

import glob
import json
import os
import re
import sys

TOLERANCE = 2.0
ABS_FLOOR_S = 0.75  # sub-second queries breathe: JIT + scheduler noise

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_timings() -> tuple[str, dict[str, float]]:
    # an explicit raw bench-output file (one JSON line from bench.py)
    # wins — driver BENCH_r*.json snapshots sometimes hold only a
    # truncated 'tail' string
    paths = sys.argv[1:] or sorted(
        glob.glob(os.path.join(repo, "BENCH_r*.json")), reverse=True
    )
    for path in paths:
        with open(path) as f:
            text = f.read()
        try:
            # driver BENCH_r*.json snapshots are pretty-printed documents
            d = json.loads(text)
        except ValueError:
            # a raw bench run may have log noise before the one JSON line
            line = [ln for ln in text.splitlines() if ln.startswith("{")][-1]
            d = json.loads(line)
        if str(d.get("sf")) != "0.1":
            continue
        parsed = d.get("parsed") if isinstance(d.get("parsed"), dict) else d
        q = parsed.get("queries") if isinstance(parsed.get("queries"), dict) else None
        out = {k: float(v) for k, v in (q or {}).items()}
        if not out:
            for m in re.finditer(r'"(q_\w+|e2e_pipeline)":\s*([0-9.]+)', d.get("tail") or ""):
                out[m.group(1)] = float(m.group(2))
        if out:
            return os.path.basename(path), out
    raise SystemExit("no BENCH_r*.json with sf0.1 timings found")


def main() -> None:
    src, timings = newest_timings()
    budgets = {
        name: round(t * TOLERANCE + ABS_FLOOR_S, 3)
        for name, t in sorted(timings.items())
        if name != "_warmup"
    }
    # workload_revs survive regeneration: a rev entry records that a gate's
    # in-gate WORK changed (corpus grew, new operator work measured inside
    # it), so a flagged regression is attributable at a glance instead of
    # reading as a plan regression (r6 verdict item 4). Bump by hand when
    # you change what a gate measures; bench.py attaches the note to any
    # regression/breach it reports for that gate.
    workload_revs: dict = {}
    out = os.path.join(repo, "BENCH_budgets.json")
    try:
        with open(out) as f:
            workload_revs = json.load(f).get("workload_revs", {})
    except (OSError, ValueError):
        pass
    m = re.search(r"_r0*(\d+)", src)
    doc = {
        "source": src,
        "tolerance_ratio": TOLERANCE,
        "abs_floor_s": ABS_FLOOR_S,
        "sf": 0.1,
        "frozen_from_round": int(m.group(1)) if m else None,
        "policy": (
            "budgets are FROZEN from the PRIOR round's committed run and only "
            "regenerated with a recorded reason when a gate's workload "
            "legitimately changes (r6 verdict item 4); never regenerate from "
            "the current round's own run"
        ),
        "budgets": budgets,
        "workload_revs": workload_revs,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {len(budgets)} budgets from {src}", file=sys.stderr)


if __name__ == "__main__":
    main()
