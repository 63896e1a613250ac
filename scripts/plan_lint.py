"""Sweep every QUERIES entry through the plan lint and print findings.

Triage CLI for the gate enforced by tests/test_plan_lint.py — the
classifier itself (finding codes, what "reduced" means, why each pattern
is a 100×-scale incident) lives in vectorflow_spark/planlint.py.

Usage: python scripts/plan_lint.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from vectorflow_spark.planlint import lint_plan
    from vectorflow_spark.queries import QUERIES
    from vectorflow_spark.session import get_spark

    spark = get_spark("plan_lint", cpus=8)
    n_flagged = 0
    for name in sorted(QUERIES):
        if only and name not in only:
            continue
        try:
            found = lint_plan(QUERIES[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(e).__name__}: {str(e)[:200]}")
            n_flagged += 1
            continue
        if found:
            n_flagged += 1
            print(f"{name}\t{','.join(sorted(set(found)))}")
    print(f"-- lint complete: {n_flagged} queries with findings --")


if __name__ == "__main__":
    main()
