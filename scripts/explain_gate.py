"""Dump `.explain("formatted")` for named gates to plans/r11/<gate>_<tag>.txt.

Usage: python scripts/explain_gate.py <tag> <gate> [<gate> ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    gates = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from vectorflow_spark.session import get_spark

    spark = get_spark("explain_gate")
    qmap = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("VF_PLANS_DIR", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    for g in gates:
        df = qmap[g](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{g}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(txt)
        print(path)


if __name__ == "__main__":
    main()
