"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the given sf dir, then compares row count, column names, and values
(columns sorted by name, rows sorted by all columns — order-insensitive).
Floats are compared exactly first; on mismatch the max abs diff is reported
so near-misses (engine fold-order noise) are distinguishable from logic bugs.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s = spark_pdf[s_cols].sort_values(s_cols, kind="mergesort").reset_index(drop=True)
    d = duck_pdf[d_cols].sort_values(d_cols, kind="mergesort").reset_index(drop=True)
    for c in s_cols:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sv = sv.astype("float64")
            dv = dv.astype("float64")
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                diff = (sv - dv).abs().max()
                problems.append(f"col {c}: {int((~eq).sum())} mismatches, max abs diff {diff!r}")
        else:
            sv = sv.astype(object).where(pd.notna(sv), None)
            dv = dv.astype(object).where(pd.notna(dv), None)
            neq = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
            if neq:
                i = neq[0]
                problems.append(
                    f"col {c}: {len(neq)} mismatches, first at row {i}: spark={sv[i]!r} duck={dv[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from vectorflow_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            if len(spark_pdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{failures} failures / {len([n for n in qs if not only or n in only])} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
