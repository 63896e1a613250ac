"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the given sf dir, then compares row count, column names, and values
(columns sorted by name, rows sorted by all columns — order-insensitive).
Floats are compared exactly first; on mismatch the max abs diff is reported
so near-misses (engine fold-order noise) are distinguishable from logic bugs.

With ``--record OUT.json`` the full per-query result table (rows, match
status, wall seconds, error text) is written as a committable artifact —
the diffable form of the "N/N oracle at sf X" claim (r10 verdict item
8), e.g. CORRECTNESS_full_r11.json.

Usage: python scripts/check_oracle.py [--record OUT.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
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
    argv = list(sys.argv[1:])
    record_path = None
    if "--record" in argv:
        i = argv.index("--record")
        record_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"status": "fail", "err": f"spark: {str(e)[:300]}"}
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            if len(spark_pdf) == 0:
                print(f"WARN {name}: zero rows")
            results[name] = {
                "status": "rows-only",
                "rows": len(spark_pdf),
                "s": round(time.time() - t0, 2),
            }
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"status": "fail", "err": f"duckdb: {str(e)[:300]}"}
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"     {p}")
            results[name] = {"status": "fail", "problems": problems}
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match ({time.time()-t0:.1f}s)")
            results[name] = {
                "status": "match",
                "rows": len(spark_pdf),
                "s": round(time.time() - t0, 2),
            }
    n_run = len([n for n in qs if not only or n in only])
    print(f"\n{failures} failures / {n_run} queries")
    if record_path:
        doc = {
            "sf_dir": sf_dir,
            "n_queries": n_run,
            "n_failures": failures,
            "n_match": sum(1 for r in results.values() if r["status"] == "match"),
            "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows-only"),
            "queries": dict(sorted(results.items())),
        }
        with open(record_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"recorded -> {record_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
