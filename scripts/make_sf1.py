"""Deterministic sf1 synthesis: scale the driver's sf0.1 tables 10x for
the scaling probe's extra decade (BASELINE.md sf1 column).

/root/testdata is read-only and ships no sf1, so the probe's fourth data
point is derived locally: K=10 key-shifted copies of every sf0.1 table,
written once to --out (default /root/repo/.scaledata/sf1, gitignored).
Pure SQL over DuckDB — no RNG, so the corpus is bit-stable across runs.

Key discipline (what makes the copy a faithful 10x and not a degenerate
one):

* every primary key and the foreign keys referencing it shift by the
  same copy stride (10^7 > any sf0.1 key), so join fan-outs per key are
  IDENTICAL to sf0.1 — a join that touched k rows/key at sf0.1 touches
  k rows/key at sf1, with 10x as many keys. region/nation stay fixed
  (TPC-H dimension semantics: they do not grow with sf).
* documents text in copy k>0 gets a per-copy token suffix ("tok~k"), so
  copies share NO shingles: near-dup structure within a copy is
  preserved exactly and no cross-copy duplicate clusters appear — an
  identical-text replication would grow LSH/Jaccard pair counts ~100x
  (quadratic in duplicates) and the probe would measure the distorted
  workload, not the engine. This models 10 disjoint crawl shards.
* embeddings rotate by k positions: norms and coordinate distributions
  unchanged, cross-copy cosines decorrelated (no fake semantic dups).

Usage: python scripts/make_sf1.py [--src /root/testdata/sf0.1] [--out DIR] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

STRIDE = 10_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scaledata/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE ks AS SELECT unnest(range({args.copies})) AS k")

    def emit(table: str, select_sql: str, cross: bool = True) -> None:
        src = f"'{args.src}/{table}.parquet'"
        frm = f"{src} CROSS JOIN ks" if cross else src
        q = f"COPY (SELECT {select_sql} FROM {frm}) TO '{args.out}/{table}.parquet' (FORMAT PARQUET)"
        con.execute(q)
        n = con.execute(f"SELECT count(*) FROM '{args.out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    emit("region", "*", cross=False)
    emit("nation", "*", cross=False)
    # names get a per-copy PREFIX for k>0 ('c3_...'): identical names
    # replicated 10x would create cross-copy matches in name-keyed
    # operators — blocked fuzzy linkage both grows first-token blocks 10x
    # (quadratic distinct-name comparisons) and expands each name pair
    # through 10x10 id joins, a ~100x blowup the real corpus lacks. A
    # prefix changes the BLOCK key too, so every copy keeps sf0.1's exact
    # block-size distribution; substring/LIKE predicates on name bodies
    # still match.
    def prefixed(col: str) -> str:
        return f"CASE WHEN k = 0 THEN {col} ELSE 'c' || k || '_' || {col} END AS {col}"

    emit(
        "customer",
        f"c_custkey + k*{STRIDE} AS c_custkey, {prefixed('c_name')}, "
        "c_nationkey, c_acctbal, c_mktsegment",
    )
    emit(
        "supplier",
        f"s_suppkey + k*{STRIDE} AS s_suppkey, {prefixed('s_name')}, s_nationkey, s_acctbal",
    )
    emit(
        "part",
        f"p_partkey + k*{STRIDE} AS p_partkey, {prefixed('p_name')}, "
        "p_brand, p_type, p_size, p_retailprice",
    )
    emit(
        "orders",
        f"o_orderkey + k*{STRIDE} AS o_orderkey, o_custkey + k*{STRIDE} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    emit(
        "lineitem",
        f"l_orderkey + k*{STRIDE} AS l_orderkey, l_partkey + k*{STRIDE} AS l_partkey, "
        f"l_suppkey + k*{STRIDE} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
    )
    emit(
        "events",
        f"event_id + k*{STRIDE} AS event_id, ts, user_id + k*{STRIDE} AS user_id, "
        "event_type, value, props",
    )
    emit(
        "documents",
        f"doc_id + k*{STRIDE} AS doc_id, "
        "CASE WHEN k = 0 THEN text ELSE array_to_string("
        "list_transform(list_filter(string_split_regex(text, '\\s+'), t -> t != ''), "
        "t -> t || '~' || k), ' ') END AS text, "
        "lang, source, "
        "CAST(length(CASE WHEN k = 0 THEN text ELSE array_to_string("
        "list_transform(list_filter(string_split_regex(text, '\\s+'), t -> t != ''), "
        "t -> t || '~' || k), ' ') END) AS BIGINT) AS n_chars",
    )
    emit(
        "embeddings",
        f"vec_id + k*{STRIDE} AS vec_id, "
        "CASE WHEN k = 0 THEN embedding ELSE "
        "list_concat(embedding[k+1:], embedding[1:k]) END AS embedding, label",
    )
    print(f"done -> {args.out}")


if __name__ == "__main__":
    main()
