"""Mergeable frequency sketches: count-min.

A count-min sketch is the scale answer to "how often does each of
billions of keys occur" when the key cardinality itself is too big to
materialize: a d x w grid of counters, each key incrementing one counter
per row (d hash functions), estimate = min over its d counters. Counters
only ever ADD, so the sketch is mergeable across partitions, days, and
corpora — the property exact histograms lose the moment two pipelines
must combine.

Spark-first construction: the sketch build IS a groupBy — explode each
key occurrence into its d (row, col) cells and sum per cell. Map-side
combine collapses each partition to at most d*w cell rows before the
shuffle, so the exchange is bounded by the SKETCH size, not the data
(the same reason a 100 TB build is one pass). Point estimates join the
queried keys against the d*w cell table (broadcast — the sketch is tiny
by construction).

Hashing is the repo's portable md5-substring construction
(dedup.shingle_hash_expr) with a per-row seed suffix, so every cell
value — and therefore every estimate — is integer-exact and reproducible
in ANSI SQL for the oracle. The count-min guarantee: estimates never
undercount, and overcount by more than 2N/w with probability at most
(1/2)^d.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_cell_expr", "cms_build", "cms_estimate", "cms_heavy_hitters"]

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 64


def cms_cell_expr(key: Column, seed: int, width: int) -> Column:
    """Column index of ``key`` in sketch row ``seed``: 31-bit md5-substring
    hash of ``key || '|' || seed``, mod width. Same bits in DuckDB via
    ('0x' || substr(md5(...), 1, 7))::BIGINT % width."""
    salted = F.concat(key.cast("string"), F.lit(f"|{seed}"))
    h = F.conv(F.substring(F.md5(salted), 1, 7), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch: (row_id, col_id, cnt) cell rows, one shuffle whose
    volume is min(d * distinct-keys-per-partition, d * w) per partition
    thanks to partial aggregation. Cells with zero hits are simply absent
    (estimates treat missing as 0)."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("row_id"),
                    cms_cell_expr(F.col(key_col), s, width).alias("col_id"),
                )
                for s in range(depth)
            ]
        )
    )
    return (
        df.select(cells.alias("c"))
        .groupBy(F.col("c.row_id").alias("row_id"), F.col("c.col_id").alias("col_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: explode each key
    into its d (row, col) addresses, broadcast-join the cell table, min
    over the d counters. Never undercounts."""
    addr = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("row_id"),
                    cms_cell_expr(F.col(key_col), s, width).alias("col_id"),
                )
                for s in range(depth)
            ]
        )
    )
    addressed = keys.select(key_col, addr.alias("a")).select(
        key_col, F.col("a.row_id").alias("row_id"), F.col("a.col_id").alias("col_id")
    )
    joined = addressed.join(F.broadcast(sketch), ["row_id", "col_id"], "left").fillna(
        0, subset=["cnt"]
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Keys whose count-min ESTIMATE meets ``threshold`` — the sketch-side
    heavy-hitter report. Because estimates never undercount, this set is a
    SUPERSET of the true heavy hitters (no false negatives, bounded false
    positives: P[overcount > 2N/w] <= (1/2)^d per key); callers needing the
    exact set verify the survivors with one exact count over this usually
    tiny key list. Plan: sketch build (sketch-sized shuffle) + estimate of
    each distinct key (broadcast of the d*w cell table) + filter; the
    distinct-key aggregation is the only data-sized exchange and is
    map-side combined."""
    sketch = cms_build(df, key_col, depth, width)
    keys = df.select(key_col).distinct()
    est = cms_estimate(sketch, keys, key_col, depth, width)
    return est.filter(F.col("est") >= threshold)
