"""Deterministic distributed sampling for training-mixture construction.

Weighted sampling WITHOUT replacement at 100 TB cannot be a driver-side
loop or a rand()-seeded pass (irreproducible across retries, partitions,
and engines). Efraimidis & Spirakis (IPL 2006) reduce it to a top-k:
give every row the key u^(1/w) for uniform u and weight w, take the k
largest per stratum — the selection distribution is EXACTLY weighted
sampling without replacement, and top-k is what Spark's partial
WindowGroupLimit already does scalably.

Determinism discipline: u comes from the repo's portable md5-substring
hash of the row id (28 bits, shifted to (0, 1]); the equivalent
ascending priority -ln(u)/w is rounded at 9 (the repo-wide float-parity
protocol for transcendental scores: ranking happens on the ROUNDED
value, id tiebreak, so both engines rank identical numbers). Weights
are normalized by ``w_scale`` to keep priorities O(1-10) where 9
decimals carry full resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["es_priority_expr", "weighted_sample_per_stratum"]

HASH_SPACE = float(1 << 28)


def es_priority_expr(id_col: str, weight_col: str, w_scale: float, salt: str = "wsamp"):
    """Efraimidis-Spirakis priority -ln(u)/w as a Column. Smaller =
    sampled first. u = (h + 1) / 2^28 in (0, 1] from the portable md5
    hash, identical in DuckDB via ('0x' || substr(md5(...), 1, 7)).
    Priority is rounded at 9 BEFORE any ranking."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}"))), 1, 7),
        16,
        10,
    ).cast("bigint")
    w = F.col(weight_col).cast("double") / F.lit(w_scale)
    return F.round(F.log(F.lit(HASH_SPACE) / (h + 1).cast("double")) / w, 9)


def weighted_sample_per_stratum(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    w_scale: float = 1000.0,
) -> DataFrame:
    """k-row weighted sample without replacement per stratum:
    (stratum, id, weight, pri, rn). Inclusion probabilities follow
    sequential weighted draws (heavier rows first in expectation) — the
    mixture-construction primitive: "k documents per domain, favoring
    longer/higher-quality ones", reproducible across runs, engines, and
    cluster sizes.

    Plan: one hash projection + a per-stratum top-k window, which Spark
    executes as partial WindowGroupLimit on the map side — every
    partition forwards at most k rows per stratum, so the shuffle is
    sample-sized, not data-sized. Rows with weight <= 0 are excluded
    (they would get infinite priority; the caller's contract)."""
    pri = es_priority_expr(id_col, weight_col, w_scale)
    base = (
        df.filter(F.col(weight_col) > 0)
        .select(
            F.col(stratum_col).alias("stratum"),
            F.col(id_col).alias("id"),
            F.col(weight_col).alias("weight"),
            pri.alias("pri"),
        )
    )
    w_spec = Window.partitionBy("stratum").orderBy(F.col("pri").asc(), F.col("id").asc())
    return (
        base.withColumn("rn", F.row_number().over(w_spec))
        .filter(F.col("rn") <= k)
    )
