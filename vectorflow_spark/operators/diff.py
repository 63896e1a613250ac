"""Snapshot diff: classify rows as added / removed / changed between two
versions of a table.

The data-versioning primitive a pipeline needs around every incremental
run: what did last night's ingest actually change? Implemented as one
full-outer join on the key with an md5 row digest over the compared
columns — the digest collapses arbitrarily wide rows to one comparison,
so the join carries (key, 32-byte digest) per side, not the payload.

Scale shape: the full-outer join is one shuffle on the key; when both
snapshots are written bucketed by the key (or z-ordered, operators/
layout.py), it degrades to a co-located merge with no exchange. Unchanged
keys — the overwhelming majority of a 100 TB snapshot pair — are dropped
inside the join's output filter before anything else happens to them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["row_digest", "snapshot_diff"]


def row_digest(cols: list[str]) -> Column:
    """md5 over the unit-separator-joined string forms of ``cols``. NULLs
    are encoded as a sentinel so (NULL) and ('') differ; the identical
    construction exists in ANSI SQL for the oracle."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
    return F.md5(F.concat_ws("\x1f", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Return (key_cols..., change) with change in {'added', 'removed',
    'changed'}; unchanged keys are filtered out inside the join output.
    ``compare_cols`` defaults to every non-key column shared by both
    sides."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(*key_cols, row_digest(compare_cols).alias("_old_digest"))
    n = new.select(*key_cols, row_digest(compare_cols).alias("_new_digest"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_old_digest").isNull(), F.lit("added"))
        .when(F.col("_new_digest").isNull(), F.lit("removed"))
        .when(F.col("_old_digest") != F.col("_new_digest"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )
