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

__all__ = ["merge_upsert", "row_digest", "scd2_apply", "snapshot_diff"]


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


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics (SCD type 1) as one DataFrame plan — the
    upsert/delete primitive around every incremental refresh:

      * WHEN MATCHED [AND NOT source.delete] THEN UPDATE — source values
        replace the target row;
      * WHEN MATCHED AND source.``delete_col`` THEN DELETE;
      * WHEN NOT MATCHED [AND NOT delete] THEN INSERT;
      * target rows with no source match pass through unchanged.

    ``source`` must carry the key columns plus the same value columns as
    ``target`` (and optionally a boolean ``delete_col``); one row per key.

    Plan at scale: ONE full-outer join on the key is the only shuffle —
    the same shape as ``snapshot_diff``/``scd2_apply``, so bucketed or
    z-ordered snapshots degrade it to a co-located merge. No table format
    required: compose with ``sinks.writers.versioned_write`` (see
    ``versioned_merge`` there) to get Delta-style MERGE + time travel on
    plain parquet with a manifest commit."""
    value_cols = [c for c in target.columns if c not in set(key_cols)]
    missing = [c for c in value_cols if c not in set(source.columns)]
    if missing:
        raise ValueError(f"source is missing value columns {missing}")
    t = target.select(
        *key_cols,
        *[F.col(c).alias(f"_t_{c}") for c in value_cols],
        F.lit(True).alias("_t_present"),
    )
    src_cols = [
        *key_cols,
        *[F.col(c).alias(f"_s_{c}") for c in value_cols],
        (
            F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
            if delete_col
            else F.lit(False)
        ).alias("_s_delete"),
        F.lit(True).alias("_s_present"),
    ]
    s = source.select(*src_cols)
    j = t.join(s, key_cols, "full_outer")
    survives = ~(F.coalesce(F.col("_s_present"), F.lit(False)) & F.col("_s_delete"))
    picked = [
        F.when(F.coalesce(F.col("_s_present"), F.lit(False)), F.col(f"_s_{c}"))
        .otherwise(F.col(f"_t_{c}"))
        .alias(c)
        for c in value_cols
    ]
    return j.filter(survives).select(*key_cols, *picked)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    effective_ts,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge: apply ``updates`` (one row
    per key, attribute columns only) to a versioned dimension ``current``
    (attribute columns + valid_from/valid_to, open rows have
    valid_to IS NULL) as of ``effective_ts`` (a Column or literal).

    Emitted rows:
      * closed history rows of ``current`` — untouched;
      * open rows whose key is absent from updates, or present with an
        identical attribute digest — untouched;
      * open rows whose update differs — CLOSED with valid_to=effective;
      * one new OPEN row per changed or brand-new key.

    Plan at scale: digests collapse the comparison to one 32-byte column
    per side, the single full-outer join on the key is the only shuffle,
    and each branch is a filter over that join's output (Catalyst shares
    the join across the union via plan reuse). This is the MERGE INTO
    WHEN MATCHED/NOT MATCHED shape expressed as a pure DataFrame plan —
    no table format required, so it runs identically over parquet
    snapshots."""
    eff = effective_ts if not isinstance(effective_ts, str) else F.lit(effective_ts).cast("timestamp")
    open_rows = current.filter(F.col(valid_to_col).isNull())
    closed_rows = current.filter(F.col(valid_to_col).isNotNull())

    cur_d = open_rows.withColumn("_cur_digest", row_digest(compare_cols))
    upd_d = updates.select(
        *key_cols,
        *[F.col(c).alias(f"_u_{c}") for c in compare_cols],
    ).withColumn("_new_digest", row_digest([f"_u_{c}" for c in compare_cols]))

    j = cur_d.join(upd_d, key_cols, "full_outer")
    matched_same = j.filter(
        F.col("_cur_digest").isNotNull() & (F.col("_cur_digest") == F.col("_new_digest"))
    )
    matched_diff = j.filter(
        F.col("_cur_digest").isNotNull()
        & F.col("_new_digest").isNotNull()
        & (F.col("_cur_digest") != F.col("_new_digest"))
    )
    cur_only = j.filter(F.col("_new_digest").isNull())
    upd_new = j.filter(F.col("_cur_digest").isNull())

    keep_cols = [*key_cols, *compare_cols, valid_from_col, valid_to_col]
    unchanged = matched_same.select(*keep_cols).unionByName(cur_only.select(*keep_cols))
    closed = matched_diff.select(
        *key_cols,
        *compare_cols,
        F.col(valid_from_col),
        eff.alias(valid_to_col),
    )
    opened = (
        matched_diff.unionByName(upd_new, allowMissingColumns=False)
        .select(
            *key_cols,
            *[F.col(f"_u_{c}").alias(c) for c in compare_cols],
            eff.alias(valid_from_col),
            F.lit(None).cast(current.schema[valid_to_col].dataType).alias(valid_to_col),
        )
    )
    return (
        closed_rows.select(*keep_cols)
        .unionByName(unchanged)
        .unionByName(closed)
        .unionByName(opened)
    )
