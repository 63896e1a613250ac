"""Event-stream analytics: ordered funnels and time-series gap filling.

Product-analytics primitives a training-data pipeline reuses for corpus
telemetry (ingest stage conversion, per-source hourly volumes with
quiet-hour carry-forward). Both are expressed as pure DataFrame plans so
Catalyst sees every filter and the oracle can mirror them in ANSI SQL.

Reference parity note: the reference tracks pipeline progression as
job-status counters (src/services/database/job_service.py:32-51); a funnel
over stage-transition events is the same rollup generalized to ordered
stages with strict-precedence semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel_conversion", "gap_fill_locf"]


def funnel_conversion(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: a user converts to stage k only via an event
    of type ``stages[k]`` STRICTLY AFTER their stage-(k-1) conversion time
    (first qualifying event wins). Returns one row per declared stage:
    (stage_idx, stage, n_users) — one DataFrame plan, no driver-side
    count() per stage.

    Builds the chained per-user conversion timestamps with stage-filtered
    aggregations joined on the user key, then unpivots the stage columns
    and counts non-nulls. Plan at scale: k aggregations all grouped on the
    SAME user key (AQE keeps them co-partitioned; only the first shuffle
    moves the full event set — later stages join the shrinking converted
    set); the unpivot is a stack() over k columns of one row per stage-0
    converter."""
    if not stages:
        raise ValueError("stages must be non-empty")
    t = F.col(ts_col)

    per_user = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t0"))
    )
    for k, stage in enumerate(stages[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == stage)
            .join(per_user.select(user_col, F.col(f"_t{k - 1}")), user_col)
            .filter(t > F.col(f"_t{k - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"_t{k}"))
        )
        per_user = per_user.join(nxt, user_col, "left")

    stage_exprs = ", ".join(
        f"{k}, '{s}', _t{k}" for k, s in enumerate(stages)
    )
    unpivoted = per_user.selectExpr(
        f"stack({len(stages)}, {stage_exprs}) AS (stage_idx, stage, conv_ts)"
    )
    return (
        unpivoted.groupBy("stage_idx", "stage")
        .agg(F.count("conv_ts").alias("n_users"))
    )


def gap_fill_locf(
    events: DataFrame,
    bucket,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an event stream onto a fixed integer time grid per key
    and forward-fill (last-observation-carried-forward) the buckets with
    no events. ``bucket`` is an integer Column mapping each event to its
    grid cell (e.g. ``F.expr("ts div 3600000000000")`` for hour ids over
    nano timestamps — integer bucket ids are also timezone-proof across
    engines). Returns (key, bucket_id, filled_value double, was_gap bool);
    leading buckets before a key's first observation stay NULL.

    Construction: bucket-aggregate (decimal-exact sums), build the dense
    spine as sequence(min_bucket, max_bucket) x distinct keys, left-join
    the aggregates onto the spine, then one last(ignorenulls) window per
    key. Plan at scale: the spine is |keys| x |buckets| rows generated
    from a 1-row bound aggregate — no driver collect; the LOCF window is
    one shuffle on the key, and the running frame is computed in a single
    pass per partition. Skewed keys don't exist by construction (every
    key has the same bucket count).
    """
    hourly = (
        events.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket_id"))
        .agg(F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_v"))
    )
    bounds = events.agg(F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi"))
    keys = events.select(F.col(key_col).alias("key")).distinct()
    spine = (
        keys.join(F.broadcast(bounds))
        .select(
            "key",
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket_id"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["key", "bucket_id"], "left")
        .select(
            "key",
            "bucket_id",
            F.last(F.col("_v"), ignorenulls=True).over(w).cast("double").alias("filled_value"),
            F.col("_v").isNull().alias("was_gap"),
        )
    )
