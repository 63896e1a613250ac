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


def span_overlap_counts(
    spans: "DataFrame",
    incidents: "DataFrame",
    day_ns: int,
    user_col: str = "user_id",
    day_col: str = "day_id",
) -> "DataFrame":
    """(n_spans, n_users) of per-(user, day) activity spans overlapping
    each sub-day incident window — WITHOUT materializing the overlap
    pairs.

    The pair join (binned or not) is O(output): a 1-hour window over a
    busy day overlaps nearly every active user's span, so the pair set is
    |incidents| x |active users| — 7.2M rows at sf0.1, unbounded at
    100 TB — all to compute two counts per incident. This operator uses
    order statistics instead. Spans are day-confined (min/max of a day's
    events) and windows shorter than a day, so an incident [t0, t1]
    touches at most days ds = t0 div day and de = t1 div day:

      same-day (ds == de):   n = N_ds - |s_start > t1| - |s_end < t0|
                             (the two excluded sets are disjoint)
      cross-midnight:        P = N_ds - |s_end < t0|   (day-ds overlaps)
                             Q = N_de - |s_start > t1| (day-de overlaps)
                             n_spans = P + Q
                             n_users = P + Q - R,  R = |users whose ds
                             AND ds+1 spans both overlap|

    The rank terms come from ONE sorted-merge pass per boundary column:
    union spans with incident probes, window per day, running count of
    span rows (span-before-probe tie order for <=, probe-before-span for
    strict <) — |spans| + |incidents| rows per pass, two passes. R joins
    the ~1/24 of incidents that cross midnight against per-user
    consecutive-day span tuples — both sides small. Every identity is
    exact integer set arithmetic, so results hash-match the pair-join
    formulation row for row.

    At extreme per-day cardinalities replace the per-day window with the
    distributed ranking operator (operators/ranking.py) partitioned by
    (day, shard); days bound the groups here."""
    from pyspark.sql import Window

    D = int(day_ns)
    inc = incidents.select(
        "event_id",
        "i_start",
        "i_end",
        F.expr(f"i_start div {D}").alias("_ds"),
        F.expr(f"i_end div {D}").alias("_de"),
    )
    sp = spans.select(
        F.col(user_col).alias("_u"),
        F.col(day_col).alias("_d"),
        "s_start",
        "s_end",
    )
    n_day = sp.groupBy("_d").agg(F.count(F.lit(1)).alias("_nd"))

    def rank_pass(value_col: str, probes, probe_day: str, probe_val: str, strict: bool, out: str):
        """Running span-count per probe: spans contribute (day, v, 1);
        probes read the inclusive running sum. Tie order encodes <= vs <."""
        s_rows = sp.select(
            F.col("_d").alias("_day"),
            F.col(value_col).alias("_v"),
            F.lit(1).alias("_is_span"),
            F.lit(None).cast("long").alias("event_id"),
        )
        p_rows = probes.select(
            F.col(probe_day).alias("_day"),
            F.col(probe_val).alias("_v"),
            F.lit(0).alias("_is_span"),
            "event_id",
        )
        # <=: spans sort before probes at equal value (desc on _is_span);
        # < : probes first, so equal-valued spans are excluded
        order = F.col("_is_span").asc() if strict else F.col("_is_span").desc()
        w = (
            Window.partitionBy("_day")
            .orderBy(F.col("_v"), order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        merged = s_rows.unionByName(p_rows).withColumn("_cnt", F.sum("_is_span").over(w))
        return merged.filter(F.col("_is_span") == 0).select("event_id", F.col("_cnt").alias(out))

    # pass 1 over s_start: cnt_le_start = |s_start <= i_end| in the probe day
    # (same-day probes use day ds; cross-midnight probes day de)
    start_probes = inc.select(
        "event_id", F.when(F.col("_ds") == F.col("_de"), F.col("_ds")).otherwise(F.col("_de")).alias("_pd"), "i_end"
    )
    le_start = rank_pass("s_start", start_probes, "_pd", "i_end", strict=False, out="_le_start")
    # pass 2 over s_end: cnt_lt_end = |s_end < i_start| in day ds (both cases)
    end_probes = inc.select("event_id", F.col("_ds").alias("_pd"), "i_start")
    lt_end = rank_pass("s_end", end_probes, "_pd", "i_start", strict=True, out="_lt_end")

    base = (
        inc.join(le_start, "event_id")
        .join(lt_end, "event_id")
        .join(n_day.withColumnRenamed("_d", "_ds").withColumnRenamed("_nd", "_n_ds"), "_ds", "left")
        .join(n_day.withColumnRenamed("_d", "_de").withColumnRenamed("_nd", "_n_de"), "_de", "left")
        .na.fill({"_n_ds": 0, "_n_de": 0})
    )

    # cross-midnight double-count correction: users whose consecutive-day
    # spans BOTH overlap. Small x small: ~1/day_len of incidents vs
    # per-user (day, day+1) span tuples.
    d0 = sp.select(F.col("_u"), F.col("_d"), F.col("s_end").alias("_x"))
    d1 = sp.select(F.col("_u"), (F.col("_d") - 1).alias("_d"), F.col("s_start").alias("_y"))
    tuples = d0.join(d1, ["_u", "_d"])
    cross = inc.filter(F.col("_ds") != F.col("_de"))
    r_cnt = (
        cross.join(tuples, cross._ds == tuples._d)
        .filter((F.col("_x") >= F.col("i_start")) & (F.col("_y") <= F.col("i_end")))
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("_r"))
    )

    out = base.join(r_cnt, "event_id", "left").na.fill({"_r": 0})
    same = F.col("_ds") == F.col("_de")
    # same-day: probes measured in day ds; le_start = |s_start <= i_end|
    n_spans = F.when(
        same,
        (F.col("_le_start") - F.col("_lt_end")),
    ).otherwise(
        (F.col("_n_ds") - F.col("_lt_end")) + F.col("_le_start")
    )
    n_users = F.when(same, n_spans).otherwise(n_spans - F.col("_r"))
    return (
        out.select(
            "event_id",
            n_spans.cast("long").alias("n_spans"),
            n_users.cast("long").alias("n_users"),
        )
        .filter(F.col("n_spans") > 0)
    )
