"""Temporal & relational extensions: as-of joins, anti joins, set ops, rollup/cube."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import _t, query
from vectorflow_spark.queries.similarity import _DUCK_COS


# ---------------------------------------------------------------------------
# Temporal / relational extensions: as-of join, anti join, set ops, rollup,
# JSON extraction
# ---------------------------------------------------------------------------


@query(
    "q_asof_join",
    """
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS ts, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, epoch_us(ts) AS ts, max(event_id) AS view_event_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT p.user_id, p.event_id, p.ts,
           v.ts AS asof_ts, v.view_event_id AS asof_view_event_id
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the latest view by the same
    user at-or-before the purchase instant. Implemented as the union-sort-
    window composition (operators/joins.py) — one shuffle on user_id, no
    range-join explosion; the oracle is DuckDB's native ASOF LEFT JOIN.
    Timestamps are compared in microseconds on both sides (DuckDB's parquet
    reader truncates TIMESTAMP(NANOS) to us)."""
    from vectorflow_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events").withColumn("ts", F.expr("ts div 1000"))
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    return asof_join(purchases, views, on="user_id", right_cols=["view_event_id"])


@query(
    "q_asof_cogrouped",
    """
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS ts, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, epoch_us(ts) AS ts, max(event_id) AS view_event_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT p.user_id, p.event_id, p.ts,
           v.ts AS asof_ts, v.view_event_id AS asof_view_event_id
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q_asof_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as q_asof_join through the other engine
    path: groupBy().cogroup().applyInPandas + pandas merge_asof (the
    escape hatch for per-key alignment logic the window plan can't
    express) — hash-checked against DuckDB's native ASOF LEFT JOIN, so
    both the declarative and the Arrow-cogroup implementations carry a
    driver-verified row.

    This pair is a deliberate cost-model measurement, not two equal
    options: cogroup invokes Python once per key (thousands of tiny
    frames here), so expect it several times slower than q_asof_join's
    union-sort-window plan at the same sf — the quantified tax you pay
    when the alignment logic genuinely needs Python, and the reason the
    declarative form is the default."""
    from vectorflow_spark.operators.joins import asof_join_cogrouped

    ev = _t(spark, sf_dir, "events").withColumn("ts", F.expr("ts div 1000"))
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    return asof_join_cogrouped(purchases, views, on="user_id", right_cols=["view_event_id"])


@query(
    "q_asof_forward_tol",
    """
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS ts, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, epoch_us(ts) AS ts, max(event_id) AS view_event_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT p.user_id, p.event_id, p.ts,
           CASE WHEN v.ts - p.ts <= 600000000 THEN v.ts END AS asof_ts,
           CASE WHEN v.ts - p.ts <= 600000000 THEN v.view_event_id END AS asof_view_event_id
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
)
def q_asof_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each purchase gets the NEXT view by
    the same user within 10 minutes (label-alignment shape: 'did a view
    follow the purchase soon after'). Same union-sort-window plan as the
    backward form, scanned descending; the tolerance is one projection
    after the window, mirrored by the oracle's CASE over DuckDB's native
    forward ASOF."""
    from vectorflow_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events").withColumn("ts", F.expr("ts div 1000"))
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    return asof_join(
        purchases,
        views,
        on="user_id",
        right_cols=["view_event_id"],
        direction="forward",
        tolerance=600_000_000,
    )


@query(
    "q_anti_join",
    "SELECT c_custkey, c_name, c_acctbal FROM customer "
    "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no high-value order (the reference's
    'documents with no chunks yet' shape). Catalyst picks broadcast-hash
    anti when the distinct key side fits."""
    from vectorflow_spark.operators.joins import anti_join

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return anti_join(c, o, "c_custkey", "o_custkey").select("c_custkey", "c_name", "c_acctbal")


@query(
    "q_setops",
    """
    SELECT key FROM (
        (SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey AS key FROM orders WHERE o_totalprice > 150000)
        EXCEPT
        SELECT c_custkey AS key FROM customer WHERE c_nationkey IN (1, 2, 3)
    )
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT coverage: BUILDING-segment customers with a large
    order, excluding three nations. Distinct set semantics on both engines."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("key"))
    big = o.filter(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("key"))
    excl = c.filter(F.col("c_nationkey").isin([1, 2, 3])).select(F.col("c_custkey").alias("key"))
    return building.intersect(big).subtract(excl)


@query(
    "q_events_rollup",
    """
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY ROLLUP (hour_id, event_type)
    """,
)
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over the event stream: (hour, type) -> hourly
    subtotal -> grand total in one pass (Spark expands to a single hash agg
    with grouping-id; no per-level rescan)."""
    ev = _t(spark, sf_dir, "events")
    return ev.rollup(
        F.expr("ts div 3600000000000").alias("hour_id"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


@query(
    "q_value_percentiles",
    """
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           round(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END), 9) AS p50,
           round(max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN value END), 9) AS p95,
           round(max(value), 9) AS max_value
    FROM ranked GROUP BY event_type
    """,
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank percentiles per group via window ranking — the
    deterministic construction that hash-matches across engines (value
    interpolation does not). One shuffle on the group key; the sort is
    within partitions."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(F.max(F.when(F.col("rn") == F.ceil(0.5 * F.col("n")).cast("bigint"), F.col("value"))), 9).alias("p50"),
        F.round(F.max(F.when(F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint"), F.col("value"))), 9).alias("p95"),
        F.round(F.max("value"), 9).alias("max_value"),
    )


@query(
    "q_json_extract",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (the reference's json.loads message parsing,
    SURVEY.md §2.12 scalar-functions row) aggregated per event type."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
    )


def _ivf_search_sql(k: int = 10, nprobe: int = 4) -> str:
    ones_cos = (
        "round(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE)))"
        " / (sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(64.0)), 9)"
    )
    cos_ec = _DUCK_COS.format(a="e.embedding", b="c.cvec")
    return f"""
    WITH cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    probe AS (
        SELECT cid FROM (SELECT cid, {ones_cos.format(v="cvec")} AS s FROM cents)
        ORDER BY s DESC, cid LIMIT {nprobe}
    ),
    scored AS (
        SELECT e.vec_id, c.cid, {cos_ec} AS s
        FROM embeddings e CROSS JOIN cents c
    ),
    best AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT e.vec_id, {ones_cos.format(v="e.embedding")} AS score
    FROM embeddings e
    JOIN best b ON e.vec_id = b.vec_id
    JOIN probe p ON b.cid = p.cid
    ORDER BY score DESC, e.vec_id LIMIT {k}
    """


@query("q_ivf_search", _ivf_search_sql())
def q_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search end-to-end: deterministic centroids -> nearest-
    centroid assignment -> probe the 4 clusters nearest the query -> brute-
    force top-10 within the probed ~25% of vectors. With ``cluster`` as a
    partition column the non-probed clusters never leave the scan."""
    from vectorflow_spark.operators.similarity import ivf_assign, ivf_centroids, ivf_topk_cosine

    emb = _t(spark, sf_dir, "embeddings", split=True)
    cents = ivf_centroids(emb, n_centroids=16)
    assigned = ivf_assign(emb, cents)
    return ivf_topk_cosine(assigned, cents, [1.0] * 64, k=10, nprobe=4)


@query(
    "q_rolling_fingerprint",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS ts
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, list_transform(ts, s -> ('0x' || substr(md5(s), 1, 7))::BIGINT) AS hs
        FROM toks WHERE len(ts) > 0
    )
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                       (acc, h) -> (acc * 31 + h) % 2147483647) AS fp_doc,
           CASE WHEN len(hs) < 4
                THEN list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                                 (acc, h) -> (acc * 31 + h) % 2147483647)
                ELSE list_min(list_transform(range(1, len(hs) - 2),
                     i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hs, i, i + 3)),
                                      (acc, h) -> (acc * 31 + h) % 2147483647)))
           END AS fp_min_kgram
    FROM hashed
    """,
)
def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprints (whole-sequence
    polynomial hash + MOSS-style min 4-gram window hash), one projection."""
    from vectorflow_spark.operators.textstats import rolling_fingerprints

    return rolling_fingerprints(_t(spark, sf_dir, "documents", split=True).select("doc_id", "text"))


