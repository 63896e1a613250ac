"""Analytics batches: funnels, ratio-to-report, YoY, MAD, quantile/correlation exactness, containment near-dup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import QUERIES, _t, query
from vectorflow_spark.queries.events import _SCD2_SQL


# ---------------------------------------------------------------------------
# Batch 7: resetting running sums, windowed funnel via as-of composition,
# decile lift.
# ---------------------------------------------------------------------------


@query(
    "q_resetting_running_sum",
    """
    WITH e AS (
        SELECT user_id, event_id, epoch_ns(ts) AS tsn,
               CAST(value AS DECIMAL(18,4)) AS v, event_type
        FROM events
    ),
    g AS (
        SELECT user_id, event_id, tsn, v,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY tsn, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
        FROM e
    )
    SELECT user_id, event_id, CAST(seg AS BIGINT) AS seg,
           CAST(sum(v) OVER (PARTITION BY user_id, seg ORDER BY tsn, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
    FROM g
    """,
)
def q_resetting_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum that RESETS at each marker event (spend since last
    purchase) — the two-window identity: a cumulative count of markers
    becomes the segment id, then the running sum partitions on (user,
    segment). No self-join against 'the previous marker', no driver
    loop; both windows share the user_id shuffle (the second adds seg to
    the partition key of already co-located rows). Sums are exact
    decimal."""
    e = _t(spark, sf_dir, "events")
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = e.select(
        "user_id",
        "event_id",
        "ts",
        F.col("value").cast("decimal(18,4)").alias("v"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(w1).alias("seg"),
    )
    w2 = Window.partitionBy("user_id", "seg").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return g.select(
        "user_id",
        "event_id",
        F.col("seg").cast("bigint").alias("seg"),
        F.sum("v").over(w2).cast("double").alias("run_sum"),
    )


@query(
    "q_windowed_funnel",
    """
    WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events),
    v AS (SELECT user_id, tsn FROM e WHERE event_type = 'view'),
    c AS (SELECT user_id, tsn FROM e WHERE event_type = 'click'),
    p AS (SELECT user_id, tsn FROM e WHERE event_type = 'purchase'),
    vc AS (
        SELECT v.user_id, v.tsn AS vts,
               (SELECT min(c.tsn) FROM c
                WHERE c.user_id = v.user_id AND c.tsn >= v.tsn
                  AND c.tsn <= v.tsn + 3600000000000) AS cts
        FROM v
    ),
    vcp AS (
        SELECT user_id, cts,
               (SELECT min(p.tsn) FROM p
                WHERE p.user_id = vc.user_id AND p.tsn >= vc.cts
                  AND p.tsn <= vc.cts + 3600000000000) AS pts
        FROM vc WHERE cts IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_funnels,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM vcp WHERE pts IS NOT NULL
    """,
)
def q_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel view -> first click within 1h -> first purchase
    within 1h of that click. The oracle states it with correlated MIN
    subqueries; the Spark plan is TWO forward as-of joins (union-sort-
    window, operators/joins.asof_join) — each hop is one user_id shuffle,
    linear in events, where the naive three-way inequality join is
    quadratic per user in step density. The first-next semantics (not
    any-combination) is what product funnels mean and what keeps the
    composition linear."""
    from vectorflow_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    tol = 3_600_000_000_000
    v = e.filter(F.col("event_type") == "view").select("user_id", "ts")
    c = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    vc = asof_join(
        v, c, on="user_id", left_ts="ts", right_ts="ts",
        prefix="c_", direction="forward", tolerance=tol,
    ).filter(F.col("c_ts").isNotNull())
    vcp = asof_join(
        vc, p, on="user_id", left_ts="c_ts", right_ts="ts",
        prefix="p_", direction="forward", tolerance=tol,
    ).filter(F.col("p_ts").isNotNull())
    return vcp.agg(
        F.count(F.lit(1)).alias("n_funnels"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q_decile_lift",
    """
    WITH r AS (
        SELECT c_custkey, c_acctbal,
               row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn,
               count(*) OVER () AS n
        FROM customer
    ),
    d AS (SELECT c_custkey, CAST((rn - 1) * 10 // n + 1 AS INT) AS decile FROM r),
    o AS (
        SELECT o_custkey, count(*) AS n_orders,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(coalesce(sum(n_orders), 0) AS BIGINT) AS n_orders,
           coalesce(CAST(sum(rev) AS DOUBLE), 0.0) AS revenue
    FROM d LEFT JOIN o ON c_custkey = o_custkey
    GROUP BY 1
    """,
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table: customers ranked into account-balance deciles
    (the distributed equi-depth operator — no single-partition window),
    left-joined to per-customer order rollups — which balance tier buys.
    The order rollup aggregates BEFORE the join (map-side combinable,
    custkey key) so the join moves one row per customer per side."""
    from vectorflow_spark.operators.ranking import equidepth_bins

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    d = equidepth_bins(c, ["c_acctbal", "c_custkey"], k=10, out_col="decile")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
    )
    return (
        d.join(o, d.c_custkey == o.o_custkey, "left")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.coalesce(F.sum("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce(F.sum("rev").cast("double"), F.lit(0.0)).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 8: ratio-to-report, YoY growth, robust dispersion (MAD).
# ---------------------------------------------------------------------------


@query(
    "q_share_of_total",
    """
    WITH n AS (
        SELECT n_name, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS rev
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY 1
    )
    SELECT n_name, CAST(round(rev, 2) AS DOUBLE) AS revenue,
           CAST(round(rev, 2) AS DOUBLE)
           / (SELECT CAST(round(sum(rev), 2) AS DOUBLE) FROM n) AS share
    FROM n
    """,
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each supplier nation's share of total revenue.
    The grand total re-aggregates the (tiny) per-nation result and joins
    back as a 1-row broadcast — NOT an un-partitioned window over the
    fact rows, and not a second scan. Sums are round()ed to cents BEFORE
    the double cast: a 28-digit decimal exceeds double precision and the
    engines' decimal->double conversions can differ by 1 ulp, while
    cents-scale values of this magnitude convert exactly. Explicit
    round(), not a decimal downcast — DuckDB's decimal downcast TRUNCATES
    where Spark's rounds HALF_UP; round() is half-away-from-zero on
    both."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
            .alias("rev")
        )
    )
    total = rev.agg(F.round(F.sum("rev"), 2).cast("double").alias("_tot"))
    rev2 = F.round(F.col("rev"), 2).cast("double")
    return rev.join(F.broadcast(total)).select(
        "n_name",
        rev2.alias("revenue"),
        (rev2 / F.col("_tot")).alias("share"),
    )


@query(
    "q_yoy_growth",
    """
    WITH y AS (
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1
    )
    SELECT yr, CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) / CAST(lag(rev) OVER (ORDER BY yr) AS DOUBLE) - 1.0 AS yoy
    FROM y
    """,
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth. The lag window is un-partitioned BY
    DESIGN: it runs over the aggregated year series (a handful of rows at
    any data scale — the aggregation upstream is what absorbed the 100 TB),
    which is the one place a global window is the right plan. First year's
    growth is NULL."""
    o = _t(spark, sf_dir, "orders")
    y = o.groupBy(F.year("o_orderdate").cast("int").alias("yr")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("yr")
    return y.select(
        "yr",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.lag("rev").over(w).cast("double") - 1.0).alias("yoy"),
    )


@query(
    "q_mad_prices",
    """
    WITH r AS (
        SELECT l_extendedprice AS v,
               row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
               count(*) OVER () AS n
        FROM lineitem
    ),
    med AS (SELECT v AS m, n FROM r WHERE rn = (n + 1) // 2),
    d AS (
        SELECT abs(r.v - med.m) AS dev, med.m, med.n,
               row_number() OVER (ORDER BY abs(r.v - med.m), r.rn) AS drn
        FROM r CROSS JOIN med
    )
    SELECT CAST(max(n) AS BIGINT) AS n, max(m) AS median,
           max(CASE WHEN drn = (n + 1) // 2 THEN dev END) AS mad
    FROM d
    """,
)
def q_mad_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of extended price — the robust dispersion
    statistic outlier pipelines prefer over stddev. Exact lower-median
    semantics at rank (n+1) DIV 2, computed twice (values, then absolute
    deviations) with the distributed ranking operator — the oracle's
    global row_number windows never appear in the Spark plan. Deviations
    are |double - double| of identical operands on both engines, and rank
    selection is integer, so the result is bit-stable."""
    from vectorflow_spark.operators.ranking import global_row_number

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    # n rides the ranking operator's own counts table (n_col) — no
    # separate count() re-scan of the 6M-row pinned frame (r12).
    r = global_row_number(li, ["v", "l_orderkey", "l_linenumber"], out_col="rn", n_col="n")
    med = (
        r.filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("v").alias("m"))
    )
    d = r.join(F.broadcast(med)).select(
        F.abs(F.col("v") - F.col("m")).alias("dev"), "m", "n", "rn"
    )
    dr = global_row_number(d, ["dev", "rn"], out_col="drn")
    return dr.agg(
        F.max("n").alias("n"),
        F.max("m").alias("median"),
        F.max(F.when(F.col("drn") == F.expr("(n + 1) div 2"), F.col("dev"))).alias("mad"),
    )


# ---------------------------------------------------------------------------
# Batch 9: exact interpolated group quantiles, quantized-exact correlation.
# ---------------------------------------------------------------------------


@query(
    "q_group_medians",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
    """,
)
def q_group_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated per-group quantiles (PERCENTILE_CONT semantics):
    both engines sort the group and interpolate at p*(n-1); results are
    rounded to 4 dp because the engines associate the interpolation
    arithmetic differently (lower + d*(upper-lower) vs (1-d)*lower +
    d*upper) — identical to 4 dp for money-scale inputs, not to the last
    ulp. Spark's percentile is a true aggregate (per-group sort inside the
    agg, no window): one shuffle on the 5-value priority key."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_corr_price_qty",
    """
    WITH q AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
               CAST(l_quantity AS BIGINT) AS y
        FROM lineitem
    ),
    s AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
        FROM q GROUP BY 1
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_xy
    FROM s
    """,
)
def q_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of price and quantity per return flag — the
    built-in corr() sums doubles in partition order and is NOT
    reproducible across engines or partitionings; this computes the six
    sufficient statistics in EXACT integer/decimal space (price quantized
    to cents) and applies the closed form once in double, identically on
    both engines. One map-side-combinable aggregation; the moment sums use
    DECIMAL(38,0) because sum(x^2) overflows int64 at real scale.
    split=True parallelizes the decimal moment partial agg off the single
    scan partition (r11: 1.06->0.88 s; decimal sums order-independent)."""
    li = _t(spark, sf_dir, "lineitem", split=True)
    x = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    y = F.col("l_quantity").cast("bigint")
    xd = x.cast("decimal(38,0)")
    yd = y.cast("decimal(38,0)")
    s = li.select(
        "l_returnflag", x.alias("x"), y.alias("y"), xd.alias("xd"), yd.alias("yd")
    ).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("xd").cast("double").alias("sx"),
        F.sum("yd").cast("double").alias("sy"),
        F.sum(F.col("xd") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("xd") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("yd") * F.col("y")).cast("double").alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "l_returnflag", F.col("n").cast("bigint").alias("n"), corr.alias("corr_xy")
    )


@query(
    "q_scd2_asof",
    f"""
    WITH scd AS ({_SCD2_SQL}),
    at_t AS (
        SELECT t, c_mktsegment FROM scd
        CROSS JOIN (SELECT unnest([TIMESTAMP '1999-01-01', TIMESTAMP '2001-01-01']) AS t)
        WHERE valid_from <= t AND (valid_to IS NULL OR t < valid_to)
    )
    SELECT CAST(strftime(t, '%Y%m%d') AS INT) AS t, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM at_t GROUP BY 1, 2
    """,
)
def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 dimension: reconstruct the dimension
    state at two instants (before and after the merge's effective date)
    from the same versioned table q_scd2_apply produces — the
    valid_from/valid_to half-open interval filter IS the as-of read, no
    log replay. Segment counts flip between the instants exactly where
    the merge closed/opened versions. The instants table is a 2-row
    broadcast; the filter is a pushable conjunction at any scale."""
    versioned = QUERIES["q_scd2_apply"](spark, sf_dir)
    instants = spark.range(1).select(
        F.explode(
            F.array(
                F.lit("1999-01-01").cast("timestamp"),
                F.lit("2001-01-01").cast("timestamp"),
            )
        ).alias("t")
    )
    return (
        versioned.join(F.broadcast(instants))
        .filter(
            (F.col("valid_from") <= F.col("t"))
            & (F.col("valid_to").isNull() | (F.col("t") < F.col("valid_to")))
        )
        .groupBy(
            F.date_format("t", "yyyyMMdd").cast("int").alias("t"), "c_mktsegment"
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Batch 10: containment near-dup, exact-moment dispersion.
# ---------------------------------------------------------------------------


@query(
    "q_ngram_containment_pairs",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ts
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
            FROM toks WHERE len(ts) >= 3
            UNION ALL
            SELECT doc_id, array_to_string(ts, ' ') AS shingle FROM toks WHERE len(ts) < 3
        )
    ),
    sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
    inter AS (
        SELECT l.doc_id AS a, r.doc_id AS b, CAST(count(*) AS BIGINT) AS n_common
        FROM sh l JOIN sh r ON l.shingle = r.shingle
        WHERE l.doc_id < r.doc_id GROUP BY 1, 2
    )
    SELECT i.a, i.b, i.n_common,
           CAST(i.n_common AS DOUBLE) / least(sa.n_shingles, sb.n_shingles) AS containment
    FROM inter i
    JOIN sizes sa ON i.a = sa.doc_id
    JOIN sizes sb ON i.b = sb.doc_id
    WHERE CAST(i.n_common AS DOUBLE) / least(sa.n_shingles, sb.n_shingles) >= 0.6
    """,
)
def q_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup pairs: |A∩B| / min(|A|,|B|) >= 0.6 over word
    3-gram sets. Jaccard misses excerpt duplication (a page quoted inside
    a much larger document scores low because the union is huge);
    containment normalizes by the SMALLER set, which is exactly the
    training-data case — boilerplate and quotations embedded in long
    docs. Same inverted-index plan as the Jaccard verify (one shingle-key
    self-join, sizes joined back); only the denominator differs."""
    from vectorflow_spark.operators.dedup import with_shingles

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    # checkpointed for the same reason as jaccard_pairs: four plan branches
    sh = (
        with_shingles(docs, "doc_id", "text", 3, "word")
        .select("doc_id", F.xxhash64("shingle").alias("k"))
        .localCheckpoint()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("a"), "k")
    b = sh.select(F.col("doc_id").alias("b"), "k")
    inter = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_shingles").alias("size_b"))
    cont = F.col("n_common").cast("double") / F.least("size_a", "size_b")
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .filter(cont >= 0.6)
        .select("a", "b", "n_common", cont.alias("containment"))
    )


@query(
    "q_stddev_prices",
    """
    WITH q AS (
        SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS x
        FROM lineitem
    ),
    s AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx
        FROM q GROUP BY 1
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) / 100.0 AS stddev_price
    FROM s
    """,
)
def q_stddev_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample standard deviation per return flag from EXACT moments: the
    built-in stddev sums doubles in partition order (different answer per
    partitioning/engine); here price is quantized to cents, the count /
    sum / sum-of-squares accumulate exactly in integer-decimal space, and
    the closed form runs once in double — identical expression both
    engines. Same pattern as q_corr_price_qty; one map-side-combinable
    aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    xd = x.cast("decimal(38,0)")
    s = li.select("l_returnflag", x.alias("x"), xd.alias("xd")).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("xd").cast("double").alias("sx"),
        F.sum(F.col("xd") * F.col("x")).cast("double").alias("sxx"),
    )
    std = (
        F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (F.col("n") * (F.col("n") - 1.0))
        )
        / 100.0
    )
    return s.select(
        "l_returnflag", F.col("n").cast("bigint").alias("n"), std.alias("stddev_price")
    )


@query(
    "q_top_names_per_segment",
    """
    SELECT c_mktsegment,
           array_to_string(list(c_name ORDER BY c_acctbal DESC, c_custkey)[1:3], ',') AS top_names
    FROM customer GROUP BY 1
    """,
)
def q_top_names_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: the top-3 customer names per segment AS
    AN ARRAY — the list(x ORDER BY ...) surface. Spark has no ordered
    collect_list, so the order key rides inside the struct (negated
    balance for DESC), array_sort gives the total order, and transform
    projects the payload. collect_list is a real aggregate (map-side
    partials); the arrays are group-sized only until the slice — for
    unbounded groups at scale, cap with the WindowGroupLimit top-k
    (q_topk_per_group) BEFORE collecting."""
    c = _t(spark, sf_dir, "customer")
    top3 = F.slice(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("c_acctbal")).alias("negbal"),
                        F.col("c_custkey").alias("ck"),
                        F.col("c_name").alias("nm"),
                    )
                )
            ),
            lambda x: x["nm"],
        ),
        1,
        3,
    )
    # joined to a string: the oracle comparator sorts rows by every output
    # column and array cells are unhashable there
    return c.groupBy("c_mktsegment").agg(
        F.concat_ws(",", top3).alias("top_names")
    )


@query(
    "q_request_validation",
    """
    WITH reqs AS (
      SELECT doc_id,
        CASE WHEN doc_id % 7 = 0 THEN NULL
             ELSE 'key-' || CAST(doc_id % 3 AS VARCHAR) END AS vectorflow_key,
        (['open_ai','cohere','open_ai',NULL,'open_ai'])[CAST(doc_id % 5 AS INT) + 1]
            AS embeddings_type,
        CASE WHEN doc_id % 11 = 0 THEN NULL ELSE 'qdrant' END AS vector_db_type,
        CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'dbkey' END AS vector_db_key,
        CASE WHEN doc_id % 4 = 0 THEN 'https://hook.example' ELSE NULL END AS webhook_url,
        CASE WHEN doc_id % 8 = 0 THEN NULL ELSE 'whk' END AS webhook_key,
        (doc_id % 17) <> 0 AS has_source_data
      FROM documents
    ), flags AS (
      SELECT doc_id,
        (vectorflow_key IS NOT NULL AND length(vectorflow_key) > 0
         AND vectorflow_key IN ('key-0','key-1')) AS ok_cred,
        (embeddings_type IS NOT NULL AND vector_db_type IS NOT NULL
         AND vector_db_key IS NOT NULL AND length(vector_db_key) > 0) AS ok_meta,
        coalesce(embeddings_type = 'open_ai', false) AS ok_et,
        (webhook_url IS NULL OR (webhook_key IS NOT NULL AND length(webhook_key) > 0))
            AS ok_wh,
        has_source_data AS ok_src
      FROM reqs
    )
    SELECT doc_id,
      CASE WHEN NOT ok_cred THEN 'CRED'
           WHEN NOT ok_meta THEN 'METADATA'
           WHEN NOT ok_et  THEN 'EMBEDDING_TYPE'
           WHEN NOT ok_wh  THEN 'WEBHOOK'
           WHEN NOT ok_src THEN 'SOURCE_DATA' END AS failed_validation,
      CASE WHEN NOT ok_cred THEN 'Invalid credentials'
           WHEN NOT ok_meta THEN 'Missing required fields'
           WHEN NOT ok_et  THEN 'Hugging face embeddings models require a "hugging_face_model_name" in the "embeddings_metadata"'
           WHEN NOT ok_wh  THEN 'Webhook URL provided but no webhook key'
           WHEN NOT ok_src THEN 'No file part in the request' END AS error,
      CASE WHEN NOT ok_cred THEN 401
           WHEN NOT ok_meta THEN 400
           WHEN NOT ok_et  THEN 400
           WHEN NOT ok_wh  THEN 400
           WHEN NOT ok_src THEN 400
           ELSE 200 END AS status_code
    FROM flags
    """,
)
def q_request_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2, data-plane form: the /embed endpoint's ordered validation chain
    (reference src/api/validators.py:7-46 dispatched at app.py:40-45) run
    over a batch of synthetic requests derived deterministically from
    doc_id. One first-match-wins CASE projection — no shuffle, no Python;
    the whole chain codegens into the scan (operators/filters.validate_requests)."""
    from vectorflow_spark.operators.filters import validate_requests

    d = _t(spark, sf_dir, "documents")
    reqs = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("key-"), (F.col("doc_id") % 3).cast("string")))
        .alias("vectorflow_key"),
        F.element_at(
            F.array(
                F.lit("open_ai"),
                F.lit("cohere"),
                F.lit("open_ai"),
                F.lit(None).cast("string"),
                F.lit("open_ai"),
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ).alias("embeddings_type"),
        F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("qdrant"))
        .alias("vector_db_type"),
        F.lit("corpus-index").alias("vector_db_index"),
        F.when(F.col("doc_id") % 13 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("dbkey"))
        .alias("vector_db_key"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("https://hook.example"))
        .otherwise(F.lit(None).cast("string"))
        .alias("webhook_url"),
        F.when(F.col("doc_id") % 8 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("whk"))
        .alias("webhook_key"),
        (F.col("doc_id") % 17 != 0).alias("has_source_data"),
    )
    out = validate_requests(reqs, valid_keys=("key-0", "key-1"))
    return out.select("doc_id", "failed_validation", "error", "status_code")


@query(
    "q_markdown_reader",
    """
    WITH src AS (
      SELECT doc_id,
        '# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        '## Empty' || chr(10) ||
        'Intro [link](http://ex.com/' || CAST(doc_id AS VARCHAR) || ') and <b>tag</b>.' || chr(10) ||
        '## Body' || chr(10) ||
        substring(text, 1, 150) || chr(10) ||
        '![[image' || CAST(doc_id AS VARCHAR) || ']]' || chr(10) ||
        '### Tail' AS md
      FROM documents
    ),
    clean AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(md, '\\[(.*?)\\]\\((.*?)\\)', '\\1', 'g'),
                            '!\\[\\[(.*)\\]\\]', '', 'g') AS c
      FROM src
    ),
    ls AS (SELECT doc_id, string_split(c, chr(10)) AS arr FROM clean),
    lines AS (
      SELECT doc_id, unnest(arr) AS line, generate_subscripts(arr, 1) AS pos FROM ls
    ),
    flagged AS (
      SELECT doc_id, line, pos,
             regexp_matches(line, '^#+\\s') AS ish,
             coalesce(lag(regexp_matches(line, '^#+\\s'))
                      OVER (PARTITION BY doc_id ORDER BY pos), false) AS prev_ish
      FROM lines
    ),
    kept AS (
      SELECT doc_id, line, pos, (ish AND NOT prev_ish) AS eff
      FROM flagged
      WHERE NOT (ish AND prev_ish)
    ),
    sec AS (
      SELECT doc_id, line, pos, eff,
             sum(CASE WHEN eff THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY pos) AS sid
      FROM kept
    ),
    grp AS (
      SELECT doc_id, sid,
             max(CASE WHEN eff THEN line END) AS header,
             coalesce(string_agg(CASE WHEN NOT eff THEN line || chr(10) END,
                                 '' ORDER BY pos), '') AS body
      FROM sec GROUP BY doc_id, sid
    ),
    tups AS (
      SELECT d.doc_id, 0 AS sid, CAST(NULL AS VARCHAR) AS header,
             coalesce(g.body, '') AS body
      FROM (SELECT DISTINCT doc_id FROM grp) d
      LEFT JOIN grp g ON g.doc_id = d.doc_id AND g.sid = 0
      UNION ALL
      SELECT doc_id, sid, header, body FROM grp WHERE sid > 0
    ),
    rendered AS (
      SELECT doc_id, sid,
             CASE WHEN header IS NULL THEN regexp_replace(body, '<.*?>', '', 'g')
                  ELSE chr(10) || chr(10) || trim(regexp_replace(header, '#', '', 'g'))
                       || chr(10) || regexp_replace(body, '<.*?>', '', 'g') END AS txt
      FROM tups
    )
    SELECT doc_id, string_agg(txt, chr(10) ORDER BY sid) AS md_text
    FROM rendered GROUP BY doc_id
    """,
)
def q_markdown_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4, exact extractor-path parity: synthetic markdown (headers, a
    deliberately swallowed back-to-back header, a hyperlink, an html tag,
    an ![[image]] line, a trailing empty-bodied header) built around each
    document's text, pushed through sources/readers.markdown_reader_expr —
    the llama_hub MarkdownReader algorithm as one zero-shuffle Catalyst
    fold. The oracle reproduces the same semantics with a structurally
    INDEPENDENT lag/window/group formulation, so a bug in either shape
    can't self-confirm."""
    from vectorflow_spark.sources.readers import markdown_reader_expr

    d = _t(spark, sf_dir, "documents", split=True)
    did = F.col("doc_id").cast("string")
    md = F.concat(
        F.lit("# Doc "), did, F.lit("\n"),
        F.lit("## Empty\n"),
        F.lit("Intro [link](http://ex.com/"), did, F.lit(") and <b>tag</b>.\n"),
        F.lit("## Body\n"),
        F.substring("text", 1, 150), F.lit("\n"),
        F.lit("![[image"), did, F.lit("]]\n"),
        F.lit("### Tail"),
    )
    return d.select("doc_id", markdown_reader_expr(md).alias("md_text"))


@query(
    "q_global_shuffle",
    """
    SELECT doc_id,
           row_number() OVER (
             ORDER BY md5('shuf42:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS shuffle_pos
    FROM documents
    """,
)
def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle for training-data ordering:
    every row gets an exact global position under ORDER BY
    md5(seed || id) — reproducible across runs, partitionings, and
    cluster sizes, with NO single-partition sort: the position comes from
    operators/ranking.global_row_number (range-sort + partition-offset),
    so the plan holds at 100 TB where a bare row_number() window
    serializes. Changing the seed literal reshuffles epochs."""
    from vectorflow_spark.operators.ranking import global_row_number

    d = _t(spark, sf_dir, "documents", split=True)
    key = F.md5(F.concat(F.lit("shuf42:"), F.col("doc_id").cast("string")))
    ranked = global_row_number(
        d.select("doc_id", key.alias("_k")), ["_k", "doc_id"], out_col="shuffle_pos"
    )
    return ranked.select("doc_id", "shuffle_pos")


@query(
    "q_length_bucketed_batches",
    """
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t != ''))
                  AS BIGINT) AS n_tok
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, n_tok,
             CAST(length(bin(n_tok)) AS INT) AS bucket,
             CAST(doc_id % 16 AS INT) AS shard
      FROM toks
    ),
    assigned AS (
      SELECT doc_id, n_tok, bucket, shard,
             CAST((row_number() OVER (PARTITION BY bucket, shard
                                      ORDER BY n_tok, doc_id) - 1) // 8 AS BIGINT)
                 AS batch_id
      FROM keyed
    ),
    batches AS (
      SELECT bucket, shard, batch_id,
             count(*) AS n_rows,
             max(n_tok) AS batch_max,
             sum(n_tok) AS batch_tok
      FROM assigned GROUP BY bucket, shard, batch_id
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(n_rows) AS BIGINT) AS n_docs,
           CAST(sum(batch_max * n_rows - batch_tok) AS BIGINT) AS padding_waste
    FROM batches GROUP BY bucket
    """,
)
def q_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment + padding-waste audit
    (operators/batching.length_bucketed_batches): docs bucketed by
    token-count bit-length, sharded for bounded window tasks, batched 8
    at a time in length order; the audit sums per-batch padding
    (batch_max - len) — the number a pipeline owner watches to decide
    bucket granularity. All integer-exact."""
    from vectorflow_spark.operators.batching import length_bucketed_batches
    from vectorflow_spark.operators.textstats import token_count_ws

    d = _t(spark, sf_dir, "documents", split=True).select(
        "doc_id", token_count_ws("text").alias("n_tok")
    )
    assigned = length_bucketed_batches(d, token_col="n_tok", id_col="doc_id")
    return (
        assigned.groupBy("bucket", "shard", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("n_tok").alias("batch_max"),
            F.sum("n_tok").alias("batch_tok"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("n_rows").cast("long").alias("n_docs"),
            F.sum(F.col("batch_max") * F.col("n_rows") - F.col("batch_tok"))
            .cast("long")
            .alias("padding_waste"),
        )
    )


@query(
    "q_pmi_bigrams",
    r"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
        FROM documents
    ),
    uni AS (SELECT unnest(ts) AS w FROM toks),
    uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
    bg AS (
        SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
               unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS w2
        FROM toks WHERE len(ts) >= 2
    ),
    mtot AS (SELECT CAST(count(*) AS BIGINT) AS m FROM bg),
    bc AS (
        SELECT w1, w2, count(*) AS cab FROM bg GROUP BY 1, 2 HAVING count(*) >= 3
    ),
    scored AS (
        SELECT bc.w1 || ' ' || bc.w2 AS bigram,
               CAST(bc.cab AS BIGINT) AS cnt,
               CAST((CAST(bc.cab AS HUGEINT) * t.n * t.n * 1000000)
                    // (CAST(m.m AS HUGEINT) * a.c * b.c) AS BIGINT) AS pmi_q
        FROM bc
        JOIN uc a ON bc.w1 = a.w
        JOIN uc b ON bc.w2 = b.w, tot t, mtot m
    )
    SELECT bigram, cnt, pmi_q
    FROM scored ORDER BY pmi_q DESC, bigram LIMIT 20
    """,
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI-scored collocations — the association-strength pass an
    LM data pipeline runs after raw bigram counts (q_top_bigrams finds
    FREQUENT pairs; PMI finds BOUND pairs). PMI = log p(ab)/(p(a)p(b))
    is rank-equivalent to the integer ratio cab*N^2/(M*ca*cb), so the
    score is micro-quantized exact DECIMAL(38,0)/HUGEINT arithmetic —
    no float log whose libm rounding could flip ranks cross-engine.

    Plan: one (w1,w2) bigram-count shuffle with map-side combine + one
    token-count shuffle; N and M come from broadcast 1-row aggregates;
    the two unigram joins key on the token (the unigram table is NOT
    broadcast — it scales with vocabulary); min-count >= 3 prunes the
    long tail before the joins; top-20 is TakeOrderedAndProject."""
    docs = _t(spark, sf_dir, "documents", split=True)
    ts = F.expr(r"filter(split(lower(text), '\\s+'), t -> t <> '')")
    toks = docs.select(ts.alias("ts"))
    uni = toks.select(F.explode("ts").alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = uc.agg(F.sum("c").cast("long").alias("n"))
    bg = toks.filter(F.size("ts") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(ts) - 2),"
                " i -> struct(ts[i] AS w1, ts[i+1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    mtot = bg.agg(F.count(F.lit(1)).cast("long").alias("m"))
    bc = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= 3)
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    scored = (
        bc.join(uc.select(F.col("w").alias("w1"), F.col("c").alias("ca")), "w1")
        .join(uc.select(F.col("w").alias("w2"), F.col("c").alias("cb")), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(mtot))
        .withColumn("_num", d38("cab") * d38("n") * d38("n") * F.lit(1000000).cast("decimal(38,0)"))
        .withColumn("_den", d38("m") * d38("ca") * d38("cb"))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("cab").cast("long").alias("cnt"),
            F.expr("CAST(_num div _den AS BIGINT)").alias("pmi_q"),
        )
    )
    return scored.orderBy(F.col("pmi_q").desc(), "bigram").limit(20)


@query(
    "q_power_iteration",
    """
    WITH q AS (
      SELECT list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS eq
      FROM embeddings
    ),
    u AS (
      SELECT eq,
             CAST(list_sum(list_transform(range(1, len(eq) + 1),
                                          i -> eq[i] * (1 + ((i - 1) % 7)))) AS BIGINT) AS u
      FROM q
    ),
    ex AS (
      SELECT unnest(eq) AS qv, generate_subscripts(eq, 1) - 1 AS dim, u FROM u
    )
    SELECT CAST(dim AS INT) AS dim,
           CAST(sum(CAST(qv AS HUGEINT) * u) // 1000000 AS BIGINT) AS w_q
    FROM ex GROUP BY dim
    """,
)
def q_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed power-iteration step w = A^T(A v) over the embeddings
    matrix with a deterministic integer seed vector v_j = 1 + (j mod 7)
    (operators/similarity.power_iteration_step). The first matvec is a
    zero-shuffle literal-array fold; the second is posexplode + one
    64-group map-side-combinable aggregation. Micro-quantized half-up
    components make both matvecs exact integer/decimal arithmetic, so
    the result hash-matches DuckDB's HUGEINT fold bit-for-bit."""
    from vectorflow_spark.operators.similarity import power_iteration_step

    e = _t(spark, sf_dir, "embeddings", split=True)
    v = [1 + (j % 7) for j in range(64)]
    return power_iteration_step(e, v).select(F.col("dim").cast("int").alias("dim"), "w_q")


