"""Analytics batches: ranking, grouping sets, quantiles, cohorts, histograms, HH sketches."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import _t, query
from vectorflow_spark.queries.similarity import _DUCK_COS
from vectorflow_spark.queries.dedup import _jaccard_pairs_sql, _minhash_pairs_sql


# ---------------------------------------------------------------------------
# Engine-surface batch: distributed ranking, grouping sets, LM-quality
# scoring, windowed batch dedup.
# ---------------------------------------------------------------------------


@query(
    "q_topk_per_group",
    """
    WITH ranked AS (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per market segment — the per-group top-k
    pattern. Spark 3.5+ rewrites rn<=k into WindowGroupLimit: each map
    task keeps only its local top-k per group BEFORE the shuffle, so the
    exchange moves O(groups*k) rows, not the whole fact table. Ties break
    on orderkey so the oracle agrees row-for-row."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q_equidepth_bins",
    """
    WITH r AS (
        SELECT o_totalprice,
               row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
               count(*) OVER () AS n
        FROM orders
    )
    SELECT CAST((rn - 1) * 10 // n + 1 AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi
    FROM r GROUP BY 1
    """,
)
def q_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (decile) histogram of order prices. The oracle
    states the semantics with a global window; the Spark side uses
    operators/ranking.py's range-sort + partition-offset construction, so
    NO task ever holds the whole table (the un-partitioned row_number the
    SQL implies would). Bin boundaries use integral DIV on (rn,n) —
    bit-exact at any scale."""
    from vectorflow_spark.operators.ranking import equidepth_bins

    o = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    binned = equidepth_bins(o, ["o_totalprice", "o_orderkey"], k=10)
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query(
    "q_grouping_sets",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (status margins, priority margins, grand
    total) — the general form of rollup/cube already covered elsewhere.
    Spark expands the sets into one Expand + single agg (one shuffle, not
    one scan per set); sums are exact decimal. The synthetic columns are
    never NULL so the coalesce'd 'ALL' labels are unambiguous."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "q_unigram_logprob",
    """
    WITH t2 AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents
        ) WHERE tok <> ''
    ),
    freq AS (SELECT tok, count(*) AS c FROM t2 GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CAST(round(-log2(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT)) AS BIGINT)
               AS score_micro
    FROM t2 JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY 1
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score per document (C4/CCNet-style
    filter): mean negative log2 probability of each token under the
    corpus unigram distribution, reported as an exact micro-quantized sum
    (each -log2 p term is rounded to 1e-6 BEFORE summing, so the result
    is an integer and immune to float summation order — the same
    quantized-exact-sum trick q_kmeans_step uses). Plan: token explode →
    one map-side-combinable freq agg; the freq table joins back on the
    token hash key (NOT broadcast — at 100 TB the vocabulary is huge);
    the corpus total is a 1-row broadcast."""
    docs = _t(spark, sf_dir, "documents", split=True)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("n"))
    term = F.round(-F.log2(F.col("c").cast("double") / F.col("n")) * 1000000).cast("long")
    return (
        toks.join(freq, "tok")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(term).alias("score_micro"),
        )
    )


@query(
    "q_event_dedup_window",
    """
    WITH r AS (
        SELECT event_id, user_id, event_type, epoch_ns(ts) AS tsn, value,
               row_number() OVER (PARTITION BY user_id, event_type,
                                               epoch_ns(ts) // 600000000000
                                  ORDER BY epoch_ns(ts), event_id) AS rn
        FROM events
    )
    SELECT event_id, user_id, event_type, tsn AS ts, value
    FROM r WHERE rn = 1
    """,
)
def q_event_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming dropDuplicatesWithinWatermark: keep only
    the first event per (user, type) within each 10-minute window. The
    window key joins the partition spec, so the row_number window has
    fine-grained groups (no skewed giant partitions); earliest-ties break
    on event_id. streaming/pipeline.py holds the online variant — this
    is the backfill/batch path sharing the same semantics."""
    e = _t(spark, sf_dir, "events")
    # integral DIV: epoch-nanos (~1.7e18) exceed double's 2^53 integer
    # range, so float division here would misplace window boundaries.
    win = F.expr("ts div 600000000000")
    w = Window.partitionBy("user_id", "event_type", win).orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


# ---------------------------------------------------------------------------
# Curation batch 2: semantic dedup, window-function family, calendar report,
# skew profiling, join-size estimation, winsorized robust stats.
# ---------------------------------------------------------------------------


def _semantic_dedup_sql(threshold: float = 0.25) -> str:
    cos_ec = _DUCK_COS.format(a="e.embedding", b="c.cvec")
    cos_xy = _DUCK_COS.format(a="x.embedding", b="y.embedding")
    return f"""
    WITH cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 16
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
    ),
    e2 AS (
        SELECT e.vec_id, e.embedding, b.cid
        FROM embeddings e JOIN best b ON e.vec_id = b.vec_id
    ),
    dropped AS (
        SELECT DISTINCT y.vec_id AS b
        FROM e2 x JOIN e2 y ON x.cid = y.cid AND x.vec_id < y.vec_id
        WHERE {cos_xy} >= {threshold}
    )
    SELECT e2.vec_id, CAST(e2.cid AS INT) AS cluster
    FROM e2 WHERE e2.vec_id NOT IN (SELECT b FROM dropped)
    """


@query("q_semantic_dedup", _semantic_dedup_sql())
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shape semantic deduplication: cluster embeddings (IVF
    assignment against deterministic seeds), find within-cluster cosine
    near-dups, and keep only vectors with no smaller-id neighbor above the
    threshold. The pairwise pass is confined to clusters — the whole point
    of SemDeDup at scale: O(sum of cluster^2) not O(n^2), and the cluster
    column doubles as a partition key so each block's self-join is
    co-located. Composition of ivf_assign + embedding_neardup_pairs +
    one anti join; no new shuffle shapes."""
    from vectorflow_spark.operators.dedup import embedding_neardup_pairs
    from vectorflow_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = _t(spark, sf_dir, "embeddings", split=True)
    cents = ivf_centroids(emb, n_centroids=16)
    assigned = ivf_assign(emb, cents)
    pairs = embedding_neardup_pairs(assigned, block_col="cluster", threshold=0.25)
    dropped = pairs.select(F.col("b").alias("vec_id")).distinct()
    return (
        assigned.join(dropped, "vec_id", "left_anti")
        .select("vec_id", F.col("cluster").cast("int").alias("cluster"))
    )


@query(
    "q_window_family",
    """
    WITH e AS (
        SELECT event_id, user_id, epoch_ns(ts) AS tsn, value FROM events
    )
    SELECT event_id, user_id,
           lag(value) OVER w AS prev_v,
           lead(value) OVER w AS next_v,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
           nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_v
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
    """,
)
def q_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-window family in one plan: lag/lead (default
    frame), first_value (running frame), last_value and nth_value over the
    full-partition frame. All five share ONE window spec partitioned by
    user_id, so Spark computes them in a single WindowExec pass after a
    single shuffle — adding functions to a shared spec is free; adding
    specs is not. Values pass through untouched (no float arithmetic), so
    cross-engine equality is exact."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_v"),
        F.lead("value").over(w).alias("next_v"),
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w_full).alias("last_v"),
        F.nth_value("value", 2).over(w_full).alias("second_v"),
    )


@query(
    "q_calendar_report",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (dayofweek(o_orderdate) IN (0, 6)) AS BIGINT) AS weekend_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders GROUP BY 1, 2
    """,
)
def q_calendar_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function family: year/quarter extraction, day-of-week
    classification (DuckDB dayofweek is 0=Sunday..6=Saturday; Spark
    dayofweek is 1=Sunday..7, so the weekend sets are {0,6} and {1,7}),
    filtered aggregate, exact decimal revenue. One map-side-combinable
    aggregation over ~28 (year,quarter) groups."""
    o = _t(spark, sf_dir, "orders")
    weekend = F.dayofweek("o_orderdate").isin(1, 7)
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(weekend, 1).otherwise(0)).alias("weekend_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


@query(
    "q_key_skew_profile",
    """
    WITH k AS (SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM k)
    SELECT key, CAST(cnt AS BIGINT) AS cnt, CAST(cnt AS DOUBLE) / n AS share
    FROM k CROSS JOIN t
    ORDER BY cnt DESC, key LIMIT 20
    """,
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 20 heaviest keys with their share of
    total rows — what you run BEFORE choosing salting factors or AQE skew
    thresholds for a big join. One map-side-combinable count per key, a
    1-row broadcast total, TakeOrderedAndProject for the top-20 (never a
    global sort of the key histogram)."""
    li = _t(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    t = k.agg(F.sum("cnt").cast("double").alias("n"))
    return (
        k.join(F.broadcast(t))
        .select("key", "cnt", (F.col("cnt").cast("double") / F.col("n")).alias("share"))
        .orderBy(F.col("cnt").desc(), "key")
        .limit(20)
    )


@query(
    "q_join_size_estimate",
    """
    WITH a AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
         b AS (SELECT c_custkey AS k, count(*) AS c FROM customer GROUP BY 1)
    SELECT CAST(sum(a.c * b.c) AS BIGINT) AS est_rows,
           CAST(count(*) AS BIGINT) AS n_matching_keys,
           CAST(max(a.c * b.c) AS BIGINT) AS max_key_output
    FROM a JOIN b ON a.k = b.k
    """,
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output cardinality WITHOUT running the join: per-key
    count tables joined and the per-key products summed — sum(c_a * c_b)
    is exactly |A join B| on the key. The estimator's own cost is two
    map-side-combinable aggs + a join on the (much smaller) key tables;
    max_key_output is the skew headline (the single key that would
    dominate the real join's largest task). This is the planning query
    you run before committing a 100 TB shuffle."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    a = o.groupBy(F.col("o_custkey").alias("k")).agg(F.count(F.lit(1)).alias("ca"))
    b = c.groupBy(F.col("c_custkey").alias("k")).agg(F.count(F.lit(1)).alias("cb"))
    prod = F.col("ca") * F.col("cb")
    return a.join(b, "k").agg(
        F.sum(prod).alias("est_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.max(prod).alias("max_key_output"),
    )


@query(
    "q_winsorized_stats",
    """
    WITH r AS (
        SELECT l_extendedprice AS v,
               row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
               count(*) OVER () AS n
        FROM lineitem
    ),
    cuts AS (
        SELECT max(CASE WHEN rn = CAST(ceil(n * CAST(0.01 AS DOUBLE)) AS BIGINT) THEN v END) AS lo,
               max(CASE WHEN rn = CAST(ceil(n * CAST(0.99 AS DOUBLE)) AS BIGINT) THEN v END) AS hi
        FROM r
    )
    SELECT CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
           CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
           max(lo) AS lo, max(hi) AS hi,
           CAST(sum(CAST(least(greatest(v, lo), hi) AS DECIMAL(28,10))) AS DOUBLE) AS winsorized_sum
    FROM r CROSS JOIN cuts
    """,
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (1%/99% nearest-rank clamp) robust sum — the outlier
    trim step of a numeric-feature pipeline. The oracle states the rank
    semantics with a global window; the Spark side computes ranks with
    operators/ranking.py's range-sort construction, so the 100 TB plan has
    no single-partition stage. Rank indices use ceil(n * double(0.01)) on
    BOTH engines (the literal forced to double — DuckDB would otherwise
    fold n*0.01 in decimal and disagree with Spark's IEEE product at some
    n). Clamped sum is exact decimal."""
    from vectorflow_spark.operators.ranking import global_row_number

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    # n rides the ranking operator's own counts table (n_col) — no
    # separate count() re-scan of the pinned ranked frame (r12).
    ranked = global_row_number(
        li, ["v", "l_orderkey", "l_linenumber"], out_col="rn", n_col="n"
    )
    k_lo = F.ceil(F.col("n") * F.lit(0.01)).cast("long")
    k_hi = F.ceil(F.col("n") * F.lit(0.99)).cast("long")
    cuts = ranked.agg(
        F.max(F.when(F.col("rn") == k_lo, F.col("v"))).alias("lo"),
        F.max(F.when(F.col("rn") == k_hi, F.col("v"))).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return ranked.join(F.broadcast(cuts)).agg(
        F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0)).alias("n_clamped_lo"),
        F.sum(F.when(F.col("v") > F.col("hi"), 1).otherwise(0)).alias("n_clamped_hi"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.sum(clamped.cast("decimal(28,10)")).cast("double").alias("winsorized_sum"),
    )


# ---------------------------------------------------------------------------
# Batch 3: quantized PageRank, retention cohorts, LSH recall audit, BM25.
# ---------------------------------------------------------------------------


def _pagerank_sql(iters: int = 3, m: int = 10**12) -> str:
    prev = "r0"
    iter_ctes = []
    for i in range(1, iters + 1):
        iter_ctes.append(f"""
    c{i} AS (
        SELECT e.dst AS v, sum(r.r // d.d) AS contrib
        FROM edges e JOIN {prev} r ON e.src = r.v JOIN deg d ON e.src = d.src
        GROUP BY 1
    ),
    r{i} AS (
        SELECT v, (15 * ({m} // nn)) // 100 + (85 * contrib) // 100 AS r
        FROM c{i} CROSS JOIN n
    )""")
        prev = f"r{i}"
    return f"""
    WITH eo AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT c AS src, s + 1000000 AS dst FROM eo
        UNION ALL
        SELECT s + 1000000 AS src, c AS dst FROM eo
    ),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
    n AS (SELECT count(*) AS nn FROM deg),
    r0 AS (SELECT src AS v, {m} // nn AS r FROM deg CROSS JOIN n),{",".join(iter_ctes)}
    SELECT CAST(v AS BIGINT) AS v, CAST(r AS BIGINT) AS rank_micro
    FROM {prev} ORDER BY r DESC, v LIMIT 20
    """


@query("q_pagerank3", _pagerank_sql())
def q_pagerank3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration quantized PageRank over the undirected customer<->
    supplier trade graph (edges from distinct (custkey, suppkey) pairs in
    joined orders x lineitem; supplier ids offset by 1e6). All mass in
    int64 micro-units with integral DIV everywhere, so the result is
    bit-exact on any engine/partitioning — see
    operators/graph.pagerank_quantized for the spec and the per-iteration
    plan (one src join + one dst sum, O(iters) shuffles)."""
    from vectorflow_spark.operators.graph import pagerank_quantized

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    eo = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = eo.select(F.col("c").alias("src"), (F.col("s") + 1000000).alias("dst")).union(
        eo.select((F.col("s") + 1000000).alias("src"), F.col("c").alias("dst"))
    )
    r = pagerank_quantized(edges, iterations=3)
    return (
        r.orderBy(F.col("r").desc(), "v")
        .limit(20)
        .select(F.col("v").cast("bigint").alias("v"), F.col("r").cast("bigint").alias("rank_micro"))
    )


@query(
    "q_retention_cohorts",
    """
    WITH u AS (
        SELECT user_id, min(epoch_ns(ts)) // 604800000000000 AS cohort_w
        FROM events GROUP BY 1
    ),
    a AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS w FROM events
    )
    SELECT cohort_w, CAST(w - cohort_w AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM a JOIN u USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen week, then
    counted per (cohort, weeks-since-first-seen). Integer epoch-week ids
    via integral DIV (epoch nanos exceed double's 2^53). Plan: both the
    first-seen agg and the distinct-activity agg key on user_id — one
    shuffle partitioning reused across them and the join; the final
    rollup groups on the tiny (cohort, offset) grid."""
    e = _t(spark, sf_dir, "events")
    week = F.expr("ts div 604800000000000")
    u = e.groupBy("user_id").agg(F.min(week).alias("cohort_w"))
    a = e.select("user_id", week.alias("w")).distinct()
    return (
        a.join(u, "user_id")
        .groupBy("cohort_w", (F.col("w") - F.col("cohort_w")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q_lsh_recall",
    f"""
    WITH exact AS ({_jaccard_pairs_sql()}),
    cand AS ({_minhash_pairs_sql()}),
    j AS (
        SELECT e.a, e.b, (c.a IS NOT NULL) AS hit
        FROM exact e LEFT JOIN cand c ON e.a = c.a AND e.b = c.b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(*) FILTER (hit) AS BIGINT) AS n_hit,
           CAST(count(*) FILTER (hit) AS DOUBLE) / count(*) AS recall
    FROM j
    """,
)
def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality audit: recall of the MinHash band-bucket candidate
    generator against ground-truth word-3-gram Jaccard >= 0.3 pairs — the
    eval you run before trusting an approximate dedup config at scale.
    Composition of two already-verified pipelines + one left join on the
    (a, b) pair key; the join input is pairs (already small), never
    documents.

    This oracle runs ``sample=1.0`` (full exact ground truth — that cost
    is the point of an audit, paid once per config). At 100 TB the same
    operator runs on a deterministic hash-slice of documents
    (operators/dedup.lsh_recall_audit's ``sample`` parameter), making the
    exact-Jaccard side O(sample²) while estimating the identical ratio;
    tests pin sample=1.0 ≡ this query and the slice's determinism."""
    from vectorflow_spark.operators.dedup import lsh_recall_audit

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    return lsh_recall_audit(docs, sample=1.0)


@query(
    "q_lsh_recall_sampled",
    f"""
    WITH documents AS (SELECT * FROM main.documents WHERE doc_id % 10 < 3),
    exact AS ({_jaccard_pairs_sql()}),
    cand AS ({_minhash_pairs_sql()}),
    j AS (
        SELECT e.a, e.b, (c.a IS NOT NULL) AS hit
        FROM exact e LEFT JOIN cand c ON e.a = c.a AND e.b = c.b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(*) FILTER (hit) AS BIGINT) AS n_hit,
           CAST(count(*) FILTER (hit) AS DOUBLE) / count(*) AS recall
    FROM j
    """,
)
def q_lsh_recall_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION recall-audit mode: same audit as q_lsh_recall but
    over a deterministic ~30% document slice, so the exact-Jaccard
    ground-truth side costs O(0.3²) of the full corpus — this is the
    path a 100 TB run takes, benched alongside the sample=1.0 oracle
    mode so the bench tracks what production pays (the 4 s exact-mode
    outlier stops masking regressions elsewhere).

    The slice here is ``doc_id % 10 < 3`` rather than the operator's
    xxhash64 slice ONLY because the oracle must reproduce it bit-for-bit
    in DuckDB (no Spark-compatible xxhash64 there); plan shape and cost
    profile are identical, and tests/test_extensions.py pins the hash
    slice's engine-side determinism + recall tolerance separately."""
    from vectorflow_spark.operators.dedup import lsh_recall_audit

    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.pmod(F.col("doc_id"), F.lit(10)) < F.lit(3))
        .select("doc_id", "text")
    )
    return lsh_recall_audit(docs, sample=1.0)


@query(
    "q_bm25_topterms",
    r"""
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
            FROM documents
        ) WHERE tok <> ''
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS nd,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM dl
    ),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               CAST(round(
                   ln((CAST(nd - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                   * (CAST(tf AS DOUBLE) * 2.2)
                   / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
                   * 1000000) AS BIGINT) AS score_micro
        FROM tf
        JOIN dl ON tf.doc_id = dl.doc_id
        JOIN df ON tf.tok = df.tok
        CROSS JOIN stats
    )
    SELECT doc_id, tok, score_micro, CAST(rn AS INT) AS rn FROM (
        SELECT doc_id, tok, score_micro,
               row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, tok) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def q_bm25_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-3 terms per document — the search-ranking
    sibling of q_tfidf_topterms. The score is computed with an identical
    expression tree on both engines then micro-quantized BEFORE ranking,
    so rank comparisons happen on integers (ties on the term string).
    Plan: tf/dl/df are map-side-combinable aggs; df joins tf on the token
    key (never broadcast — open vocabulary); corpus stats are a 1-row
    broadcast; final per-doc top-3 is WindowGroupLimit-prunable.
    ONE tokenize pass (guide §2.3, r11 third session): dl/df/stats and
    the score join all read the checkpointed tf table — dl = sum of a
    doc's tf counts (the same integer as counting its tokens), so the
    raw token stream is exploded exactly once; the old form re-ran the
    tokenize+explode for every tf/dl reference (4 corpus passes)."""
    docs = _t(spark, sf_dir, "documents", split=True)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = (
        toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("nd"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    idf = F.log(
        ((F.col("nd") - F.col("df")).cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
        + 1.0
    )
    den = F.col("tf").cast("double") + 1.2 * (
        F.lit(1.0) - 0.75 + 0.75 * (F.col("dl").cast("double") / F.col("avgdl"))
    )
    score = idf * (F.col("tf").cast("double") * 2.2) / den
    scored = (
        tf.join(dl, "doc_id")
        .join(df, "tok")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            "tok",
            F.round(score * 1000000).cast("bigint").alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_micro").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "score_micro", "rn")
    )


# ---------------------------------------------------------------------------
# Batch 4: skyline, Markov transitions, rolling distinct actives.
# ---------------------------------------------------------------------------


@query(
    "q_skyline_orders",
    """
    WITH g AS (
        SELECT o_orderpriority, o_totalprice, min(o_orderdate) AS mdate
        FROM orders GROUP BY 1, 2
    ),
    p AS (
        SELECT o_orderpriority, o_totalprice,
               min(mdate) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pref_min
        FROM g
    )
    SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice,
           CAST(strftime(o.o_orderdate, '%Y%m%d') AS INT) AS odate
    FROM orders o JOIN p ON o.o_orderpriority = p.o_orderpriority
                      AND o.o_totalprice = p.o_totalprice
    WHERE p.pref_min IS NULL OR p.pref_min >= o.o_orderdate
    """,
)
def q_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-dominance 2D skyline (Pareto frontier) per order priority:
    orders not strictly dominated on (higher price, earlier date). The
    naive formulation is a quadratic NOT EXISTS self-join; this plan
    compresses to DISTINCT PRICE LEVELS first (groupBy price -> min date),
    takes a running min of date over strictly-higher price levels (the
    1-PRECEDING frame excludes the current level = strictness), and joins
    the verdict back — O(n log n) by levels, the frame never scans raw
    rows. A row survives iff no higher price level saw an earlier date."""
    o = _t(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority", "o_totalprice").agg(F.min("o_orderdate").alias("mdate"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = g.select(
        "o_orderpriority",
        "o_totalprice",
        F.min("mdate").over(w).alias("pref_min"),
    )
    return (
        o.join(p, ["o_orderpriority", "o_totalprice"])
        .filter(F.col("pref_min").isNull() | (F.col("pref_min") >= F.col("o_orderdate")))
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyyMMdd").cast("int").alias("odate"),
        )
    )


@query(
    "q_markov_transitions",
    """
    WITH s AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_ns(ts), event_id) AS prev
        FROM events
    ),
    t AS (
        SELECT prev, event_type AS curr, count(*) AS cnt
        FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    f AS (SELECT prev, sum(cnt) AS tot FROM t GROUP BY 1)
    SELECT t.prev, t.curr, CAST(t.cnt AS BIGINT) AS cnt,
           CAST(t.cnt AS DOUBLE) / tot AS p
    FROM t JOIN f ON t.prev = f.prev
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: bigram counts via one lag window, row-normalized to
    probabilities (small-integer ratio — exact in double). Plan: one
    user_id shuffle for the lag, then aggregation over the tiny
    (state x state) grid; the normalizer joins on the handful of prev
    states. The sequence-model sibling of q_funnel_conversion."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev"))
    t = (
        s.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("curr"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    f = t.groupBy("prev").agg(F.sum("cnt").alias("tot"))
    return t.join(f, "prev").select(
        "prev",
        "curr",
        "cnt",
        (F.col("cnt").cast("double") / F.col("tot")).alias("p"),
    )


@query(
    "q_rolling_dau",
    """
    WITH ud AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events
    ),
    bound AS (SELECT max(day) AS mx FROM ud),
    contrib AS (
        SELECT DISTINCT user_id, unnest(range(day, day + 7)) AS wday FROM ud
    )
    SELECT wday AS day, CAST(count(*) AS BIGINT) AS active_7d
    FROM contrib CROSS JOIN bound
    WHERE wday <= mx
    GROUP BY 1
    """,
)
def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day. Rolling COUNT
    DISTINCT is not window-expressible without holding per-day user sets;
    the scalable identity: a user active on day d is active-in-window for
    days d..d+6, so explode each distinct (user, day) into its 7 target
    days, de-dup, and count — two shuffles on uniform keys, state bounded
    by 7x the distinct (user, day) pairs, never a per-window set. Days in
    integral DIV epoch-days; the max-day bound trims windows that extend
    past the observed range."""
    e = _t(spark, sf_dir, "events")
    day = F.expr("ts div 86400000000000")
    ud = e.select("user_id", day.alias("day")).distinct()
    bound = ud.agg(F.max("day").alias("mx"))
    contrib = ud.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("wday")
    ).distinct()
    return (
        contrib.join(F.broadcast(bound))
        .filter(F.col("wday") <= F.col("mx"))
        .groupBy(F.col("wday").alias("day"))
        .agg(F.count(F.lit(1)).alias("active_7d"))
    )


# ---------------------------------------------------------------------------
# Batch 5: data-quality audit, corpus bigrams, audience overlap.
# ---------------------------------------------------------------------------


@query(
    "q_dq_audit",
    """
    SELECT rule, CAST(n AS BIGINT) AS n FROM (
        SELECT 'orphan_lineitem' AS rule, count(*) AS n
        FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'nonpositive_price', count(*) FROM lineitem WHERE l_extendedprice <= 0
        UNION ALL
        SELECT 'deep_discount', count(*) FROM lineitem WHERE l_discount > 0.08
        UNION ALL
        SELECT 'ship_before_order', count(*)
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate < o_orderdate
        UNION ALL
        SELECT 'null_customer_name', count(*) FROM customer WHERE c_name IS NULL
    )
    """,
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality rule audit in one result set: referential integrity
    (orphan facts via anti join — Spark's decorrelation of NOT IN on a
    non-null key), domain checks (pushable predicates, counted at the
    scan), and a cross-table ordering invariant (ship-before-order). Each
    rule is a 1-row aggregate; the union is of COUNTS, so the audit costs
    one pass per rule over pruned scans, not one pass per rule over wide
    rows. Zero-violation rules stay in the report — an audit that omits
    passing rules can't distinguish 'passed' from 'not run'."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")

    def one(rule: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(rule).alias("rule"), "n")

    orphan = li.select("l_orderkey").join(
        o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti"
    )
    ship_before = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") < F.col("o_orderdate")
    )
    return (
        one("orphan_lineitem", orphan)
        .unionByName(one("nonpositive_price", li.filter(F.col("l_extendedprice") <= 0)))
        .unionByName(one("deep_discount", li.filter(F.col("l_discount") > 0.08)))
        .unionByName(one("ship_before_order", ship_before))
        .unionByName(one("null_customer_name", c.filter(F.col("c_name").isNull())))
    )


@query(
    "q_top_bigrams",
    r"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
        FROM documents
    ),
    bg AS (
        SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bigram
        FROM toks WHERE len(ts) >= 2
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
    FROM bg GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20
    """,
)
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 word bigrams — the n-gram statistics pass of an LM
    data pipeline. Bigrams come from one in-row array transform (no
    self-join of the token stream on position); the count is map-side
    combinable and the top-20 is TakeOrderedAndProject with a bigram
    tiebreak, never a global sort."""
    docs = _t(spark, sf_dir, "documents", split=True)
    ts = F.expr(r"filter(split(lower(text), '\\s+'), t -> t <> '')")
    bigrams = (
        docs.select(ts.alias("ts"))
        .filter(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i+1]))")
            ).alias("bigram")
        )
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


@query(
    "q_audience_overlap",
    """
    WITH ue AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, count(*) AS n FROM ue GROUP BY 1),
    inter AS (
        SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS ni
        FROM ue a JOIN ue b ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT ta, tb, CAST(ni AS BIGINT) AS n_common,
           CAST(ni AS DOUBLE) / least(sa.n, sb.n) AS overlap
    FROM inter
    JOIN sz sa ON ta = sa.event_type
    JOIN sz sb ON tb = sb.event_type
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap coefficient |A∩B| / min(|A|,|B|) for every pair of
    event types. The self-join keys on user_id (uniform, skew-free); the
    per-type pair grid is tiny so the intersection agg collapses
    map-side. Sizes broadcast back onto the grid. Exact small-integer
    ratio — deterministic in double."""
    e = _t(spark, sf_dir, "events")
    # the distinct frame feeds three branches (sizes + both join sides);
    # checkpoint so the events-wide distinct shuffle runs once
    ue = e.select("event_type", "user_id").distinct().localCheckpoint()
    sz = ue.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ue.select(F.col("event_type").alias("ta"), "user_id")
    b = ue.select(F.col("event_type").alias("tb"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    sa = sz.select(F.col("event_type").alias("ta"), F.col("n").alias("na"))
    sb = sz.select(F.col("event_type").alias("tb"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .select(
            "ta",
            "tb",
            F.col("ni").alias("n_common"),
            (F.col("ni").cast("double") / F.least("na", "nb")).alias("overlap"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 6: mergeable histogram quantiles, aggregate-function family,
# perceptual image dedup (rows-only).
# ---------------------------------------------------------------------------


@query(
    "q_histogram_quantiles",
    """
    WITH bounds AS (
        SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi, count(*) AS n
        FROM orders
    ),
    hist AS (
        SELECT least(CAST(floor(((o_totalprice - lo) / (hi - lo)) * 128) AS BIGINT), 127) AS bin,
               count(*) AS cnt
        FROM orders CROSS JOIN bounds GROUP BY 1
    ),
    cum AS (
        SELECT bin, cnt,
               sum(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdf
        FROM hist
    )
    SELECT q, CAST(min(bin) AS BIGINT) AS bin,
           CAST(min(lo + (hi - lo) * (bin / 128.0)) AS DOUBLE) AS est_value
    FROM cum CROSS JOIN bounds
    CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS q)
    WHERE cdf >= q * n
    GROUP BY q
    """,
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch quantile estimation: one-pass 128-bin equi-width
    histogram, cumulative counts, first bin whose CDF crosses each target
    — p50/p90/p99 with error bounded by range/128, from state that is 128
    counters regardless of data size (the scale alternative to exact
    ranking when ±1 bin suffices; q_winsorized_stats is the exact path).
    The bin function and the bin->value reconstruction are identical
    expressions on both engines; the CDF window runs over 128 rows, not
    data. Integer bin ids; only the final est_value is float (same
    expression both sides)."""
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    # explicit floor before the integer cast: DuckDB's double->BIGINT cast
    # ROUNDS to nearest while Spark's truncates — floor() first makes the
    # binning identical (and is the intended semantics).
    binc = F.least(
        F.floor((((F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo"))) * 128)).cast("bigint"),
        F.lit(127).cast("bigint"),
    )
    hist = (
        o.join(F.broadcast(bounds))
        .groupBy(binc.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("cdf", F.sum("cnt").over(w))
    qs = spark.range(1).select(F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("q"))
    return (
        cum.join(F.broadcast(bounds))
        .join(F.broadcast(qs))
        .filter(F.col("cdf") >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(
            F.min("bin").alias("bin"),
            F.min(F.col("lo") + (F.col("hi") - F.col("lo")) * (F.col("bin") / F.lit(128.0))).alias("est_value"),
        )
    )


@query(
    "q_agg_family",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_finished,
           bool_or(o_totalprice > 400000.0) AS any_jumbo,
           bool_and(o_totalprice > 0.0) AS all_positive,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders GROUP BY 1
    """,
)
def q_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining aggregate-function surface in one grouped pass:
    filtered count, bool_or/bool_and (ANY/EVERY), distinct count, min/max.
    All map-side combinable; the distinct-count expands to the standard
    two-phase plan. Values compare exactly (booleans, integers, raw
    doubles passed through)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_jumbo"),
        F.bool_and(F.col("o_totalprice") > 0.0).alias("all_positive"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "q_image_dhash_dedup",
    """
    SELECT CAST(min(doc_id) AS BIGINT) AS keeper,
           CAST(count(*) AS BIGINT) AS n_images
    FROM documents GROUP BY doc_id % 97 HAVING count(*) > 1
    """,
)
def q_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: synthesize images whose pixel seed is
    doc_id mod 97 — guaranteeing duplicate pixel content — dHash them,
    and report hash groups with >1 member (Hamming-0 exact groups;
    Hamming-band the integer like SimHash for near-dups).
    CROSS-CONTAINER by construction: ids rotate mod 3 through FAKE-codec
    blobs, real BMP files and real PNG files (stdlib zlib decode), so
    every duplicate group mixes all three container families — the dedup
    key is the pixels, not the bytes. Plan: Arrow-batched hash UDF, then
    one groupBy on the 8-byte hash.

    The oracle (r7, upgraded from rows-only) checks the recovered GROUP
    STRUCTURE against ground truth: because images with equal seeds are
    pixel-identical, every dHash group must be exactly one seed class —
    (min doc_id, member count) per seed with >1 member. The dhash VALUE
    itself is the one thing DuckDB cannot mirror, so the gate projects
    the group facts; a hash collision merging two seed classes would
    (correctly) fail the oracle."""
    from vectorflow_spark.operators.codecs import decode_image, encode_bmp, encode_png
    from vectorflow_spark.operators.multimodal import image_dhash, make_fake_image

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id")
    import pandas as pd
    from pyspark.sql.types import BinaryType

    def _one(i) -> bytes:
        blob = make_fake_image(str(int(i) % 97))
        k = int(i) % 3
        if k == 1:
            return encode_bmp(decode_image(blob))
        if k == 2:
            return encode_png(decode_image(blob))
        return blob

    # lambda form: pyspark's signature parser can't resolve `pd.Series`
    # annotations when pandas is imported function-locally
    gen = F.pandas_udf(
        lambda ids: pd.Series([_one(i) for i in ids]),
        BinaryType(),
    )

    assets = docs.select(F.col("doc_id").alias("asset_id"), gen("doc_id").alias("data"))
    hashed = image_dhash(assets)
    return (
        hashed.groupBy("dhash")
        .agg(F.count(F.lit(1)).alias("n_images"), F.min("asset_id").alias("keeper"))
        .filter(F.col("n_images") > 1)
        .select("keeper", "n_images")
    )




def _label_prop_sql(iters: int = 3, m: int = 1 << 42) -> str:
    prev = "l0"
    ctes = []
    for i in range(1, iters + 1):
        ctes.append(f"""
    l{i} AS (
        SELECT src AS v, ((min(key) % {m}) + {m}) % {m} AS lbl
        FROM (
            SELECT e.src, l.lbl - count(*) * {m} AS key
            FROM edges e JOIN {prev} l ON e.dst = l.v
            GROUP BY e.src, l.lbl)
        GROUP BY 1
    )""")
        prev = f"l{i}"
    return f"""
    WITH eo AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT c AS src, s + 1000000 AS dst FROM eo
        UNION ALL
        SELECT s + 1000000 AS src, c AS dst FROM eo
    ),
    l0 AS (SELECT DISTINCT src AS v, src AS lbl FROM edges),{",".join(ctes)}
    SELECT CAST(sz AS BIGINT) AS community_size,
           CAST(count(*) AS BIGINT) AS n_communities
    FROM (SELECT lbl, count(*) AS sz FROM {prev} GROUP BY 1)
    GROUP BY 1
    """


@query("q_label_prop", _label_prop_sql())
def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round deterministic label propagation over the undirected
    customer<->supplier trade graph (same edge derivation as q_pagerank3):
    each node adopts its neighborhood's majority label, ties to the
    smallest, via the arithmetic (count desc, label asc) argmin encoding —
    bit-exact on both engines (operators/graph.label_propagation). Output
    is the community-size histogram after round 3; the oracle unrolls the
    identical rounds as chained CTEs."""
    from vectorflow_spark.operators.graph import label_propagation

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    eo = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = eo.select(F.col("c").alias("src"), (F.col("s") + 1000000).alias("dst")).union(
        eo.select((F.col("s") + 1000000).alias("src"), F.col("c").alias("dst"))
    )
    # the edge set is the symmetric union above, so every dst appears as
    # src — the undirected assertion lets round 1 skip the identity join
    labels = label_propagation(edges, iterations=3, undirected=True)
    return (
        labels.groupBy("lbl")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy(F.col("sz").cast("bigint").alias("community_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_communities"))
    )
