"""Event analytics: SCD2, graph stats, entropy, sketches, sessionization windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import _t, query
from vectorflow_spark.queries.dedup import _minhash_pairs_sql, _minhash_sig_sql


# ---------------------------------------------------------------------------
# Round 2 batch B: event analytics, SCD2, graph stats, entropy, sketch HH
# ---------------------------------------------------------------------------


@query(
    "q_funnel_conversion",
    """
    WITH s0 AS (
        SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    s1 AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN s0 ON e.user_id = s0.user_id
        WHERE e.event_type = 'view' AND e.ts > s0.t0 GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
    )
    SELECT CAST(0 AS INT) AS stage_idx, 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s0
    UNION ALL
    SELECT 1, 'view', count(*) FROM s1
    UNION ALL
    SELECT 2, 'click', count(*) FROM s2
    UNION ALL
    SELECT 3, 'purchase', count(*) FROM s3
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel signup -> view -> click -> purchase
    over the events table: a user advances only via an event strictly
    after their previous-stage conversion time. Single DataFrame plan (no
    driver-side count per stage); every aggregation keys on user_id.
    Timestamps are raw parquet nanos on the Spark side (the NANOS
    timestamp the vectorized reader rejects) — pure comparisons, so the
    integer reading is order-identical to DuckDB's native timestamps."""
    from vectorflow_spark.operators.events import funnel_conversion

    ev = _t(spark, sf_dir, "events")
    return funnel_conversion(ev, ["signup", "view", "click", "purchase"])


@query(
    "q_gap_fill",
    """
    WITH hourly AS (
        SELECT event_type AS key, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket_id,
               sum(CAST(value AS DECIMAL(18,6))) AS v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT min(CAST(floor(epoch(ts) / 3600) AS BIGINT)) AS lo,
               max(CAST(floor(epoch(ts) / 3600) AS BIGINT)) AS hi
        FROM events
    ),
    spine AS (
        SELECT k.key, g.bucket_id
        FROM (SELECT DISTINCT event_type AS key FROM events) k
        CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS bucket_id FROM bounds) g
    )
    SELECT s.key, s.bucket_id,
           CAST(last_value(h.v IGNORE NULLS) OVER (
               PARTITION BY s.key ORDER BY s.bucket_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled_value,
           h.v IS NULL AS was_gap
    FROM spine s LEFT JOIN hourly h ON s.key = h.key AND s.bucket_id = h.bucket_id
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: hourly per-type value sums on a dense hour
    spine with LOCF carry-forward for quiet hours. The spine is generated
    from a 1-row bound aggregate (no driver collect); sums are
    decimal-exact; hour ids are integer nano arithmetic on the Spark side
    and epoch division in DuckDB — the same integers."""
    from vectorflow_spark.operators.events import gap_fill_locf

    ev = _t(spark, sf_dir, "events")
    return gap_fill_locf(ev, F.expr("ts div 3600000000000"))


_SCD2_SQL = """
    WITH cur AS (
        SELECT c_custkey, c_mktsegment,
               TIMESTAMP '1995-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer
    ),
    upd AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN 'SEG_NEW' ELSE c_mktsegment END AS c_mktsegment
        FROM customer WHERE c_custkey % 3 != 0
        UNION ALL
        SELECT c_custkey + 1000000, 'SEG_FRESH' FROM customer WHERE c_custkey % 97 = 0
    ),
    unchanged AS (
        SELECT c.* FROM cur c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
        WHERE u.c_custkey IS NULL OR u.c_mktsegment = c.c_mktsegment
    ),
    closed AS (
        SELECT c.c_custkey, c.c_mktsegment, c.valid_from,
               TIMESTAMP '2000-06-01' AS valid_to
        FROM cur c JOIN upd u ON c.c_custkey = u.c_custkey
        WHERE u.c_mktsegment != c.c_mktsegment
    ),
    opened AS (
        SELECT u.c_custkey, u.c_mktsegment,
               TIMESTAMP '2000-06-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM upd u LEFT JOIN cur c ON c.c_custkey = u.c_custkey
        WHERE c.c_custkey IS NULL OR u.c_mktsegment != c.c_mktsegment
    )
    SELECT * FROM unchanged UNION ALL SELECT * FROM closed UNION ALL SELECT * FROM opened
"""


@query("q_scd2_apply", _SCD2_SQL)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 merge (the MERGE INTO WHEN
    MATCHED/NOT MATCHED shape as a pure DataFrame plan): a deterministic
    update batch against the customer dimension closes changed rows at
    the effective date and opens new versions; brand-new keys insert
    open rows. One digest-compressed full-outer join on the key is the
    only shuffle. Updates derived arithmetically from customer so the
    oracle reproduces them exactly."""
    from vectorflow_spark.operators.diff import scd2_apply

    c = _t(spark, sf_dir, "customer")
    current = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = (
        c.filter(F.col("c_custkey") % 3 != 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 7 == 0, F.lit("SEG_NEW"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("SEG_FRESH").alias("c_mktsegment"),
            )
        )
    )
    return scd2_apply(
        current,
        updates,
        key_cols=["c_custkey"],
        compare_cols=["c_mktsegment"],
        effective_ts="2000-06-01",
    )


@query(
    "q_triangle_count",
    f"""
    WITH edges AS ({_minhash_pairs_sql(max_bucket=64)}),
    nodes AS (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges),
    rk AS (
        SELECT node, count(*) * 1000000000 + node AS rank
        FROM nodes GROUP BY node
    ),
    directed AS (
        SELECT CASE WHEN ra.rank < rb.rank THEN e.a ELSE e.b END AS src,
               CASE WHEN ra.rank < rb.rank THEN e.b ELSE e.a END AS dst,
               greatest(ra.rank, rb.rank) AS dst_rank
        FROM edges e JOIN rk ra ON e.a = ra.node JOIN rk rb ON e.b = rb.node
    ),
    tri AS (
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM directed l
        JOIN directed h ON l.src = h.src AND l.dst_rank < h.dst_rank
        JOIN directed d ON d.src = l.dst AND d.dst = h.dst
    )
    SELECT (SELECT CAST(count(DISTINCT node) AS BIGINT) FROM nodes) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           n_triangles
    FROM tri
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the minhash near-dup candidate graph — the
    cohesion statistic separating real duplicate clusters (dense,
    triangle-rich) from hash-collision stars. Degree-ordered node
    iterator: each triangle counted exactly once at its lowest-rank
    vertex, every shuffle keys on a node id.

    The audit runs with a 64-doc posting-list cap (vs the dedup default
    1000): candidate CLIQUES make wedge work cubic in cluster size — the
    synthetic corpus has ~1000-doc near-dup families, i.e. ~10^9 wedges
    uncapped (measured 115 s at sf0.1) — and the cohesion statistic needs
    only a bounded per-bucket sample of each cluster, not the full clique
    (a real cluster stays triangle-dense under any uniform member cap;
    collision stars stay triangle-free). Same cap in the oracle SQL."""
    from vectorflow_spark.operators.dedup import minhash_candidate_pairs
    from vectorflow_spark.operators.graph import triangle_count

    docs = _t(spark, sf_dir, "documents", split=True)
    pairs = minhash_candidate_pairs(docs, max_bucket=64)
    return triangle_count(pairs)


@query(
    "q_numeric_histogram",
    """
    SELECT bin,
           CAST(bin * 50000.0 AS DOUBLE) AS bin_lo,
           CAST((bin + 1) * 50000.0 AS DOUBLE) AS bin_hi,
           CAST(count(*) AS BIGINT) AS cnt
    FROM (
        SELECT least(11, greatest(0, CAST(floor((o_totalprice - 0.0) / 50000.0) AS INT))) AS bin
        FROM orders
    )
    GROUP BY 1
    """,
)
def q_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 12-bin histogram of order totals with under/overflow
    clamped into the edge bins. The aggregation groups on at most 12
    values, so the shuffle carries the histogram, not the data; bin edges
    are literal doubles folded by Catalyst and identical in DuckDB."""
    from vectorflow_spark.operators.rollup import width_bucket_histogram

    o = _t(spark, sf_dir, "orders")
    return width_bucket_histogram(o, "o_totalprice", lo=0.0, hi=600000.0, nbins=12)


@query(
    "q_word_entropy",
    r"""
    WITH toks AS (
        SELECT doc_id, t.tok
        FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS t(tok)
        WHERE t.tok <> ''
    ),
    counts AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
    perdoc AS (
        SELECT doc_id,
               list(CAST(cnt AS DOUBLE) ORDER BY cnt, tok) AS cs,
               CAST(sum(cnt) AS BIGINT) AS n_tokens
        FROM counts GROUP BY 1
    )
    SELECT doc_id, n_tokens,
           round(
               log2(CAST(n_tokens AS DOUBLE))
               - list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE), list_transform(cs, c -> c * log2(c))),
                     (a, b) -> a + b
                 ) / CAST(n_tokens AS DOUBLE),
               6) AS entropy_bits
    FROM perdoc
    """,
)
def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (information
    -density quality signal). The inner sum is a sequential left fold over
    the (count, token)-sorted list on BOTH engines — float accumulation
    order pinned, result rounded to 6 decimals to absorb last-ulp libm
    log2 differences."""
    from vectorflow_spark.operators.textstats import word_entropy

    docs = _t(spark, sf_dir, "documents", split=True)
    return word_entropy(docs)


@query(
    "q_bigram_perplexity",
    r"""
    WITH ts0 AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
        FROM documents
    ),
    ts AS (SELECT doc_id, ts FROM ts0 WHERE len(ts) >= 2),
    bg AS (
        SELECT doc_id, i AS pos, ts[i] AS w1, ts[i + 1] AS w2
        FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM ts)
    ),
    uni AS (SELECT w, count(*) AS cu FROM (SELECT unnest(ts) AS w FROM ts) GROUP BY 1),
    big AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
    n AS (SELECT count(*) AS nn FROM (SELECT unnest(ts) AS w FROM ts)),
    terms AS (
        SELECT g.doc_id, g.pos,
               round(log2(0.75 * b.cb / u1.cu + 0.25 * u2.cu / n.nn), 9) AS lp
        FROM bg g
        JOIN big b ON g.w1 = b.w1 AND g.w2 = b.w2
        JOIN uni u1 ON g.w1 = u1.w
        JOIN uni u2 ON g.w2 = u2.w
        CROSS JOIN n
    ),
    perdoc AS (
        SELECT doc_id, list(lp ORDER BY pos) AS lps, CAST(count(*) AS BIGINT) AS n_bigrams
        FROM terms GROUP BY 1
    )
    SELECT doc_id, n_bigrams,
           round(
               pow(2.0, - list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lps), (a, b) -> a + b)
                          / CAST(n_bigrams AS DOUBLE)),
               6) AS ppl
    FROM perdoc
    """,
)
def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under a corpus-fit interpolated bigram LM —
    the CCNet/FineWeb LM-quality ranking signal, with model estimation and
    scoring fused into the same distributed passes (see
    textstats.bigram_perplexity for the plan and determinism notes)."""
    from vectorflow_spark.operators.textstats import bigram_perplexity

    docs = _t(spark, sf_dir, "documents", split=True)
    return bigram_perplexity(docs)


@query(
    "q_cms_heavy_hitters",
    """
    WITH seeds AS (SELECT unnest(range(0, 4)) AS seed),
    cells AS (
        SELECT s.seed AS row_id,
               ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR) || '|' || CAST(s.seed AS VARCHAR)), 1, 7))::BIGINT % 64 AS col_id,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem CROSS JOIN seeds s
        GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT l_suppkey FROM lineitem),
    addr AS (
        SELECT k.l_suppkey, s.seed AS row_id,
               ('0x' || substr(md5(CAST(k.l_suppkey AS VARCHAR) || '|' || CAST(s.seed AS VARCHAR)), 1, 7))::BIGINT % 64 AS col_id
        FROM keys k CROSS JOIN seeds s
    ),
    est AS (
        SELECT a.l_suppkey, min(c.cnt) AS est
        FROM addr a JOIN cells c ON a.row_id = c.row_id AND a.col_id = c.col_id
        GROUP BY 1
    )
    SELECT l_suppkey, est FROM est WHERE est >= 700
    """,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-side heavy hitters: suppliers whose count-min estimate over
    lineitem occurrences reaches the threshold. Never-undercount makes
    this a superset of the true heavy hitters (no false negatives); the
    shuffle is sketch-sized. Oracle reproduces the md5 cell addressing
    bit-for-bit."""
    from vectorflow_spark.operators.sketches import cms_heavy_hitters

    # split=True: the sketch build md5-hashes every (key, seed) row — the
    # gate's dominant CPU — and otherwise runs on the single scan
    # partition (r11: 2.35->1.33 s; cell counts are order-independent).
    li = _t(spark, sf_dir, "lineitem", split=True).select("l_suppkey")
    return cms_heavy_hitters(li, "l_suppkey", threshold=700)


@query(
    "q_minhash_jaccard_est",
    f"""
    WITH sig AS ({_minhash_sig_sql(16)}),
    pairs AS ({_minhash_pairs_sql()})
    SELECT p.a, p.b,
           CAST({" + ".join(f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(16))} AS INT) AS n_agree,
           CAST({" + ".join(f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(16))} AS DOUBLE) / 16.0 AS jaccard_est
    FROM pairs p JOIN sig sa ON p.a = sa.doc_id JOIN sig sb ON p.b = sb.doc_id
    """,
)
def q_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-agreement Jaccard estimates for every LSH candidate pair
    — the cheap verify tier between candidate generation and the exact
    n-gram join. n_agree/16 is a small rational, exact in double on both
    engines."""
    from vectorflow_spark.operators.dedup import minhash_jaccard_estimate

    docs = _t(spark, sf_dir, "documents", split=True)
    return minhash_jaccard_estimate(docs)


@query(
    "q_range_search",
    """
    WITH scored AS (
        SELECT vec_id, label,
               round(
                 list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(64.0)),
                 9) AS score
        FROM embeddings
    )
    SELECT vec_id, label, score FROM scored WHERE score >= 0.2
    """,
)
def q_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine RANGE search (radius query): every vector within a similarity
    threshold of the query — the dual of top-K, used for near-dup audit
    sweeps where the result size is data-dependent. Same single-scan plan
    as q_topk_cosine but the filter replaces TakeOrderedAndProject, so the
    output needs no global sort at all (fully parallel emit at 100 TB);
    scores rounded to 9 decimals before the threshold so both engines
    compare identical values."""
    from vectorflow_spark.functions.vector import dot_sql, l2_norm
    from vectorflow_spark.operators.similarity import _const_vec_sql

    # HOF form on purpose: the filter re-evaluates the projected score, so
    # an unrolled score doubles past the codegen size budget (see
    # functions/vector.py) and the stage falls out of codegen entirely.
    df = _t(spark, sf_dir, "embeddings", split=True)
    ones_sql = _const_vec_sql([1.0] * 64)  # one parsed expr, not 64 py4j lits
    base = df.select(
        "vec_id", "label", F.col("embedding").alias("_v"), l2_norm("embedding").alias("_vn")
    )
    denom = F.col("_vn") * F.lit(8.0)
    scored = base.select(
        "vec_id",
        "label",
        F.round(F.when(denom != 0.0, F.expr(dot_sql("`_v`", ones_sql)) / denom), 9).alias("score"),
    )
    return scored.filter(F.col("score") >= 0.2)


@query(
    "q_oov_rate",
    r"""
    WITH toks AS (
        SELECT doc_id, t.tok
        FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS t(tok)
        WHERE t.tok <> ''
    ),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, count(*) AS cnt FROM toks GROUP BY 1
            ORDER BY cnt DESC, tok LIMIT 200
        )
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS oov_rate
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY 1
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-200
    vocabulary — the vocabulary-coverage quality signal (docs full of rare
    tokens are OCR noise, code, or foreign-language leakage). Two passes:
    corpus token counts -> top-200 (TakeOrdered, deterministic cnt-then-
    token tiebreak), then a broadcast left join of the tiny vocab onto the
    token stream + one per-doc aggregation. The rate is a small-integer
    ratio — exact in double on both engines."""
    docs = _t(spark, sf_dir, "documents", split=True)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(200)
        .select("tok", F.lit(True).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )




@query(
    "q_hll_distinct",
    """
    WITH h AS (
        SELECT l_returnflag AS grp,
               md5(CAST(l_orderkey AS VARCHAR) || '|hll') AS hx
        FROM lineitem
    ),
    r AS (
        SELECT grp,
               ('0x' || substr(hx, 1, 2))::BIGINT % 64 AS j,
               CASE WHEN ('0x' || substr(hx, 3, 7))::BIGINT = 0 THEN 29
                    ELSE 29 - length(bin(('0x' || substr(hx, 3, 7))::BIGINT)) END AS rho
        FROM h
    ),
    regs AS (SELECT grp, j, max(rho) AS m_j FROM r GROUP BY 1, 2),
    agg AS (
        SELECT grp,
               sum((CAST(1 AS BIGINT) << CAST(29 - m_j AS INT))) AS s_present,
               count(*) AS n_present
        FROM regs GROUP BY 1
    )
    SELECT grp AS l_returnflag,
           round(CASE WHEN (1559107488186.368 / CAST(s_present + (64 - n_present) * 536870912 AS DOUBLE)) <= 160.0
                       AND (64 - n_present) > 0
                 THEN 64.0 * ln(64.0 / CAST(64 - n_present AS DOUBLE))
                 ELSE 1559107488186.368 / CAST(s_present + (64 - n_present) * 536870912 AS DOUBLE) END, 4) AS est_distinct
    FROM agg
    """,
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch: estimated distinct orders per
    return flag from 64 max-merged registers. The register build is ONE
    map-side-combined groupBy whose shuffle carries <= 64 rows per group
    per map task regardless of input size — the mergeable alternative to
    countDistinct's exact-but-rehash-everything exchange at 100 TB. Every
    register value and the harmonic sum are exact integers (numerator over
    the common denominator 2^29); the estimate is one double division,
    bit-reproduced by the oracle. m=64 keeps the tested cardinalities in
    the raw-estimator branch (asserted in tests); the linear-counting
    small-range branch is covered by a tolerance unit test.

    vs q_approx_distinct: that gate exercises Spark's built-in
    approx_count_distinct, whose sealed register layout forces a
    rows-only check; this one owns its registers, so the estimate is
    hash-matched against the oracle AND the registers stay available
    for cross-group set algebra (the q_kmv_overlap motivation)."""
    from vectorflow_spark.operators.sketches import hll_distinct_estimate

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")
    return hll_distinct_estimate(li, "l_returnflag", "l_orderkey")


@query(
    "q_hist_quantiles",
    """
    WITH hist AS (
        SELECT l_returnflag AS grp,
               CASE WHEN CAST(floor(CAST(l_extendedprice AS DOUBLE)) AS BIGINT) <= 0 THEN 0
                    ELSE length(bin(CAST(floor(CAST(l_extendedprice AS DOUBLE)) AS BIGINT))) END AS b,
               count(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
        SELECT grp, b, cnt,
               sum(cnt) OVER (PARTITION BY grp ORDER BY b) AS cum,
               sum(cnt) OVER (PARTITION BY grp ORDER BY b) - cnt AS cum_prev,
               sum(cnt) OVER (PARTITION BY grp) AS n
        FROM hist
    ),
    qs AS (SELECT * FROM (VALUES (50, 100), (90, 100), (99, 100)) AS t(q_num, q_den)),
    j AS (
        SELECT c.*, q.q_num,
               (q.q_num * c.n + q.q_den - 1) // q.q_den AS target
        FROM cum c CROSS JOIN qs q
    )
    SELECT grp AS l_returnflag, q_num AS q,
           round(
             (CASE WHEN b = 0 THEN 0 ELSE (CAST(1 AS BIGINT) << CAST(b-1 AS INT)) END)::DOUBLE
             + ((CASE WHEN b = 0 THEN 1 ELSE (CAST(1 AS BIGINT) << CAST(b AS INT)) END)::DOUBLE
                - (CASE WHEN b = 0 THEN 0 ELSE (CAST(1 AS BIGINT) << CAST(b-1 AS INT)) END)::DOUBLE)
               * (CAST(target - cum_prev AS DOUBLE) / CAST(cnt AS DOUBLE)), 6) AS est
    FROM j WHERE cum >= target AND cum_prev < target
    """,
)
def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass mergeable quantile estimates (p50/p90/p99 of extended price
    per return flag) from a log2-bucket histogram — fixed ~50 counters per
    group where an exact quantile needs a global sort. Bucketing uses the
    unpadded-binary-length identity (length(bin(floor(x))) = floor(log2 x)
    + 1), so no float log anywhere; rank targets are exact integer
    rationals (ceil via (num*n + den - 1) div den — NOT a float multiply,
    whose literal typing differs between engines); the interpolated
    estimate is one double division. The cumulative window partitions by
    group over bucket rows only — sketch-sized state, no single-partition
    window at any scale.

    vs q_histogram_quantiles: that gate's equi-width 128 bins bound the
    ABSOLUTE error by range/128 and need the min/max known up front;
    log2 buckets bound the RELATIVE error (factor-2 bracket, recovered
    by interpolation) with no prior pass and no degenerate tail on
    heavy-tailed measures like document lengths or prices."""
    from vectorflow_spark.operators.sketches import histogram_quantiles

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    return histogram_quantiles(li, "l_returnflag", "l_extendedprice")
