"""Deduplication family: exact, MinHash/LSH, SimHash, n-gram Jaccard, embedding near-dup (X4 + extensions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import _t, query


# ---------------------------------------------------------------------------
# Dedup family (SURVEY.md §2.11 X4 + north-star extensions)
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    """
    WITH groups AS (
        SELECT md5(text) AS digest, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    )
    SELECT n_docs AS group_size, CAST(count(*) AS BIGINT) AS n_groups
    FROM groups GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting: histogram of content-digest group sizes
    (group_size=1 -> unique docs; >1 -> exact duplicates). The histogram
    form stays informative even on corpora with no duplicates."""
    df = _t(spark, sf_dir, "documents", split=True)
    return (
        df.select(F.md5(F.col("text")).alias("digest"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .groupBy("group_size")
        .agg(F.count(F.lit(1)).alias("n_groups"))
    )


@query(
    "q_fingerprint_dedup",
    """
    WITH groups AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    )
    SELECT n_docs AS group_size, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n_docs) AS BIGINT) AS n_docs_total
    FROM groups GROUP BY 1
    """,
)
def q_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalization fingerprint dedup accounting (formatting-
    robust): group-size histogram plus covered doc counts."""
    from vectorflow_spark.operators.textstats import fingerprint

    df = _t(spark, sf_dir, "documents", split=True).select(fingerprint("text").alias("fp"))
    return (
        df.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .groupBy("group_size")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("group_size").alias("n_docs_total"),
        )
    )


def _duck_shingle_hash(col: str) -> str:
    return f"('0x' || substr(md5({col}), 1, 7))::BIGINT"


def _duck_char_shingles_cte(n: int = 5) -> str:
    """DuckDB CTE 'sh(doc_id, shingle)': distinct char n-grams (mirrors
    dedup.shingles_expr)."""
    return f"""
    sh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, substring(lower(text), CAST(i AS INT), {n}) AS shingle
            FROM (SELECT doc_id, text, unnest(range(1, length(lower(text)) - {n} + 2)) AS i
                  FROM documents WHERE length(lower(text)) >= {n})
            UNION ALL
            SELECT doc_id, lower(text) AS shingle FROM documents WHERE length(lower(text)) < {n}
        )
    )"""


def _minhash_sig_sql(num_hashes: int = 16) -> str:
    from vectorflow_spark.operators.dedup import MINHASH_COEFFS, MINHASH_PRIME

    aggs = ", ".join(
        f"min((h * {a} + {b}) % {MINHASH_PRIME}) AS mh_{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    )
    return f"""
    WITH {_duck_char_shingles_cte(5)},
    hashed AS (SELECT doc_id, {_duck_shingle_hash('shingle')} AS h FROM sh)
    SELECT doc_id, {aggs} FROM hashed GROUP BY doc_id
    """


@query("q_minhash_signatures", _minhash_sig_sql())
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (16 hash functions over char 5-gram shingles) —
    the whole chain is built-in integer expressions, so the oracle mirrors
    it exactly."""
    from vectorflow_spark.operators.dedup import minhash_signatures

    return minhash_signatures(_t(spark, sf_dir, "documents", split=True).select("doc_id", "text"))


def _minhash_pairs_sql(bands: int = 4, num_hashes: int = 16, max_bucket: int = 1000) -> str:
    """Mirrors dedup.minhash_candidate_pairs incl. the posting-list cap:
    only the ``max_bucket`` lowest doc ids per (band, bucket) participate
    in pair generation (row_number <= cap == slice of the sorted list)."""
    rows = num_hashes // bands
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS bucket FROM sig".format(
            b=b, cols=", ".join(f"mh_{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    return f"""
    WITH sig AS ({_minhash_sig_sql(num_hashes)}),
    bb0 AS (SELECT DISTINCT * FROM ({band_selects})),
    bb AS (
        SELECT doc_id, band, bucket FROM (
            SELECT doc_id, band, bucket,
                   row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS rn
            FROM bb0
        ) WHERE rn <= {max_bucket}
    )
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM bb l JOIN bb r ON l.band = r.band AND l.bucket = r.bucket
    WHERE l.doc_id < r.doc_id
    """


@query("q_minhash_band_pairs", _minhash_pairs_sql())
def q_minhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs via banded bucket collisions (4 bands x
    4 rows). Shuffle key is the (band, bucket) hash — uniform, skew-free."""
    from vectorflow_spark.operators.dedup import minhash_candidate_pairs

    return minhash_candidate_pairs(_t(spark, sf_dir, "documents", split=True).select("doc_id", "text"))


def _jaccard_pairs_sql(threshold: float = 0.3) -> str:
    """Word-3-gram exact Jaccard pairs >= threshold — shared by the
    standalone verify query and the LSH recall audit."""
    return f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS ts
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
           CAST(i.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.a = sa.doc_id
    JOIN sizes sb ON i.b = sb.doc_id
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_common) >= {threshold}
    """


@query("q_ngram_jaccard_pairs", _jaccard_pairs_sql())
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs via inverted-index self-join
    (the verify stage of MinHash-LSH, usable standalone)."""
    from vectorflow_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(
        _t(spark, sf_dir, "documents", split=True).select("doc_id", "text"),
        n=3,
        threshold=0.3,
        kind="word",
    )


# DuckDB mirror of dedup.simhash_expr_pipeline — shared by the fingerprint
# query and the Hamming-pair query below.
_SIMHASH_SQL = """
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')) AS tok
        FROM documents
    ),
    hashed AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 7))::BIGINT AS h FROM toks),
    votes AS (
        SELECT doc_id, bit, sum(vote) AS v FROM (
            SELECT doc_id,
                   unnest(range(0, 32)) AS bit,
                   unnest(list_transform(range(0, 32),
                          j -> CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END)) AS vote
            FROM hashed
        ) GROUP BY doc_id, bit
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """


@query("q_simhash", _SIMHASH_SQL)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints, all built-in integer arithmetic."""
    from vectorflow_spark.operators.dedup import simhash_expr_pipeline

    return simhash_expr_pipeline(_t(spark, sf_dir, "documents", split=True).select("doc_id", "text"))




def _kcore_sql(k: int = 3, rounds: int = 4) -> str:
    """Round-for-round unroll of the synchronous k-core peel over the
    LSH candidate-pair graph. A peel DELETES rows each round, which a
    monotone recursive CTE cannot express — so the oracle replays the
    exact fixed-round schedule the Spark operator runs."""
    # MATERIALIZED: DuckDB inlines plain CTEs, so a 4-round unroll would
    # re-expand the whole minhash pipeline exponentially (3^rounds scans)
    parts = [
        f"WITH pairs AS MATERIALIZED ({_minhash_pairs_sql()}),",
        "e0 AS MATERIALIZED (SELECT a, b FROM pairs)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""",
    d{r} AS (
        SELECT v, count(*) AS c FROM (
            SELECT a AS v FROM e{p} UNION ALL SELECT b FROM e{p}
        ) GROUP BY 1
    ),
    k{r} AS (SELECT v FROM d{r} WHERE c >= {k}),
    e{r} AS MATERIALIZED (
        SELECT e.a, e.b FROM e{p} e
        JOIN k{r} x ON e.a = x.v JOIN k{r} y ON e.b = y.v
    )"""
        )
    parts.append(
        f"""
    SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS core_deg FROM (
        SELECT a AS v FROM e{rounds} UNION ALL SELECT b FROM e{rounds}
    ) GROUP BY 1 HAVING count(*) >= {k}
    """
    )
    return "".join(parts)


@query("q_kcore_dedup", _kcore_sql())
def q_kcore_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the MinHash-LSH candidate graph: the nodes of DENSE
    duplicate communities with their in-core degree. Real near-dup
    clusters triangulate, so their members survive the peel; collision
    noise (stars, chains) loses its leaves in round one and its hubs
    soon after — the graph-shape complement to q_triangle_cohesion.
    Four synchronous peel rounds (fixpoint by round 3 at both driver
    sfs, asserted in tests/test_graph_ops.py with a round-5 equality
    check); each round is one map-side-combined degree agg + two
    semi-joins, state localCheckpointed (lineage cut per round)."""
    from vectorflow_spark.operators.dedup import minhash_candidate_pairs
    from vectorflow_spark.operators.graph import kcore_peel

    docs = _t(spark, sf_dir, "documents", split=True)
    pairs = minhash_candidate_pairs(docs).select("a", "b")
    out = kcore_peel(pairs, k=3, rounds=4)
    return out.select(F.col("node").alias("doc_id"), "core_deg")


@query(
    "q_tfidf_cosine_pairs",
    """
    WITH toks AS (
        SELECT doc_id, t.term
        FROM documents,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS t(term)
    ),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
        SELECT tf.doc_id, tf.term,
               CAST(ROUND(tf.tf * (ln((1 + n.n_docs) / (1.0 + df.df)) + 1), 9) AS DECIMAL(18,9)) AS w
        FROM tf JOIN df USING (term) CROSS JOIN n
        WHERE df.df <= 100
    ),
    norms AS (SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS norm FROM w GROUP BY 1),
    dots AS (
        SELECT wa.doc_id AS a, wb.doc_id AS b, sum(wa.w * wb.w) AS dot
        FROM w wa JOIN w wb ON wa.term = wb.term AND wa.doc_id < wb.doc_id
        GROUP BY 1, 2
    )
    SELECT a, b, cos_sim FROM (
        SELECT d.a, d.b, round(CAST(d.dot AS DOUBLE) / (na.norm * nb.norm), 9) AS cos_sim
        FROM dots d JOIN norms na ON d.a = na.doc_id JOIN norms nb ON d.b = nb.doc_id
    )
    WHERE cos_sim >= 0.3
    """,
)
def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-weighted near-dup pairs: exact TF-IDF cosine in the df-capped
    term space (operators/textstats.tfidf_cosine_pairs). The middle tier
    of the similarity ladder — n-gram Jaccard sees surface overlap,
    embedding cosine sees model semantics, TF-IDF cosine sees shared
    DISTINCTIVE vocabulary with no model. The df <= 100 cut (Bayardo
    all-pairs) is both the quality prior (high-df terms carry the least
    IDF) and the scale bound (every posting list joins <= cap^2 pairs).
    Dot products and norm squares are DECIMAL sums of exact
    DECIMAL(36,18) products — order-invariant where a double fold would
    hash-differ — and each pair pays one sqrt+division in double. On
    the driver corpus the surviving pairs are the exact-dup clusters
    (mutated near-dups share only high-df vocabulary here); fractional
    cosines are pinned by unit tests on a constructed corpus."""
    from vectorflow_spark.operators.textstats import tfidf_cosine_pairs

    docs = _t(spark, sf_dir, "documents", split=True)
    return tfidf_cosine_pairs(docs, threshold=0.3, df_cap=100)
