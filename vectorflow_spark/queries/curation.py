"""Training-data curation: repetition, rule filters, PII, decontamination, sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import _t, query
from vectorflow_spark.queries.similarity import _DUCK_COS
from vectorflow_spark.queries.dedup import _SIMHASH_SQL, _minhash_sig_sql


# ---------------------------------------------------------------------------
# Training-data curation operators (round 2): repetition, rule filters,
# PII scrub, corpus shape, decontamination, domain mixing, weighted
# sampling, markdown extraction
# ---------------------------------------------------------------------------

_DUCK_TOKENS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"


@query(
    "q_repetition_scores",
    f"""
    WITH base AS (
        SELECT doc_id,
               list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                           l -> l != '') AS ls,
               {_DUCK_TOKENS} AS ts
        FROM documents
    ),
    g AS (
        SELECT doc_id, ls,
               CASE WHEN len(ts) < 2 THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])
               END AS gs
        FROM base
    )
    SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CASE WHEN len(ls) > 0
                THEN 1.0 - len(list_distinct(ls)) / CAST(len(ls) AS DOUBLE)
                ELSE 0.0 END AS dup_line_ratio,
           CAST(CASE WHEN len(ls) = 0 THEN 0
                     ELSE list_max(list_transform(list_distinct(ls),
                                                  d -> len(list_filter(ls, l -> l = d))))
                END AS BIGINT) AS top_line_count,
           CASE WHEN len(gs) > 0
                THEN 1.0 - len(list_distinct(gs)) / CAST(len(gs) AS DOUBLE)
                ELSE 0.0 END AS dup_2gram_ratio
    FROM g
    """,
)
def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (dup-line ratio, top line count,
    dup word-2gram ratio) as one shuffle-free projection."""
    from vectorflow_spark.operators.textstats import repetition_scores

    return repetition_scores(_t(spark, sf_dir, "documents", split=True))


@query(
    "q_gopher_quality",
    f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKENS} AS ts FROM documents),
    f AS (
        SELECT doc_id,
               CAST(len(ts) AS BIGINT) AS n_words,
               CASE WHEN len(ts) > 0
                    THEN round(CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
                               / len(ts), 9) END AS mean_word_len,
               CASE WHEN len(ts) > 0
                    THEN round(len(list_filter(ts, t -> regexp_matches(t, '[a-z]')))
                               / CAST(len(ts) AS DOUBLE), 9) END AS alpha_word_ratio
        FROM base
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_ratio,
           coalesce(n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND alpha_word_ratio >= 0.8, false) AS keep
    FROM f
    """,
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filter (word-count bounds, mean-word-length
    band, alpha-word fraction) with per-rule features + keep flag."""
    from vectorflow_spark.operators.textstats import gopher_quality_rules

    return gopher_quality_rules(_t(spark, sf_dir, "documents", split=True))


def _pii_sql() -> str:
    from vectorflow_spark.operators.textstats import PII_EMAIL_RE, PII_LONG_DIGITS_RE

    return f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_LONG_DIGITS_RE}')) AS BIGINT) AS n_digit_runs,
           regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PII_LONG_DIGITS_RE}', '<NUMBER>', 'g') AS scrubbed_text
    FROM documents
    """


@query("q_pii_scrub", _pii_sql())
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-ish regex scrub (emails, long digit runs) with removal counts —
    the cheap first-pass redaction tier of a training pipeline."""
    from vectorflow_spark.operators.textstats import pii_scrub

    return pii_scrub(_t(spark, sf_dir, "documents", split=True))


@query(
    "q_token_histogram",
    f"""
    WITH t AS (
        SELECT CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tokens FROM documents
    )
    SELECT CAST(length(bin(n_tokens)) AS INT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(n_tokens) AS min_tokens,
           max(n_tokens) AS max_tokens
    FROM t WHERE n_tokens > 0
    GROUP BY 1
    """,
)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-shape histogram: docs bucketed by power-of-two token count,
    bucket computed in integer space (binary-string length) so edges are
    engine-exact."""
    from vectorflow_spark.operators.textstats import token_length_histogram

    return token_length_histogram(_t(spark, sf_dir, "documents", split=True))


def _decontaminate_sql(n: int = 8, mod: int = 50) -> str:
    grams = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n))
    return f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS ts FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(ts) - {n - 2}),
                   i -> {grams})) AS shingle
            FROM toks WHERE len(ts) >= {n}
            UNION ALL
            SELECT doc_id, array_to_string(ts, ' ') AS shingle
            FROM toks WHERE len(ts) < {n}
        )
    ),
    b AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {mod} = 0),
    c AS (SELECT doc_id, shingle FROM sh WHERE doc_id % {mod} != 0)
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
    FROM c JOIN b ON c.shingle = b.shingle
    GROUP BY c.doc_id
    """


@query("q_decontaminate", _decontaminate_sql())
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any word 8-gram with
    the benchmark subset (doc_id % 50 == 0 stands in for an eval set) via
    an inverted-index join on shingle hashes — never a crossJoin."""
    from vectorflow_spark.operators.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return decontaminate(corpus, bench, n=8)


@query(
    "q_domain_mix",
    f"""
    WITH t AS (
        SELECT lang, CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tokens FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total_docs FROM t)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           count(*) / CAST(max(tot.total_docs) AS DOUBLE) AS doc_frac
    FROM t, tot
    GROUP BY lang
    """,
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mixing table: per-lang doc and token counts plus the
    corpus fraction — the input to mixture-weight decisions. The corpus
    total rides along as a broadcast 1-row cross join (no driver collect)."""
    from vectorflow_spark.operators.textstats import token_count_ws

    docs = _t(spark, sf_dir, "documents", split=True)
    t = docs.select("lang", token_count_ws("text").alias("n_tokens"))
    tot = t.agg(F.count(F.lit(1)).alias("total_docs"))
    return (
        t.crossJoin(F.broadcast(tot))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.count(F.lit(1)) / F.max("total_docs").cast("double")).alias("doc_frac"),
        )
    )


@query(
    "q_weighted_subsample",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT / 268435456.0
          < least(1.0, n_chars / 2000.0)
    """,
)
def q_weighted_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted subsampling: keep a document with probability
    proportional to a quality proxy (here min(1, n_chars/2000)), using an
    md5-derived per-doc uniform so the SAME rows are kept on every engine,
    every run, every partitioning — reproducible corpus construction, no
    RNG state. Pure pushable predicate.

    Registered as q_weighted_subsample: this gate was silently shadowed for
    two rounds by the later Efraimidis-Spirakis ``q_weighted_sample``
    (same name, curation.py ~line 1480) — the duplicate-name assert in
    queries/_core.py::query now makes that class of loss impossible."""
    docs = _t(spark, sf_dir, "documents")
    uniform = F.expr(
        "conv(substring(md5(CAST(doc_id AS STRING)), 1, 7), 16, 10) / 268435456.0"
    )
    weight = F.least(F.lit(1.0), F.col("n_chars") / 2000.0)
    return docs.filter(uniform < weight).select("doc_id", "lang", "n_chars")


@query(
    "q_markdown_extract",
    r"""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(
                                   regexp_replace(text, '(?s)```[^`]*```', ' ', 'g'),
                                   '`([^`]*)`', '\1', 'g'),
                               '(?m)^#{1,6}[ \t]*', '', 'g'),
                           '!\[[^\]]*\]\([^)]*\)', ' ', 'g'),
                       '\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
                   '[*_]{1,3}([^*_]+)[*_]{1,3}', '\1', 'g'),
               '[ \t]+', ' ', 'g')) AS md_text
    FROM documents
    """,
)
def q_markdown_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 extractor-path parity: markdown syntax stripped, prose kept (the
    reference's extractor service runs llama_index MarkdownReader and joins
    doc texts, src/extract/extract.py:78-88). Pure regexp-chain projection;
    the final whitespace collapse is part of strip_markdown_expr on the
    Spark side and mirrored by the oracle's trim."""
    from vectorflow_spark.sources.readers import strip_markdown_expr

    docs = _t(spark, sf_dir, "documents", split=True)
    return docs.select("doc_id", strip_markdown_expr(F.col("text")).alias("md_text"))


@query(
    "q_udtf_sentences",
    """
    SELECT doc_id,
           CAST(generate_subscripts(parts, 1) - 1 AS INT) AS sent_pos,
           unnest(parts) AS sentence
    FROM (
        SELECT doc_id,
               string_split(regexp_replace(text, '([.!?…]) +', '\\1' || chr(1), 'g'),
                            chr(1)) AS parts
        FROM documents
    )
    """,
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF through SQL LATERAL: every document cross-applied to its
    numbered sentences (operators/chunkers.sentence_split_udtf). The oracle
    reproduces the lookbehind sentence split with the capture-group +
    chr(1) separator trick (RE2 has no lookbehind)."""
    from vectorflow_spark.operators.chunkers import sentence_split_udtf

    spark.udtf.register("split_sentences", sentence_split_udtf())
    _t(spark, sf_dir, "documents", split=True).createOrReplaceTempView("docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, s.sent_pos, s.sentence "
        "FROM docs_udtf d, LATERAL split_sentences(d.text) s"
    )


@query(
    "q_quantize_embeddings",
    """
    WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
               embedding
        FROM embeddings
    ),
    qq AS (
        SELECT vec_id, scale,
               list_transform(embedding, x -> CAST(
                   CASE WHEN scale != 0.0
                        THEN floor(CAST(x AS DOUBLE) / scale + 0.5) ELSE 0 END AS INT)) AS qv,
               embedding
        FROM q
    )
    SELECT vec_id, scale,
           CAST(list_min(qv) AS INT) AS q_min,
           CAST(list_max(qv) AS INT) AS q_max,
           CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT) AS q_l1,
           list_max(list_transform(list_zip(qv, embedding),
                    p -> abs(CAST(p[1] AS DOUBLE) * scale - CAST(p[2] AS DOUBLE)))) AS max_err
    FROM qq
    """,
)
def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column (4x
    smaller ANN shortlists) with per-vector scale and the max
    reconstruction error as the audit metric. Half-up via floor(x+.5) —
    engine round() tie rules differ, floor does not. Pure projection;
    summary stats (not the arrays) are the oracle-compared output."""
    from vectorflow_spark.functions.vector import dequantize_max_err, int8_scale, quantize_int8

    emb = _t(spark, sf_dir, "embeddings", split=True)
    scaled = emb.withColumn("scale", int8_scale("embedding"))
    qq = scaled.withColumn("qv", quantize_int8("embedding", F.col("scale")))
    return qq.select(
        "vec_id",
        "scale",
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
        F.expr("aggregate(qv, CAST(0 AS BIGINT), (a, v) -> a + abs(v))").alias("q_l1"),
        dequantize_max_err("embedding", F.col("qv"), F.col("scale")).alias("max_err"),
    )


@query(
    "q_sequence_pack",
    """
    WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != ''))
                    AS BIGINT) AS n_tokens,
               CAST(doc_id % 64 AS INT) AS pack_group
        FROM documents
    ),
    r AS (
        SELECT doc_id, n_tokens, pack_group,
               CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY pack_group ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS tokens_before
        FROM t
    )
    SELECT doc_id, n_tokens, pack_group, tokens_before,
           CAST(floor(tokens_before / 2048) AS BIGINT) AS pack_id,
           CAST(tokens_before % 2048 AS BIGINT) AS offset_in_pack
    FROM r
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-pretraining sequence packing: concat-then-chunk the token stream
    into 2048-token packs within 64 deterministic hash groups (a global
    running sum would serialize onto one task). Each doc gets its pack id
    and offset; one shuffle on pack_group."""
    from vectorflow_spark.operators.batching import pack_sequences
    from vectorflow_spark.operators.textstats import token_count_ws

    docs = _t(spark, sf_dir, "documents", split=True).select(
        "doc_id", token_count_ws("text").alias("n_tokens")
    )
    return pack_sequences(docs, budget_tokens=2048, n_groups=64)


@query(
    "q_curation_pipeline",
    f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKENS} AS ts FROM documents),
    f AS (
        SELECT doc_id,
               CAST(len(ts) AS BIGINT) AS n_words,
               CASE WHEN len(ts) > 0
                    THEN round(CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
                               / len(ts), 9) END AS mean_word_len,
               CASE WHEN len(ts) > 0
                    THEN round(len(list_filter(ts, t -> regexp_matches(t, '[a-z]')))
                               / CAST(len(ts) AS DOUBLE), 9) END AS alpha_word_ratio
        FROM base
    ),
    kept AS (
        SELECT doc_id, n_words FROM f
        WHERE coalesce(n_words >= 50 AND n_words <= 100000
                       AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                       AND alpha_word_ratio >= 0.8, false)
    ),
    fp AS (
        SELECT d.doc_id, k.n_words,
               md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents d JOIN kept k ON d.doc_id = k.doc_id
    ),
    s AS (SELECT fingerprint, min(doc_id) AS keeper FROM fp GROUP BY fingerprint)
    SELECT fp.doc_id, fp.n_words, fp.fingerprint
    FROM fp JOIN s ON fp.fingerprint = s.fingerprint AND fp.doc_id = s.keeper
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation path a real corpus runs end to end: Gopher
    rule filter -> formatting-robust fingerprint dedup (keep the lowest
    doc id per normalized fingerprint) -> final keeper projection. Each
    stage is an already-verified operator; this query verifies the
    COMPOSITION (filters before dedup, survivor selection on the filtered
    set) hash-exactly against the same chain in SQL."""
    from vectorflow_spark.operators.textstats import fingerprint, gopher_quality_rules

    docs = _t(spark, sf_dir, "documents", split=True)
    kept = gopher_quality_rules(docs).filter(F.col("keep")).select("doc_id", "n_words")
    fp = docs.join(kept, "doc_id").select(
        "doc_id", "n_words", fingerprint("text").alias("fingerprint")
    )
    keepers = (
        fp.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("fingerprint", "doc_id")
    )
    return fp.join(keepers, ["fingerprint", "doc_id"], "left_semi").select(
        "doc_id", "n_words", "fingerprint"
    )



@query(
    "q_curation_funnel",
    f"""
    WITH en AS (
        SELECT doc_id, text FROM documents WHERE lang = 'en' AND doc_id % 50 != 0
    ),
    base AS (SELECT doc_id, {_DUCK_TOKENS} AS ts FROM en),
    f AS (
        SELECT doc_id,
               CAST(len(ts) AS BIGINT) AS n_words,
               CASE WHEN len(ts) > 0
                    THEN round(CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
                               / len(ts), 9) END AS mean_word_len,
               CASE WHEN len(ts) > 0
                    THEN round(len(list_filter(ts, t -> regexp_matches(t, '[a-z]')))
                               / CAST(len(ts) AS DOUBLE), 9) END AS alpha_word_ratio
        FROM base
    ),
    kept AS (
        SELECT doc_id FROM f
        WHERE coalesce(n_words >= 50 AND n_words <= 100000
                       AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                       AND alpha_word_ratio >= 0.8, false)
    ),
    fp AS (
        SELECT d.doc_id,
               md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM en d JOIN kept k ON d.doc_id = k.doc_id
    ),
    keeper AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
    ktoks AS (SELECT b.doc_id, b.ts FROM base b JOIN keeper k ON b.doc_id = k.doc_id),
    csh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(ts) - 6),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
                        || ' ' || ts[i+4] || ' ' || ts[i+5] || ' ' || ts[i+6]
                        || ' ' || ts[i+7])) AS shingle
            FROM ktoks WHERE len(ts) >= 8
            UNION ALL
            SELECT doc_id, array_to_string(ts, ' ') AS shingle FROM ktoks WHERE len(ts) < 8
        )
    ),
    btoks AS (SELECT doc_id, {_DUCK_TOKENS} AS ts FROM documents WHERE doc_id % 50 = 0),
    bsh AS (
        SELECT DISTINCT shingle FROM (
            SELECT unnest(list_transform(range(1, len(ts) - 6),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
                        || ' ' || ts[i+4] || ' ' || ts[i+5] || ' ' || ts[i+6]
                        || ' ' || ts[i+7])) AS shingle
            FROM btoks WHERE len(ts) >= 8
            UNION ALL
            SELECT array_to_string(ts, ' ') AS shingle FROM btoks WHERE len(ts) < 8
        )
    ),
    contaminated AS (SELECT DISTINCT c.doc_id FROM csh c JOIN bsh b ON c.shingle = b.shingle),
    clean AS (SELECT k.doc_id FROM keeper k ANTI JOIN contaminated x ON k.doc_id = x.doc_id)
    SELECT stage, n_surviving FROM (
        SELECT '0_total' AS stage, CAST(count(*) AS BIGINT) AS n_surviving, 0 AS o FROM documents
        UNION ALL SELECT '1_en_nonbench', CAST(count(*) AS BIGINT), 1 FROM en
        UNION ALL SELECT '2_gopher_quality', CAST(count(*) AS BIGINT), 2 FROM kept
        UNION ALL SELECT '3_fingerprint_dedup', CAST(count(*) AS BIGINT), 3 FROM keeper
        UNION ALL SELECT '4_decontaminated', CAST(count(*) AS BIGINT), 4 FROM clean
    ) ORDER BY o
    """,
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FineWeb/C4-shape corpus-curation FUNNEL with per-stage
    survivor counts — the report a data team actually reads before a
    training run: total -> language + eval-holdout removal -> Gopher
    quality -> fingerprint dedup -> benchmark decontamination (word
    8-gram overlap). Every stage is an already-verified operator
    (q_lang_id / q_gopher_quality / q_fingerprint_dedup /
    q_decontaminate); this query verifies the STAGED composition and its
    accounting hash-exactly. Plan: each stage count is a 1-row partial
    agg over the progressively-filtered lineage — five scans of a
    shrinking frame, all map-side combined, and the union is 5 rows."""
    from vectorflow_spark.operators.dedup import decontaminate
    from vectorflow_spark.operators.textstats import fingerprint, gopher_quality_rules

    docs = _t(spark, sf_dir, "documents", split=True)
    en = docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 50 != 0)).select(
        "doc_id", "text"
    )
    # kept/keeper are localCheckpointed: each is referenced by 2-3 of the
    # five union branches, and without the cut the Gopher regex pass ran
    # three times and the fingerprint md5 pass twice inside the single
    # action (r11 optimization: 2.49 -> 1.89 s, 22 AQE stage-jobs -> 12;
    # both frames are doc_id-only survivor lists, tiny at any scale).
    kept = (
        gopher_quality_rules(en).filter(F.col("keep")).select("doc_id").localCheckpoint()
    )
    fp = en.join(kept, "doc_id").select("doc_id", fingerprint("text").alias("fingerprint"))
    keeper = (
        fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id")).select("doc_id").localCheckpoint()
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    contaminated = decontaminate(en.join(keeper, "doc_id"), bench, n=8).select("doc_id")
    clean = keeper.join(contaminated, "doc_id", "left_anti")

    def stage(name: str, frame: DataFrame, order: int) -> DataFrame:
        return frame.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_surviving"),
            F.lit(order).alias("_o"),
        )

    out = (
        stage("0_total", docs, 0)
        .unionByName(stage("1_en_nonbench", en, 1))
        .unionByName(stage("2_gopher_quality", kept, 2))
        .unionByName(stage("3_fingerprint_dedup", keeper, 3))
        .unionByName(stage("4_decontaminated", clean, 4))
    )
    return out.orderBy("_o").drop("_o")


@query(
    "q_simhash_pairs",
    f"""
    WITH fp AS ({_SIMHASH_SQL})
    SELECT l.doc_id AS a, r.doc_id AS b,
           CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
    FROM fp l JOIN fp r ON l.doc_id < r.doc_id
    WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
    """,
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via Hamming-ball banding (4 bands x 8 bits,
    hamming <= 3). EXACT by pigeonhole — any pair within 3 bits agrees on
    at least one band — so the oracle can verify with a direct all-pairs
    hamming check while the Spark plan stays a single uniform-key
    equi-join (never a crossJoin; the oracle's all-pairs form is only
    viable at oracle scale)."""
    from vectorflow_spark.operators.dedup import simhash_candidate_pairs

    return simhash_candidate_pairs(
        _t(spark, sf_dir, "documents", split=True).select("doc_id", "text"),
        n_bands=4,
        max_hamming=3,
    )


@query(
    "q_rare_tokens",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS tok FROM documents),
    freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok),
    per_doc AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN f.freq < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
               CAST(sum(f.freq) AS BIGINT) AS fs
        FROM toks t JOIN freq f ON t.tok = f.tok
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, n_rare,
           round(CAST(n_rare AS DOUBLE) / n_tokens, 9) AS rare_ratio,
           round(CAST(fs AS DOUBLE) / n_tokens, 9) AS mean_token_freq
    FROM per_doc
    """,
)
def q_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram corpus-frequency rarity signals (rare-token ratio, mean
    token frequency) — the quality-scoring slice that needs a corpus pass,
    not just per-row features. Integer sums + one final division keep the
    values bit-stable across engines."""
    from vectorflow_spark.operators.textstats import rare_token_stats

    return rare_token_stats(
        _t(spark, sf_dir, "documents", split=True).select("doc_id", "text"),
        rare_below=3,
    )


def _duck_band_selects(bands: int = 4, num_hashes: int = 16) -> str:
    rows = num_hashes // bands
    return " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS bucket FROM sig".format(
            b=b, cols=", ".join(f"mh_{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )


@query(
    "q_incremental_dedup",
    f"""
    WITH sig AS ({_minhash_sig_sql(16)}),
    bb AS ({_duck_band_selects(4, 16)}),
    corpus AS (SELECT band, bucket FROM bb WHERE doc_id % 2 = 0),
    suspects AS (
        SELECT DISTINCT n.doc_id
        FROM bb n JOIN corpus c ON n.band = c.band AND n.bucket = c.bucket
        WHERE n.doc_id % 2 = 1
    )
    SELECT d.doc_id, length(d.text) AS n_chars
    FROM documents d
    WHERE d.doc_id % 2 = 1
      AND d.doc_id NOT IN (SELECT doc_id FROM suspects)
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: even doc_ids play the persisted corpus
    (its (band,bucket) index computed once), odd doc_ids are the new batch;
    survivors are new docs with no LSH collision against the index. The
    corpus side ships only (band,bucket) keys through the semi-join — at
    100 TB the index is stored bucketed on that key and never reshuffles
    per ingest."""
    from vectorflow_spark.operators.dedup import (
        incremental_dedup,
        lsh_band_buckets,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    corpus_buckets = lsh_band_buckets(minhash_signatures(corpus))
    survivors = incremental_dedup(new, corpus_buckets)
    return survivors.select("doc_id", F.length("text").alias("n_chars"))


# Fixed seed corpus for the demo BPE vocabulary: vocab must NOT depend on the
# input data (that would make tokenization a two-pass op); in production the
# ranks come from the published cl100k_base file instead.
_BPE_SEED = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
    "sphinx of black quartz judge my vow",
] * 4


# Fixed probe strings for the BPE gate: 16 distinct texts chosen to exercise
# merge-heavy pangrams, repeated-piece streaks, single bytes, punctuation
# boundaries, whitespace runs, digits, and multi-byte UTF-8 (em dash, emoji,
# accents). The expected (n_chars, n_bpe_tokens) pairs are AUTHORED constants
# computed once with the pure-Python encoder (functions/bpe.py) under the
# fixed 128-merge _BPE_SEED vocabulary and baked below, so the distributed
# Arrow path is content-verified against them (constants-oracle pattern);
# tests/test_textstats.py re-derives them so an engine change fails loudly.
_BPE_PROBE = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
    "sphinx of black quartz judge my vow",
    "jumps jumps jumps jumps jumps",
    "the the the the the the",
    "a",
    "zzzzzzzzzzzzzzzz",
    "Hello, World! 123",
    "tabs\tand\nnewlines mixed",
    "naive cafe resume \u2014 emoji \U0001f98a and accents \xe9\xe8\xfc",
    "quick-brown_fox.jumps(over){lazy}dog;",
    "    leading and trailing spaces    ",
    "MixedCASE Words And CamelCaseTokens",
    "1234567890 0987654321 42",
    "the quick brown fox the quick brown fox the quick brown fox",
]

# (probe_idx, n_chars, n_bpe_tokens) — authored expected values (see above).
_BPE_EXPECTED: tuple[tuple[int, int, int], ...] = (
    (0, 43, 9), (1, 39, 8), (2, 35, 6), (3, 35, 7),
    (4, 29, 9), (5, 23, 6), (6, 1, 1), (7, 16, 16),
    (8, 17, 17), (9, 23, 21), (10, 43, 50), (11, 37, 32),
    (12, 35, 32), (13, 35, 35), (14, 24, 24), (15, 59, 12),
)

_BPE_SQL = (
    "SELECT d.doc_id, CAST(v.n_chars AS INT) AS n_chars, "
    "CAST(v.n_bpe_tokens AS BIGINT) AS n_bpe_tokens, "
    "round(CAST(v.n_chars AS DOUBLE) / v.n_bpe_tokens, 9) AS chars_per_token "
    "FROM documents d JOIN (VALUES "
    + ", ".join(f"({m}, {c}, {t})" for m, c, t in _BPE_EXPECTED)
    + ") AS v(m, n_chars, n_bpe_tokens) ON d.doc_id % 16 = v.m "
    "WHERE d.doc_id < 64"
)


@query("q_bpe_token_counts", _BPE_SQL)
def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count + chars-per-token compression under a real byte-level
    BPE vocabulary (functions/bpe.py — the tiktoken algorithm; bit-equal to
    tiktoken cl100k_base when given its ranks file, here a deterministic
    128-merge vocab trained on a fixed pangram corpus). The gate tokenizes
    doc_id-derived constant probe strings (sf-independent, doc_id < 64) so
    the greedy merge loop — not SQL-expressible — is content-verified
    against the authored _BPE_EXPECTED counts; real-document token stats
    stay covered by tests/test_textstats.py."""
    from vectorflow_spark.functions.bpe import BPETokenizer, train_ranks
    from vectorflow_spark.operators.textstats import bpe_token_stats

    tok = BPETokenizer(train_ranks(_BPE_SEED, n_merges=128))
    probe = F.element_at(
        F.array(*[F.lit(s) for s in _BPE_PROBE]),
        (F.col("doc_id") % 16 + 1).cast("int"),
    )
    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") < 64)
        .select("doc_id", probe.alias("text"))
    )
    return bpe_token_stats(docs, tok)


_PQ_M, _PQ_DSUB, _PQ_KSUB = 8, 8, 16


def _pq_sqdist_sql(vec: str, cvec: str, s: str) -> str:
    """Squared L2 between 8-dim subspace slices — list_sum folds the same
    left-to-right order as the Spark aggregate()."""
    return (
        f"list_sum(list_transform("
        f"list_zip(list_slice({vec}, {s}*{_PQ_DSUB}+1, {s}*{_PQ_DSUB}+{_PQ_DSUB}),"
        f" list_slice({cvec}, {s}*{_PQ_DSUB}+1, {s}*{_PQ_DSUB}+{_PQ_DSUB})),"
        f" p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
        f" * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    )


def _pq_codes_cte() -> str:
    return f"""
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT {_PQ_KSUB}
    ),
    subs AS (SELECT unnest(range(0, {_PQ_M})) AS s),
    dists AS (
        SELECT e.vec_id, subs.s AS subspace, c.code,
               {_pq_sqdist_sql('e.embedding', 'c.cvec', 'subs.s')} AS d
        FROM embeddings e CROSS JOIN subs CROSS JOIN cents c
    ),
    codes AS (
        SELECT vec_id, subspace, code FROM (
            SELECT vec_id, subspace, code,
                   row_number() OVER (PARTITION BY vec_id, subspace ORDER BY d, code) AS rn
            FROM dists
        ) WHERE rn = 1
    )"""


@query(
    "q_pq_encode",
    f"""
    WITH {_pq_codes_cte()}
    SELECT vec_id, CAST(subspace AS INT) AS subspace, CAST(code AS INT) AS code
    FROM codes
    """,
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode: 64-dim vectors -> 8 one-byte codes (8
    subspaces x 16 deterministic lowest-id centroids). Emitted exploded as
    (vec_id, subspace, code) scalar rows for the hash check. The encode is
    one literal-folded projection — the oracle's cross-join formulation is
    only viable at oracle scale."""
    from vectorflow_spark.operators.similarity import pq_codebooks, pq_encode

    emb = _t(spark, sf_dir, "embeddings", split=True)
    cbs = pq_codebooks(emb, m=_PQ_M, ksub=_PQ_KSUB)
    codes = pq_encode(emb, cbs)
    return codes.select("vec_id", F.posexplode("codes").alias("subspace", "code"))


@query(
    "q_pq_search",
    f"""
    WITH {_pq_codes_cte()},
    dt AS (
        SELECT subs.s AS subspace, c.code,
               CAST(floor({_pq_sqdist_sql('[{ones}]'.format(
                   ones=', '.join(['1.0'] * 64)), 'c.cvec', 'subs.s')} * 1000000000 + 0.5) AS BIGINT) AS qd
        FROM subs CROSS JOIN cents c
    ),
    scored AS (
        SELECT cd.vec_id, sum(dt.qd) AS q
        FROM codes cd JOIN dt ON cd.subspace = dt.subspace AND cd.code = dt.code
        GROUP BY cd.vec_id
    )
    SELECT vec_id, CAST(q AS DOUBLE) / 1000000000 AS adc_dist
    FROM scored ORDER BY adc_dist, vec_id LIMIT 10
    """,
)
def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search: the all-ones query scans CODES only
    (m lookups + an integer fold per row -> TakeOrderedAndProject), never
    the raw vectors — the scan half of the 32x-compressed 100 TB index.
    Distance-table entries are 1e-9-quantized integers so the row score is
    exact integer math, order-independent across engines."""
    from vectorflow_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    emb = _t(spark, sf_dir, "embeddings", split=True)
    cbs = pq_codebooks(emb, m=_PQ_M, ksub=_PQ_KSUB)
    codes = pq_encode(emb, cbs)
    return pq_adc_topk(codes, cbs, [1.0] * 64, k=10)


@query(
    "q_bloom_semi_join",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi join: the fact scan is prefiltered by a literal
    bit array built from the BUILDING customers' keys, so definite-miss
    orders never reach the join exchange; the exact semi join clears the
    false positives, making the result identical to the plain IN — which
    is exactly what the oracle checks. At 100 TB this is the membership
    shape (blocklist / probe set / ingest batch) where shuffling the fact
    side would dominate the job."""
    from vectorflow_spark.operators.bloom import bloom_pruned_semi_join

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return bloom_pruned_semi_join(orders, cust, "o_custkey", "c_custkey")


@query(
    "q_bloom_anti_join",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(o_orderkey) AS BIGINT) AS keysum
    FROM orders
    WHERE o_custkey NOT IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def q_bloom_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned anti join (the incremental-dedup direction: keep rows
    NOT in the batch). No false negatives means bloom-misses are exact
    anti-join rows for free; only bloom-positives pay the join. Output is
    an exact count + keysum digest so the oracle hashes the whole result
    without shipping every row."""
    from vectorflow_spark.operators.bloom import bloom_pruned_anti_join

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    kept = bloom_pruned_anti_join(orders, cust, "o_custkey", "c_custkey")
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("o_orderkey").alias("keysum"),
    )


_IVFPQ_NPROBE = 4


@query(
    "q_ivfpq_search",
    f"""
    WITH cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT {_PQ_KSUB}
    ),
    probe AS (
        SELECT cid FROM (
            SELECT cid,
                   round(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE)))
                         / (sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(64.0)), 9) AS s
            FROM cents
        ) ORDER BY s DESC, cid LIMIT {_IVFPQ_NPROBE}
    ),
    ascored AS (
        SELECT e.vec_id, c.cid,
               {{cos_ec}} AS s
        FROM embeddings e CROSS JOIN cents c
    ),
    best AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
            FROM ascored
        ) WHERE rn = 1
    ),
    cand AS (
        SELECT e.vec_id, e.embedding FROM embeddings e
        JOIN best b ON e.vec_id = b.vec_id
        JOIN probe p ON b.cid = p.cid
    ),
    subs AS (SELECT unnest(range(0, {_PQ_M})) AS s),
    dists AS (
        SELECT e.vec_id, subs.s AS subspace, c.cid AS code,
               {{sq_ec}} AS d
        FROM cand e CROSS JOIN subs CROSS JOIN cents c
    ),
    codes AS (
        SELECT vec_id, subspace, code FROM (
            SELECT vec_id, subspace, code,
                   row_number() OVER (PARTITION BY vec_id, subspace ORDER BY d, code) AS rn
            FROM dists
        ) WHERE rn = 1
    ),
    dt AS (
        SELECT subs.s AS subspace, c.cid AS code,
               CAST(floor({{sq_qc}} * 1000000000 + 0.5) AS BIGINT) AS qd
        FROM subs CROSS JOIN cents c
    ),
    adc AS (
        SELECT cd.vec_id, sum(dt.qd) AS q
        FROM codes cd JOIN dt ON cd.subspace = dt.subspace AND cd.code = dt.code
        GROUP BY cd.vec_id
    )
    SELECT vec_id, CAST(q AS DOUBLE) / 1000000000 AS adc_dist
    FROM adc ORDER BY adc_dist, vec_id LIMIT 10
    """.format(
        cos_ec=_DUCK_COS.format(a="e.embedding", b="c.cvec"),
        sq_ec=_pq_sqdist_sql("e.embedding", "c.cvec", "subs.s"),
        sq_qc=_pq_sqdist_sql("[{}]".format(", ".join(["1.0"] * 64)), "c.cvec", "subs.s"),
    ),
)
def q_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ combined ANN search (the FAISS-IVFPQ shape): coarse-quantize
    to 16 clusters, probe the 4 nearest the all-ones query, ADC-score ONLY
    the probed clusters' one-byte-per-subspace codes. At 100 TB: cluster is
    the partition key (scan prunes to nprobe/C of the index) and the
    scanned payload is 8 bytes/vector instead of 256 — raw vectors are
    never read at search time."""
    from vectorflow_spark.operators.similarity import (
        ivf_centroids,
        ivfpq_search,
        pq_codebooks,
    )

    emb = _t(spark, sf_dir, "embeddings", split=True)
    cents = ivf_centroids(emb, n_centroids=_PQ_KSUB)
    cbs = pq_codebooks(emb, m=_PQ_M, ksub=_PQ_KSUB)
    return ivfpq_search(emb, cents, cbs, [1.0] * 64, k=10, nprobe=_IVFPQ_NPROBE)


@query(
    "q_interval_overlap",
    """
    WITH spans AS (
        SELECT user_id, epoch_ns(ts) // 86400000000000 AS day_id,
               min(epoch_ns(ts)) AS s_start, max(epoch_ns(ts)) AS s_end
        FROM events GROUP BY 1, 2
    ),
    inc AS (
        SELECT event_id, epoch_ns(ts) AS i_start,
               epoch_ns(ts) + 3600000000000 AS i_end
        FROM events WHERE event_type = 'error' AND value >= 18.0
    )
    SELECT i.event_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(count(DISTINCT s.user_id) AS BIGINT) AS n_users
    FROM inc i JOIN spans s
      ON s.s_start <= i.i_end AND i.i_start <= s.s_end
    GROUP BY 1
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap aggregation: per-(user, day) activity spans vs
    1-hour incident windows around high-value error events — computed by
    ORDER STATISTICS, not a pair join
    (operators/events.span_overlap_counts). A 1-hour window over a busy
    day overlaps nearly every active span, so any pair-materializing plan
    (the generic binned interval_overlap_join included, 7.2M pairs at
    sf0.1) is O(incidents x users-per-day) just to produce two counts per
    incident. The counting plan does two sorted-merge rank passes of
    |spans| + |incidents| rows (tie order encoding <= vs <) plus a
    cross-midnight correction join over ~1/24 of the incidents — exact
    integer set identities, hash-identical to the join formulation (its
    equivalence to the binned join is pinned by test; the binned join
    remains the right operator when downstream needs the PAIRS)."""
    from vectorflow_spark.operators.events import span_overlap_counts

    ev = _t(spark, sf_dir, "events")
    spans = ev.groupBy(
        "user_id", F.expr("ts div 86400000000000").alias("day_id")
    ).agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    inc = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") >= 18.0))
        .select(
            "event_id",
            F.col("ts").alias("i_start"),
            (F.col("ts") + F.lit(3_600_000_000_000)).alias("i_end"),
        )
    )
    return span_overlap_counts(spans, inc, 86_400_000_000_000)


def _random_projection_sql(out_dim: int = 16, in_dim: int = 64) -> str:
    from vectorflow_spark.operators.similarity import projection_planes

    scale = repr((3.0 / out_dim) ** 0.5)
    rows = []
    for j, p in enumerate(projection_planes(in_dim, out_dim)):
        consts = "[" + ", ".join(repr(v) for v in p) + "]"
        dot = (
            f"list_sum(list_transform(list_zip(embedding, {consts}),"
            f" x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
        )
        rows.append(f"SELECT vec_id, {j} AS dim_id, round({dot} * {scale}, 9) AS value FROM embeddings")
    return (
        "SELECT vec_id, CAST(dim_id AS INT) AS dim_id, value FROM ("
        + " UNION ALL ".join(rows)
        + ")"
    )


@query("q_random_projection", _random_projection_sql())
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16 dims with a
    deterministic uniform[-1,1] matrix: 4x embedding compression as one
    literal-folded projection. Emitted as scalar (vec_id, dim_id, value)
    rows for engine-to-engine hashing."""
    from vectorflow_spark.operators.similarity import random_projection

    emb = _t(spark, sf_dir, "embeddings", split=True)
    return random_projection(emb, out_dim=16, in_dim=64)


def _zorder_sql(bits: int = 16) -> str:
    terms = []
    for i, c in enumerate(("c0", "c1")):
        terms += [f"((({c} >> {j}) & 1) << {j * 2 + i})" for j in range(bits)]
    z = " | ".join(terms)
    return f"""
    SELECT o_orderkey, {z} AS zval
    FROM (
        SELECT o_orderkey, o_custkey AS c0,
               datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS c1
        FROM orders
    )
    """


@query("q_zorder_key", _zorder_sql())
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order-day): the
    layout key that gives BOTH columns tight per-file min/max ranges when
    the table is range-partitioned and sorted by it (operators/layout.py
    zorder_write) — multi-dimensional pruning for a fact table queried by
    either key. Pure integer bit-interleave, bit-identical across engines."""
    from vectorflow_spark.operators.layout import zvalue

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c0"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))).alias("c1"),
    )
    return o.select("o_orderkey", zvalue(["c0", "c1"], bits=16).alias("zval"))


def _profile_sql() -> str:
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    parts = [
        f"SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM orders"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


@query("q_profile_table", _profile_sql())
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of orders in ONE aggregation pass (Expand +
    map-side-combined multi-distinct) — the stats feed that layout and
    join-strategy decisions read."""
    from vectorflow_spark.operators.rollup import profile_table

    return profile_table(_t(spark, sf_dir, "orders"))


_CMS_SEEDS_CTE = """
    seeds AS (SELECT unnest(range(0, 4)) AS seed),
    cells AS (
        SELECT s.seed AS row_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|' || CAST(s.seed AS VARCHAR)), 1, 7))::BIGINT % 64 AS col_id,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events CROSS JOIN seeds s
        GROUP BY 1, 2
    )"""


@query(
    "q_cms_cells",
    f"""
    WITH {_CMS_SEEDS_CTE}
    SELECT CAST(row_id AS INT) AS row_id, col_id, cnt FROM cells
    """,
)
def q_cms_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build over event user ids (4x64 grid): the shuffle
    carries at most depth*width cell rows per partition after map-side
    combine — sketch-sized, not data-sized — and the result is mergeable
    across any partitioning of the input. Portable md5-substring hashing
    keeps every counter integer-exact across engines."""
    from vectorflow_spark.operators.sketches import cms_build

    ev = _t(spark, sf_dir, "events").select("user_id")
    return cms_build(ev, "user_id", depth=4, width=64)


@query(
    "q_cms_estimate",
    f"""
    WITH {_CMS_SEEDS_CTE},
    users AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS true_n FROM events GROUP BY 1
    ),
    addr AS (
        SELECT u.user_id, s.seed AS row_id,
               ('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '|' || CAST(s.seed AS VARCHAR)), 1, 7))::BIGINT % 64 AS col_id
        FROM users u CROSS JOIN seeds s
    ),
    est AS (
        SELECT a.user_id, min(c.cnt) AS est
        FROM addr a JOIN cells c ON a.row_id = c.row_id AND a.col_id = c.col_id
        GROUP BY 1
    )
    SELECT u.user_id, e.est, u.true_n
    FROM users u JOIN est e ON u.user_id = e.user_id
    """,
)
def q_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates vs ground truth for every user: min over
    the d addressed counters, never an undercount. The sketch side of the
    join is broadcast (d*w rows by construction)."""
    from vectorflow_spark.operators.sketches import cms_build, cms_estimate

    ev = _t(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(ev, "user_id", depth=4, width=64)
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    est = cms_estimate(sketch, users.select("user_id"), "user_id", depth=4, width=64)
    return users.join(est, "user_id").select("user_id", "est", "true_n")


_KMV_SKETCH_CTE = """
    sh AS (
        SELECT source, substring(lower(text), CAST(i AS INT), 5) AS shingle
        FROM (SELECT source, text, unnest(range(1, length(lower(text)) - 3)) AS i
              FROM documents WHERE length(lower(text)) >= 5)
        UNION ALL
        SELECT source, lower(text) AS shingle FROM documents WHERE length(lower(text)) < 5
    ),
    hashed AS (
        SELECT DISTINCT source AS grp,
               ('0x' || substr(md5(shingle || '|kmv'), 1, 7))::BIGINT AS h
        FROM sh
    ),
    ranked AS (
        SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM hashed
    ),
    sk AS (SELECT grp, h FROM ranked WHERE rn <= 128)"""


@query(
    "q_kmv_distinct",
    f"""
    WITH {_KMV_SKETCH_CTE},
    agg AS (SELECT grp, count(*) AS n, max(h) AS hk FROM sk GROUP BY 1),
    exact AS (SELECT grp, CAST(count(*) AS BIGINT) AS exact_distinct FROM hashed GROUP BY 1)
    SELECT a.grp AS source,
           CASE WHEN a.n < 128 THEN CAST(a.n AS DOUBLE)
                ELSE round(127 * 268435456.0 / a.hk, 3) END AS est_distinct,
           e.exact_distinct
    FROM agg a JOIN exact e ON a.grp = e.grp
    """,
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch per source over char-5 shingles, reported
    against the exact distinct-hash count: keep the 128 smallest distinct
    28-bit shingle hashes per source, estimate (k-1) * 2^28 / h_(k). The
    sketch build caps state to k per group per Arrow batch BEFORE the merge
    shuffle (see kmv_sketch), so the exchange is sketch-sized no matter
    how many distinct shingles a source has — the mergeable distinct
    counter for corpus accounting at 100 TB. The exact side here is the
    eval ground truth, same pattern as q_cms_estimate's true_n."""
    from vectorflow_spark.operators.dedup import with_shingles
    from vectorflow_spark.operators.sketches import kmv_distinct_estimate, kmv_hash_expr

    docs = _t(spark, sf_dir, "documents", split=True)
    sh = with_shingles(docs, "source", "text", 5, "char")
    est = kmv_distinct_estimate(sh, "source", "shingle", 128)
    exact = (
        sh.select("source", kmv_hash_expr(F.col("shingle")).alias("h"))
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    return est.join(exact, "source")


@query(
    "q_kmv_overlap",
    f"""
    WITH {_KMV_SKETCH_CTE},
    grps AS (SELECT DISTINCT grp FROM sk),
    u AS (
        SELECT ga, gb, h, count(*) AS hits FROM (
            SELECT a.grp AS ga, b.grp AS gb, a.h
            FROM sk a JOIN grps b ON a.grp < b.grp
            UNION ALL
            SELECT a.grp AS ga, b.grp AS gb, b.h
            FROM grps a JOIN sk b ON a.grp < b.grp
        ) GROUP BY 1, 2, 3
    ),
    rx AS (
        SELECT ga, gb, h, hits,
               row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
        FROM u
    ),
    agg AS (
        SELECT ga, gb, count(*) AS nx, max(h) AS xk,
               sum(CASE WHEN hits = 2 THEN 1 ELSE 0 END) AS n_both
        FROM rx WHERE rn <= 128 GROUP BY 1, 2
    )
    SELECT ga AS grp_a, gb AS grp_b,
           CASE WHEN nx < 128 THEN CAST(n_both AS DOUBLE)
                ELSE round(n_both * 127 * 268435456.0 / (128 * xk), 3) END AS est_common
    FROM agg
    """,
)
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cross-source shingle overlap |A ∩ B| estimated purely from
    KMV sketches (Beyer et al. SIGMOD'07): the k smallest of
    sketch(A) ∪ sketch(B) IS the union's sketch, so the union size and the
    both-members fraction multiply into the intersection — the raw corpus
    is read ONCE to build per-source sketches, and all 190 source pairs are
    scored on kilobytes via a broadcast pair join. This is the 100 TB
    contamination / cross-source-duplication screen: the same answer via a
    direct self-join would shuffle every (source, shingle) row twice.
    approx_count_distinct's HLL cannot do this — Spark never exposes its
    registers for set algebra, which is exactly what KMV keeps."""
    from vectorflow_spark.operators.dedup import with_shingles
    from vectorflow_spark.operators.sketches import kmv_intersection_estimate

    docs = _t(spark, sf_dir, "documents", split=True)
    sh = with_shingles(docs, "source", "text", 5, "char")
    return kmv_intersection_estimate(sh, "source", "shingle", 128)


@query(
    "q_snapshot_diff",
    """
    WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
    n AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 3 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 97 != 0
        UNION ALL
        SELECT o_orderkey + 20000000, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 101 = 5
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_totalprice != n.o_totalprice
                     OR o.o_orderstatus != n.o_orderstatus THEN 'changed'
           END AS change
    FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
          OR o.o_totalprice != n.o_totalprice
          OR o.o_orderstatus != n.o_orderstatus
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between orders and a simulated next ingest (drops
    every 97th key, bumps prices on keys =3 mod 7, re-keys every 101st as
    new rows): one digest-compressed full-outer join classifying
    added/removed/changed; unchanged keys die inside the join. The oracle
    classifies by comparing raw values — digest vs value comparison
    agreeing IS the check that the digest faithfully detects change."""
    from vectorflow_spark.operators.diff import snapshot_diff

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    retained = o.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 3, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    added = o.filter(F.col("o_orderkey") % 101 == 5).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(20_000_000)
    )
    new = retained.unionByName(added)
    return snapshot_diff(o, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"])


@query(
    "q_fuzzy_name_pairs",
    """
    WITH p AS (
        SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk FROM part
    )
    SELECT a.p_name AS a_name, CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    GROUP BY 1, 2
    """,
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage over part names: block on the first token,
    Levenshtein <= 2 within blocks, aggregated to (name, distance) pair
    counts. The blocked self-join is one shuffle on the block key — never
    the all-pairs cross product — and the edit distance is JVM codegen
    shared bit-for-bit with the SQL oracle."""
    from vectorflow_spark.operators.dedup import blocked_edit_pairs

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    pairs = blocked_edit_pairs(
        p, "p_partkey", "p_name", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)), max_dist=2
    )
    return pairs.groupBy(
        F.col("a_name"), F.col("dist").cast("int").alias("dist")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "q_rolling_anomaly",
    """
    WITH q AS (
        SELECT user_id, event_id, epoch_ns(ts) AS ts_n,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS qv
        FROM events
    ),
    stats AS (
        SELECT user_id, event_id, qv,
               count(*) OVER w AS n, sum(qv) OVER w AS s, sum(qv * qv) OVER w AS ss
        FROM q
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_n, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, qv AS qvalue,
           ((qv * n - s) * (qv * n - s) > 9 * (n * ss - s * s)) AND n >= 10 AS is_anomaly
    FROM stats
    """,
)
def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score anomaly flags over a 20-event trailing
    window, evaluated in exact integer space — the division- and sqrt-free
    form (x*n - s)^2 > z^2 (n*ss - s^2) cannot flip on engine fold-order
    noise, which float stddev thresholds do. One shuffle on user_id."""
    from vectorflow_spark.operators.rollup import rolling_zscore_flags

    ev = _t(spark, sf_dir, "events")
    return rolling_zscore_flags(ev)




@query(
    "q_c4_filters",
    """
    WITH S AS (
        SELECT doc_id,
            concat_ws(chr(10),
                text,
                'This is a good sentence number ' || doc_id || '.',
                'Short line.',
                'A javascript line never survives cleaning here.',
                CASE WHEN doc_id % 7 = 0 THEN 'curly { brace page'
                     ELSE 'No brace here today.' END,
                CASE WHEN doc_id % 11 = 0 THEN 'lorem ipsum filler'
                     ELSE 'Real content line indeed!' END,
                CASE WHEN doc_id % 13 = 0 THEN 'Buy viagra now please.'
                     ELSE 'Nothing to block here.' END,
                repeat('Another sentence here. ', CAST(doc_id % 6 AS INT))
            ) AS text
        FROM documents),
    L AS (
        SELECT doc_id, text,
            -- array_to_string([]) is NULL in DuckDB, '' in Spark: coalesce
            COALESCE(array_to_string(
                list_filter(
                    list_transform(string_split(text, chr(10)), l -> trim(l)),
                    l -> regexp_matches(l, '[.!?"\u201d]$')
                         AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 3
                         AND NOT contains(lower(l), 'javascript')
                ), chr(10)), '') AS clean_text
        FROM S)
    SELECT doc_id, clean_text,
        CAST(len(regexp_extract_all(clean_text, '[.!?]')) AS BIGINT) AS n_sentences,
        (len(regexp_extract_all(clean_text, '[.!?]')) >= 5
         AND NOT contains(text, '{')
         AND NOT contains(lower(text), 'lorem ipsum')
         AND NOT regexp_matches(lower(text), '\\b(porn|xxx|viagra|sex cam)\\b')
        ) AS keep_page
    FROM L
    """,
)
def q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning pass (Raffel et al. 2020) engine-vs-engine: line
    retention (terminal punctuation + >=3 words + no javascript, over
    trimmed lines), then the page rules (>=5 sentences post-clean, curly
    brace, lorem ipsum, blocklist words). The synthetic documents carry no
    newlines or terminal punctuation, so each doc is SALTED (identically
    in both engines) with lines that exercise every branch: a kept
    sentence, a too-short line, a javascript line, rotating curly-brace /
    lorem-ipsum / blocklist pages, and a doc_id-varied sentence count
    around the >=5 threshold. Both engines rebuild the cleaned text
    VERBATIM, so the hash match covers the exact per-line decisions, not
    just aggregate counts. Pure expressions — the 100-TB plan is a free
    rider on the scan projection."""
    from vectorflow_spark.operators.lines import c4_clean

    docs = _t(spark, sf_dir, "documents", split=True)
    salted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(F.lit("This is a good sentence number "), F.col("doc_id"), F.lit(".")),
            F.lit("Short line."),
            F.lit("A javascript line never survives cleaning here."),
            F.when(F.col("doc_id") % 7 == 0, "curly { brace page").otherwise(
                "No brace here today."
            ),
            F.when(F.col("doc_id") % 11 == 0, "lorem ipsum filler").otherwise(
                "Real content line indeed!"
            ),
            F.when(F.col("doc_id") % 13 == 0, "Buy viagra now please.").otherwise(
                "Nothing to block here."
            ),
            F.expr("repeat('Another sentence here. ', CAST(doc_id % 6 AS INT))"),
        ).alias("text"),
    )
    return c4_clean(salted)


@query(
    "q_weighted_sample",
    """
    WITH pri AS (
        SELECT lang AS stratum, doc_id AS id, n_chars AS weight,
               round(
                 ln(268435456.0 / (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|wsamp'), 1, 7))::BIGINT + 1))
                 / (CAST(n_chars AS DOUBLE) / 1000.0), 9) AS pri
        FROM documents WHERE n_chars > 0
    )
    SELECT stratum, id, weight, pri, rn FROM (
        SELECT stratum, id, weight, pri,
               CAST(row_number() OVER (PARTITION BY stratum ORDER BY pri ASC, id ASC) AS BIGINT) AS rn
        FROM pri
    ) WHERE rn <= 50
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, 50 docs per language,
    weight = document length (operators/sampling.py, Efraimidis-
    Spirakis priority keys): the training-mixture primitive — "k docs
    per domain, favoring longer ones" — reproducible across runs,
    engines, and cluster sizes because the uniform comes from the
    portable content hash, never rand(). The per-stratum top-k compiles
    to partial WindowGroupLimit: each map task forwards at most k rows
    per stratum, so the shuffle is sample-sized at any corpus size.
    Priorities are rounded at 9 BEFORE ranking (the repo's
    transcendental-score parity protocol) with id tiebreak."""
    from vectorflow_spark.operators.sampling import weighted_sample_per_stratum

    docs = _t(spark, sf_dir, "documents", split=True)
    out = weighted_sample_per_stratum(docs, "lang", "doc_id", "n_chars", k=50)
    return out.withColumn("rn", F.col("rn").cast("bigint"))
