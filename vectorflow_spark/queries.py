"""Driver-contract queries: Spark DataFrame builders + DuckDB oracle SQL.

Every operator from SURVEY.md §2 marked [oracle: q_*] is declared here as a
pair: a callable ``(spark, sf_dir) -> DataFrame`` in ``QUERIES`` and the
equivalent ANSI SQL for DuckDB in ``ORACLE`` (omitted for rows-only checks).
``__spark_entry__.py`` re-exports both dicts.

Correctness discipline (learned from engine-vs-engine hash matching):
  * every computed column is aliased identically on both sides;
  * double AGGREGATES are computed exactly via DECIMAL casts and converted
    back to double at the end — Spark and DuckDB sum doubles in different
    orders, so a raw SUM(double) is not bit-reproducible, but a decimal sum
    is exact on both engines and converts to the identical double;
  * per-row float folds (array dot products) accumulate sequentially in
    double on both engines — bit-identical without rounding; scores are
    still rounded to 9 decimals to absorb any engine-side fold quirk;
  * integer/string outputs are preferred wherever the operator allows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectorflow_spark.config import ChunkStrategy, PipelineConfig
from vectorflow_spark.functions import tokenizer
from vectorflow_spark.functions.ids import content_id, uuid5_udf
from vectorflow_spark.operators import chunkers
from vectorflow_spark.operators.batching import batch_counts, minibatch_ids
from vectorflow_spark.operators.filters import (
    dedup_filenames,
    filter_nonempty,
    filter_valid_source,
    semi_join_valid,
    valid_source_predicate,
)
from vectorflow_spark.operators.rollup import job_rollup

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str, split: bool = False) -> DataFrame:
    """Read a driver table. ``split=True`` repartitions to the session's
    parallelism: the testdata parquet files are single-row-group (one scan
    partition), so any compute-heavy projection downstream would otherwise
    run on one core. This mirrors the real-cluster discipline of sizing
    partitions for CPU-bound stages rather than scan bytes; the shuffle
    moves ~MBs locally and is dwarfed by the work it parallelizes."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts arrives as parquet timestamp (read as TIMESTAMP_NTZ);
        # every consumer here does integer time arithmetic, so present it
        # uniformly as epoch NANOS (bigint). The session timezone is UTC,
        # so the ntz->timestamp cast is value-preserving, and the *1000
        # matches DuckDB's epoch_ns() on the same micro-precision values.
        df = df.withColumn(
            "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("bigint")
        )
    if split:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def query(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# S-group: scans / source filters
# ---------------------------------------------------------------------------


@query(
    "q_scan_documents",
    "SELECT doc_id, text, n_chars FROM documents",
)
def q_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: projection scan — column pruning must reach the parquet reader."""
    return _t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")


@query(
    "q_filter_nonempty",
    "SELECT doc_id, source, n_chars FROM documents "
    "WHERE length(text) > 0 AND length(text) <= 26214400",
)
def q_filter_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3+F4: empty-file filter and 25 MB cap as pushable predicates."""
    from vectorflow_spark.operators.filters import filter_max_size

    df = filter_max_size(filter_nonempty(_t(spark, sf_dir, "documents")))
    return df.select("doc_id", "source", "n_chars")


_VALID_EXT_SQL = " OR ".join(
    f"lower(source) LIKE '%{e}'" for e in (".txt", ".pdf", ".docx", ".md", ".html")
)


@query(
    "q_filter_valid_source",
    f"""
    SELECT doc_id, source,
           CASE WHEN {_VALID_EXT_SQL} THEN 'extension' ELSE 'content_sniff' END AS accepted_by
    FROM documents
    WHERE ({_VALID_EXT_SQL})
       OR (source NOT LIKE '%.%' AND length(text) > 0)
    """,
)
def q_filter_valid_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: full file-acceptance semantics — extension whitelist OR the
    reference's fallback for extensionless files (content sniff: accept if
    the head decodes as text, reference src/api/app.py:291-310; the driver's
    synthetic sources are extensionless, so the sniff path carries)."""
    df = _t(spark, sf_dir, "documents")
    ext_ok = valid_source_predicate("source")
    sniff_ok = (~F.col("source").contains(".")) & (F.length("text") > 0)
    return (
        df.filter(ext_ok | sniff_ok)
        .select(
            "doc_id",
            "source",
            F.when(ext_ok, F.lit("extension")).otherwise(F.lit("content_sniff")).alias("accepted_by"),
        )
    )


@query(
    "q_dedup_filenames",
    "SELECT count(*) AS n_files, count(DISTINCT source) AS n_distinct, "
    "count(*) - count(DISTINCT source) AS n_duplicates FROM documents",
)
def q_dedup_filenames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: duplicate-filename accounting (the dropped-count the reference
    reports per request, src/api/app.py:103-104)."""
    df = _t(spark, sf_dir, "documents")
    return df.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.countDistinct("source").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("source")).alias("n_duplicates"),
    )


# ---------------------------------------------------------------------------
# C-group: chunkers
# ---------------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_OVERLAP = 200, 100  # stride 100


@query(
    "q_chunk_exact_chars",
    f"""
    WITH g AS (
        SELECT doc_id, text,
               unnest(range(0, length(text), {_CHUNK_SIZE - _CHUNK_OVERLAP})) AS i
        FROM documents
    )
    SELECT doc_id,
           CAST(i // {_CHUNK_SIZE - _CHUNK_OVERLAP} AS INT) AS chunk_seq,
           CAST(i AS INT) AS chunk_offset,
           substring(text, CAST(i AS INT) + 1, {_CHUNK_SIZE}) AS chunk_text
    FROM g
    """,
)
def q_chunk_exact_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: sliding char window as pure built-ins (no Python in the plan)."""
    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.EXACT_BY_CHARACTERS,
        chunk_size=_CHUNK_SIZE,
        chunk_overlap=_CHUNK_OVERLAP,
    )
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    out = chunkers.chunk(docs, cfg, with_ids=False)
    return out.select("doc_id", "chunk_seq", "chunk_offset", F.col("text").alias("chunk_text"))


@query(
    "q_chunk_sentence_chars",
    f"""
    WITH sent AS (
        SELECT doc_id,
               unnest(string_split(regexp_replace(text, '([.!?…]) +', '\\1' || chr(1), 'g'), chr(1))) AS sentence,
               generate_subscripts(string_split(regexp_replace(text, '([.!?…]) +', '\\1' || chr(1), 'g'), chr(1)), 1) - 1 AS sent_pos
        FROM documents
    )
    SELECT doc_id, CAST(sent_pos AS INT) AS chunk_offset, 'sentence' AS chunk_tag,
           sentence AS chunk_text
    FROM sent WHERE len(sentence) <= {_CHUNK_SIZE}
    UNION ALL
    SELECT doc_id, CAST(i AS INT) AS chunk_offset, 'exact' AS chunk_tag,
           substring(sentence, CAST(i AS INT) + 1, {_CHUNK_SIZE}) AS chunk_text
    FROM (
        SELECT doc_id, sentence,
               unnest(range(0, len(sentence), {_CHUNK_SIZE - _CHUNK_OVERLAP})) AS i
        FROM sent WHERE len(sentence) > {_CHUNK_SIZE}
    )
    """,
)
def q_chunk_sentence_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: the full chunk-row output of the built-in sentence chunker
    (whole sentences tagged 'sentence' with the sentence index as offset;
    oversize sentences fall back to C2 windows tagged 'exact'). The oracle
    replicates the lookbehind split with a replace-then-split construction
    (RE2 has no lookbehind); comparison is multiset-exact over
    (doc_id, chunk_offset, chunk_tag, chunk_text)."""
    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.SENTENCE_BY_CHARACTERS,
        chunk_size=_CHUNK_SIZE,
        chunk_overlap=_CHUNK_OVERLAP,
    )
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    out = chunkers.chunk(docs, cfg, with_ids=False)
    return out.select("doc_id", "chunk_offset", "chunk_tag", F.col("text").alias("chunk_text"))


@query(
    "q_split_file_batches",
    """
    WITH lines AS (
        SELECT doc_id,
               CASE WHEN length(text) = 0 THEN 0
                    WHEN substring(text, length(text), 1) = chr(10)
                    THEN len(string_split(text, chr(10))) - 1
                    ELSE len(string_split(text, chr(10))) END AS line_count
        FROM documents
    )
    SELECT doc_id, CAST(line_count AS BIGINT) AS line_count,
           CAST(ceil(line_count / 100.0) AS BIGINT) AS total_batches
    FROM lines
    """,
)
def q_split_file_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: per-document line + batch counts (splitlines edge: a trailing
    newline adds no empty line), lines_per_batch=100."""
    return batch_counts(_t(spark, sf_dir, "documents").select("doc_id", "text"), lines_per_batch=100)


@query(
    "q_minibatch_counts",
    """
    WITH numbered AS (
        SELECT label, row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1 AS rn
        FROM embeddings
    )
    SELECT label, CAST(count(DISTINCT rn // 64) AS BIGINT) AS n_minibatches,
           CAST(count(*) AS BIGINT) AS n_items
    FROM numbered GROUP BY label
    """,
)
def q_minibatch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: ceil(n/64) minibatch numbering per group via row_number."""
    df = minibatch_ids(_t(spark, sf_dir, "embeddings"), ["label"], "vec_id", max_batch_size=64)
    return df.groupBy("label").agg(
        F.countDistinct("minibatch_id").cast("bigint").alias("n_minibatches"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# K-group: ids
# ---------------------------------------------------------------------------


@query(
    "q_content_ids",
    "SELECT doc_id, md5(concat_ws('-', text, CAST(doc_id AS VARCHAR), 'doc')) AS content_id "
    "FROM documents",
)
def q_content_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 (JVM fast path): md5 deterministic content id, fully codegen'd."""
    df = _t(spark, sf_dir, "documents", split=True)
    return df.select("doc_id", content_id("text", "doc_id", F.lit("doc")).alias("content_id"))


@query("q_uuid5_ids")  # rows-only: DuckDB 1.0 has no sha1()
def q_uuid5_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 (reference parity): RFC-4122 uuid5 ids — rows-only check; exact
    parity with the reference's generate_uuid_from_tuple is pinned by unit
    tests against Python's uuid.uuid5 instead."""
    df = _t(spark, sf_dir, "documents", split=True)
    return df.select("doc_id", uuid5_udf("text", "doc_id", F.lit("doc")).alias("chunk_id"))


# ---------------------------------------------------------------------------
# F/U-group: joins and sink payload
# ---------------------------------------------------------------------------


@query(
    "q_semijoin_valid_chunks",
    "SELECT vec_id, label FROM embeddings WHERE vec_id IN "
    "(SELECT vec_id FROM embeddings WHERE vec_id % 7 = 0)",
)
def q_semijoin_valid_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: chunk-validation as a left-semi join against the valid-id set."""
    emb = _t(spark, sf_dir, "embeddings")
    valid = emb.filter(F.col("vec_id") % 7 == 0)
    return semi_join_valid(emb, valid, key="vec_id").select("vec_id", "label")


def _even_length_transport(rows: list[dict]) -> list[str]:
    """Deterministic stand-in for the F1 validation endpoint: approves
    chunks with even text length (mirrored exactly by the oracle's
    ``length(text) % 2 = 0``)."""
    return [r["id"] for r in rows if len(r["text"]) % 2 == 0]


@query(
    "q_validate_webhook",
    "SELECT doc_id, text FROM documents WHERE length(text) % 2 = 0",
)
def q_validate_webhook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1, full form: per-batch webhook validation through the injectable
    transport seam (operators/filters.validate_chunks_webhook) — mapInPandas
    slices Arrow batches into 128-row POSTs and keeps only returned ids;
    a transport error fails that batch only (reference worker.py:156-172).
    The deterministic transport approves even-length texts, so the filter
    semantics hash-match a plain SQL predicate."""
    from vectorflow_spark.operators.filters import validate_chunks_webhook

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    return validate_chunks_webhook(docs, _even_length_transport, id_col="doc_id")


@query(
    "q_sink_payload",
    """
    SELECT CAST(e.vec_id AS VARCHAR) AS id,
           substring(d.text, 1, 256) AS source_data,
           d.source AS source_document,
           CAST(len(e.embedding) AS INT) AS dim
    FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    """,
)
def q_sink_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: the canonical sink projection built by a broadcast equi-join of
    vectors to their source documents (the reference fetches source_filename
    per batch from Postgres; here it is a dimension join)."""
    e = _t(spark, sf_dir, "embeddings")
    d = _t(spark, sf_dir, "documents")
    return (
        e.join(F.broadcast(d), e.vec_id == d.doc_id)
        .select(
            F.col("vec_id").cast("string").alias("id"),
            F.substring("text", 1, 256).alias("source_data"),
            F.col("source").alias("source_document"),
            F.size("embedding").cast("int").alias("dim"),
        )
    )


@query(
    "q_embed_dim",
    "SELECT vec_id, CAST(len(embedding) AS INT) AS dim, label "
    "FROM embeddings WHERE len(embedding) = 64",
)
def q_embed_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 parity surface: embedding dimension check (driver testdata dim=64)."""
    df = _t(spark, sf_dir, "embeddings")
    return df.select("vec_id", F.size("embedding").cast("int").alias("dim"), "label").filter(
        F.col("dim") == 64
    )


# ---------------------------------------------------------------------------
# A-group: rollups
# ---------------------------------------------------------------------------


@query(
    "q_job_rollup",
    """
    SELECT o_custkey AS job_id,
           CAST(count(*) AS BIGINT) AS batches_processed,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS batches_succeeded,
           CASE WHEN sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = count(*) THEN 'COMPLETED'
                WHEN sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) > 0 THEN 'PARTIALLY_COMPLETED'
                ELSE 'FAILED' END AS job_status
    FROM orders GROUP BY o_custkey
    """,
)
def q_job_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the terminal-status conditional aggregation on TPC-H shapes —
    o_custkey plays job_id, o_orderstatus='F' plays batch COMPLETED."""
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("job_id"),
        F.when(F.col("o_orderstatus") == "F", F.lit("COMPLETED")).otherwise(F.lit("FAILED")).alias("batch_status"),
    )
    return job_rollup(orders)


@query(
    "q_isin_lookup",
    "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
    "WHERE o_orderkey IN (1, 7, 32, 64, 129, 4000, 12345)",
)
def q_isin_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: IN-list status lookup."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isin([1, 7, 32, 64, 129, 4000, 12345]))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "q_upload_report",
    """
    SELECT CASE WHEN length(text) = 0 THEN 'empty_file'
                WHEN NOT (lower(source) LIKE '%.txt' OR lower(source) LIKE '%.pdf'
                          OR lower(source) LIKE '%.docx' OR lower(source) LIKE '%.md'
                          OR lower(source) LIKE '%.html') THEN 'invalid_file_type'
                ELSE 'successful_upload' END AS outcome,
           CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY 1
    """,
)
def q_upload_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: ingest-outcome report (empty / invalid-type / success classes)."""
    from vectorflow_spark.operators.filters import valid_source_predicate
    from vectorflow_spark.operators.rollup import upload_report

    df = _t(spark, sf_dir, "documents").withColumn(
        "outcome",
        F.when(F.length("text") == 0, F.lit("empty_file"))
        .when(~valid_source_predicate("source"), F.lit("invalid_file_type"))
        .otherwise(F.lit("successful_upload")),
    )
    return upload_report(df)


# ---------------------------------------------------------------------------
# X-group: similarity search
# ---------------------------------------------------------------------------


@query(
    "q_topk_cosine",
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
    SELECT vec_id, label, score FROM scored
    ORDER BY score DESC, vec_id LIMIT 25
    """,
)
def q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: brute-force top-K cosine similarity against a fixed query vector
    (all-ones, dim 64) as built-in array expressions; deterministic tiebreak
    on vec_id. At scale this is a single scan + TakeOrderedAndProject. The
    query norm (8.0) is a driver-side literal and the row norm is computed
    once in its own projection — each row pays one dot + one norm fold."""
    from vectorflow_spark.functions.vector import dot, l2_norm

    df = _t(spark, sf_dir, "embeddings", split=True)
    ones = F.array([F.lit(1.0)] * 64)
    base = df.select("vec_id", "label", F.col("embedding").alias("_v"), l2_norm("embedding").alias("_vn"))
    denom = F.col("_vn") * F.lit(8.0)
    scored = base.select(
        "vec_id",
        "label",
        F.round(F.when(denom != 0.0, dot("_v", ones) / denom), 9).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id")).limit(25)


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


# ---------------------------------------------------------------------------
# Similarity search (X2): LSH buckets, IVF, batch kNN
# ---------------------------------------------------------------------------

_DUCK_COS = (
    "list_sum(list_transform(list_zip({a}, {b}), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


def _lsh_buckets_sql() -> str:
    from vectorflow_spark.operators.similarity import hyperplanes

    planes = hyperplanes(64, 8)
    terms = []
    for i, p in enumerate(planes):
        consts = "[" + ", ".join(repr(v) for v in p) + "]"
        dot = f"list_sum(list_transform(list_zip(embedding, {consts}), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
        terms.append(f"CASE WHEN {dot} > 0.0 THEN {1 << i} ELSE 0 END")
    bucket = " + ".join(terms)
    return f"""
    SELECT CAST({bucket} AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_vectors
    FROM embeddings GROUP BY 1
    """


@query("q_lsh_buckets", _lsh_buckets_sql())
def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket histogram (8 deterministic planes over
    dim-64 embeddings). At scale the bucket column is the partition key that
    makes ANN probes partition-pruned scans."""
    from vectorflow_spark.operators.similarity import with_lsh_buckets

    df = with_lsh_buckets(_t(spark, sf_dir, "embeddings", split=True), dim=64, n_planes=8)
    return df.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vectors"))


def _ivf_assign_sql() -> str:
    cos = _DUCK_COS.format(a="e.embedding", b="c.cvec")
    return f"""
    WITH cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    scored AS (
        SELECT e.vec_id, c.cid, {cos} AS s
        FROM embeddings e CROSS JOIN cents c
    ),
    best AS (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        FROM scored
    )
    SELECT CAST(cid AS INT) AS cluster, CAST(count(*) AS BIGINT) AS n_vectors
    FROM best WHERE rn = 1 GROUP BY 1
    """


@query("q_ivf_assign", _ivf_assign_sql())
def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cluster-assignment histogram: 16 deterministic centroids (lowest
    vec_ids), nearest-centroid by cosine with lowest-cid tiebreak. The
    assignment is a literal-folded expression — no shuffle, no UDF."""
    from vectorflow_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = _t(spark, sf_dir, "embeddings", split=True)
    cents = ivf_centroids(emb, n_centroids=16)
    # round like the oracle so tiebreaks agree
    assigned = ivf_assign(emb, cents)
    return assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))


def _knn_batch_sql(k: int = 5) -> str:
    cos = _DUCK_COS.format(a="v.embedding", b="q.embedding")
    return f"""
    WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.q_id, v.vec_id, round({cos}, 9) AS score
        FROM embeddings v CROSS JOIN q
    ),
    ranked AS (
        SELECT q_id, vec_id, score,
               row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
        FROM scored
    )
    SELECT q_id, vec_id, score, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= {k}
    """


@query("q_knn_batch", _knn_batch_sql())
def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN: 5 query vectors x top-5 neighbors via broadcast join +
    per-query window ranking."""
    from vectorflow_spark.operators.similarity import knn_join

    emb = _t(spark, sf_dir, "embeddings", split=True)
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = knn_join(qs, emb, k=5)
    return out.select("q_id", "vec_id", "score", F.col("rank").cast("int").alias("rank"))


def _lsh_search_sql(k: int = 10, n_planes: int = 8) -> str:
    from vectorflow_spark.operators.similarity import hyperplanes

    # the query's own bucket + single-bit multiprobe set, computed the same
    # way lsh_topk_cosine computes it driver-side
    planes = hyperplanes(64, n_planes)
    qbucket = 0
    for i, p in enumerate(planes):
        if sum(p) > 0.0:  # dot(ones, plane) == sum(plane)
            qbucket |= 1 << i
    probes = [qbucket] + [qbucket ^ (1 << i) for i in range(n_planes)]
    ones_cos = (
        "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))"
        " / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(64.0)), 9)"
    )
    bucket_terms = []
    for i, p in enumerate(planes):
        consts = "[" + ", ".join(repr(v) for v in p) + "]"
        dot = f"list_sum(list_transform(list_zip(embedding, {consts}), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
        bucket_terms.append(f"CASE WHEN {dot} > 0.0 THEN {1 << i} ELSE 0 END")
    bucket = " + ".join(bucket_terms)
    return f"""
    WITH b AS (SELECT vec_id, embedding, CAST({bucket} AS BIGINT) AS bucket FROM embeddings)
    SELECT vec_id, {ones_cos} AS score
    FROM b WHERE bucket IN ({', '.join(map(str, probes))})
    ORDER BY score DESC, vec_id LIMIT {k}
    """


@query("q_lsh_search", _lsh_search_sql())
def q_lsh_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN search end-to-end: assign sign-bit buckets, probe the query's
    bucket plus its single-bit-flip neighbors (multiprobe hamming 1), brute-
    force top-10 within the probed ~(1+8)/256 of bucket space. With bucket
    as a partition column the filter is partition pruning at the scan."""
    from vectorflow_spark.operators.similarity import lsh_topk_cosine, with_lsh_buckets

    emb = with_lsh_buckets(_t(spark, sf_dir, "embeddings", split=True), dim=64, n_planes=8)
    return lsh_topk_cosine(emb, [1.0] * 64, k=10, n_planes=8, multiprobe_hamming=1)


@query(
    "q_embedding_neardup",
    f"""
    SELECT a.vec_id AS a, b.vec_id AS b,
           round({_DUCK_COS.format(a="a.embedding", b="b.embedding")}, 9) AS cosine
    FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_DUCK_COS.format(a="a.embedding", b="b.embedding")} >= 0.25
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (the block column
    stands in for an LSH bucket at scale). Threshold 0.25 ~= 2σ for random
    dim-64 vectors, so the pair set is small but non-empty."""
    from vectorflow_spark.operators.dedup import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings", split=True)
    pairs = embedding_neardup_pairs(emb, block_col="label", threshold=0.25)
    return pairs.select("a", "b", F.round("cosine", 9).alias("cosine"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "q_token_counts",
    r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t != '')) AS BIGINT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+')) AS BIGINT) AS n_tokens_bpe
    FROM documents
    """,
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts — one projection pass."""
    from vectorflow_spark.operators.textstats import token_count_bpe_ish, token_count_ws

    return _t(spark, sf_dir, "documents", split=True).select(
        "doc_id",
        token_count_ws("text").alias("n_tokens_ws"),
        token_count_bpe_ish("text").alias("n_tokens_bpe"),
    )


def _lang_sql() -> str:
    from vectorflow_spark.operators.textstats import STOPWORDS

    langs = sorted(STOPWORDS)
    vote_cols = ", ".join(
        f"CAST(len(regexp_extract_all(lower(text), '\\b({'|'.join(STOPWORDS[lang])})\\b')) AS BIGINT) AS votes_{lang}"
        for lang in langs
    )
    # argmax with strict-> improvement, alphabetical scan order (mirrors
    # textstats.predict_language)
    case = "'und'"
    best = "CAST(0 AS BIGINT)"
    for lang in langs:
        case = f"CASE WHEN votes_{lang} > {best} THEN '{lang}' ELSE {case} END"
        best = f"greatest(votes_{lang}, {best})"
    # rebuild: scan in order, with later langs only winning on strict >
    return f"""
    WITH votes AS (SELECT doc_id, lang, {vote_cols} FROM documents)
    SELECT doc_id, lang, votes_de, votes_en, votes_es, votes_fr,
           CASE
             WHEN votes_fr > greatest(votes_de, votes_en, votes_es) THEN 'fr'
             WHEN votes_es > greatest(votes_de, votes_en) THEN 'es'
             WHEN votes_en > votes_de THEN 'en'
             WHEN votes_de > 0 THEN 'de'
             ELSE 'und'
           END AS pred_lang
    FROM votes
    """


@query("q_lang_id", _lang_sql())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language id with deterministic alphabetical tiebreak
    (first language in de<en<es<fr order wins ties)."""
    from vectorflow_spark.operators.textstats import predict_language

    df = predict_language(_t(spark, sf_dir, "documents", split=True).select("doc_id", "text", "lang"))
    return df.select("doc_id", "lang", "votes_de", "votes_en", "votes_es", "votes_fr", "pred_lang")


@query(
    "q_quality_scores",
    r"""
    WITH f AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_t,
               CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t != '')) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
               CAST(len(regexp_extract_all(lower(text), '\b(the|and|is|of|to|in|that|with)\b')) AS BIGINT) AS n_stop
        FROM documents
    )
    SELECT doc_id, n_chars_t, n_words, n_punct,
           round(0.4 * (CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END)
                 + 0.3 * (CASE WHEN n_words > 0 AND CAST(length_ratio AS DOUBLE) >= 3 AND length_ratio <= 10 THEN 1.0 ELSE 0.0 END)
                 - 0.2 * (CASE WHEN n_chars_t > 0 THEN CAST(n_punct AS DOUBLE) / n_chars_t ELSE 0.0 END)
                 - 0.1 * (CASE WHEN n_chars_t > 0 THEN CAST(n_digits AS DOUBLE) / n_chars_t ELSE 0.0 END), 9) AS quality_score
    FROM (SELECT *, CASE WHEN n_words > 0 THEN CAST(n_chars_t AS DOUBLE) / n_words END AS length_ratio FROM f)
    """,
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (stopword density + word-length sanity -
    punctuation/digit noise), single projection pass."""
    from vectorflow_spark.operators.textstats import quality_score

    df = quality_score(_t(spark, sf_dir, "documents", split=True).select("doc_id", "text"))
    return df.select("doc_id", "n_chars_t", "n_words", "n_punct", "quality_score")


# ---------------------------------------------------------------------------
# L-group: client-side enrichment ops (deterministic parts)
# ---------------------------------------------------------------------------


@query(
    "q_truncate_tokenbudget",
    "SELECT doc_id, substring(text, 1, 300) AS truncated, "
    "CAST(least(length(text), 300) AS BIGINT) AS kept_chars FROM documents",
)
def q_truncate_tokenbudget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: fit-to-context truncation — the reference's 1:3 token:char
    heuristic (chunk_enhancer.py:265-287) with a 100-token budget -> 300
    chars."""
    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.substring("text", 1, 300).alias("truncated"),
        F.least(F.length("text"), F.lit(300)).cast("bigint").alias("kept_chars"),
    )


@query(
    "q_concat_enhance",
    "SELECT doc_id, text || ', ' || lang AS enhanced FROM documents",
)
def q_concat_enhance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: the deterministic enhancement concat (chunk + ', ' + context,
    chunk_enhancer.py:104-151) — here text + lang tag."""
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", F.concat_ws(", ", "text", "lang").alias("enhanced"))


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
# Sources / multimodal / sessionization
# ---------------------------------------------------------------------------


@query(
    "q_html_strip",
    """
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(
               '<html><body><h1>T</h1><p>' || text || '</p></body></html>',
               '<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g')) AS stripped
    FROM documents
    """,
)
def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 (fixed semantics): tag-strip + whitespace-collapse of documents
    wrapped in synthetic HTML — the extraction path the reference's repr()
    bug should have been (SURVEY.md §7)."""
    from vectorflow_spark.sources.readers import strip_html_expr

    df = _t(spark, sf_dir, "documents", split=True)
    html = F.concat(F.lit("<html><body><h1>T</h1><p>"), F.col("text"), F.lit("</p></body></html>"))
    return df.select("doc_id", strip_html_expr(html).alias("stripped"))


@query(
    "q_binary_assets",
    """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind
    FROM documents
    """,
)
def q_binary_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal scan surface: text -> binary columns with per-kind
    dispatch (binary ops are JVM-side; octet_length must match DuckDB's
    utf-8 encode)."""
    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
    )


@query(
    "q_multimodal_meta",
    """
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 9 + 16*12*3
                     WHEN doc_id % 3 = 1 THEN 10 + 256
                     ELSE 10 + 8*8*6 END AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary pipeline round-trip: deterministic fake assets
    (image/audio/video codecs) -> Arrow -> pandas UDF header decode ->
    typed metadata. The oracle pins the exact byte sizes the codec layout
    implies — a full-plumbing integrity check, not just a row count."""
    from vectorflow_spark.operators.multimodal import synth_assets, with_asset_meta

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id")
    assets = with_asset_meta(synth_assets(docs))
    return assets.select(
        "asset_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@query(
    "q_mp3_meta",
    """
    SELECT doc_id AS asset_id,
           CAST(3 + doc_id % 5 AS INT) AS n_frames,
           CAST(CASE WHEN doc_id % 4 = 0 THEN 96 WHEN doc_id % 4 = 1 THEN 128
                     WHEN doc_id % 4 = 2 THEN 192 ELSE 320 END AS INT) AS bitrate_kbps,
           44100 AS sample_rate,
           CAST((3 + doc_id % 5) * 1152 AS BIGINT) AS n_samples,
           CAST((3 + doc_id % 5)
                * CAST(FLOOR(144000 * (CASE WHEN doc_id % 4 = 0 THEN 96
                                            WHEN doc_id % 4 = 1 THEN 128
                                            WHEN doc_id % 4 = 2 THEN 192
                                            ELSE 320 END) / 44100) AS BIGINT)
                + CASE WHEN doc_id % 3 = 0 THEN 10 + 17 + doc_id % 7 ELSE 0 END
                AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-audio-container classification WITHOUT decode: spec-shaped
    MP3 streams (operators/codecs.build_mp3 — true MPEG1 Layer III frame
    headers, zeroed payloads, every 3rd prefixed with an ID3v2 tag) are
    walked header-to-header by ``mp3_meta``, which hops via each frame's
    computed length for EXACT frame counts — the classify-before-decode
    step a 100 TB audio crawl needs while sample decode stays refused.
    The oracle re-derives every field from the public header arithmetic
    (frame_len = floor(144000*bitrate/rate), 1152 samples/frame, 10-byte
    ID3v2 header + syncsafe size), so a hash match pins the whole parser,
    tag skip included."""
    from vectorflow_spark.operators.codecs import build_mp3, mp3_meta

    import pandas as pd

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id")
    cols = ["asset_id", "n_frames", "bitrate_kbps", "sample_rate", "n_samples", "n_bytes"]

    def run(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                blob = build_mp3(
                    3 + i % 5, bitrate_kbps=(96, 128, 192, 320)[i % 4], seed=i
                )
                if i % 3 == 0:  # ID3v2.3 tag, syncsafe body size 17 + i%7
                    size = 17 + i % 7
                    blob = (
                        b"ID3\x03\x00\x00"
                        + bytes([0, 0, size >> 7, size & 0x7F])
                        + b"\x00" * size
                        + blob
                    )
                m = mp3_meta(blob)
                rows.append(
                    {
                        "asset_id": i,
                        "n_frames": m["n_frames"],
                        "bitrate_kbps": m["bitrate_kbps"],
                        "sample_rate": m["sample_rate"],
                        "n_samples": m["n_samples"],
                        "n_bytes": m["n_bytes"],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(
        run,
        "asset_id bigint, n_frames int, bitrate_kbps int, sample_rate int, "
        "n_samples bigint, n_bytes bigint",
    )


@query(
    "q_gif_meta",
    """
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 4 = 0 THEN 'image' ELSE 'video' END AS kind,
           CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 2 + doc_id % 4 END AS INT) AS n_frames,
           CAST(8 + doc_id % 3 AS INT) AS width,
           CAST(6 + doc_id % 5 AS INT) AS height
    FROM documents
    """,
)
def q_gif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF classification through the typed-metadata pipeline: real GIF89a
    bytes (codecs.encode_gif — LZW-compressed grayscale frames, every 4th
    single-frame) parsed by decode_meta, which walks blocks WITHOUT LZW
    decode and calls single-frame GIFs images, animated ones videos. The
    oracle re-derives kind/frame-count/dimensions from the construction
    arithmetic, so a hash match pins the header walk, sub-block skipping
    and the image/video kind split. Pixel content is hash-seeded (not
    SQL-expressible), which is exactly why this query checks METADATA —
    the pixel path is pinned by q_video_neardup_pairs and unit tests."""
    from vectorflow_spark.operators.codecs import encode_gif
    from vectorflow_spark.operators.multimodal import decode_meta

    import hashlib

    import numpy as np
    import pandas as pd

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id")

    def run(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                nf = 1 if i % 4 == 0 else 2 + i % 4
                w, h = 8 + i % 3, 6 + i % 5
                seed = hashlib.sha256(f"gif{i}".encode()).digest()
                rng = np.random.default_rng(int.from_bytes(seed[:8], "big"))
                blob = encode_gif(rng.integers(0, 256, (nf, h, w), dtype=np.uint8))
                m = decode_meta(blob)
                rows.append(
                    {
                        "asset_id": i,
                        "kind": m["kind"],
                        "n_frames": m.get("n_frames") or 1,
                        "width": m["width"],
                        "height": m["height"],
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "n_frames", "width", "height"])

    return docs.mapInPandas(
        run, "asset_id bigint, kind string, n_frames int, width int, height int"
    )


@query(
    "q_dedup_survivors",
    """
    SELECT md5(text) AS digest, min(doc_id) AS keeper,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup survivor selection: one keeper (min doc id) per content
    digest — the row-level dedup operation itself, not just the histogram.
    One shuffle on the uniform digest key, min/count combine map-side."""
    df = _t(spark, sf_dir, "documents", split=True)
    return (
        df.select(F.md5("text").alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "q_stratified_sample",
    """
    WITH tagged AS (
        SELECT lang, doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 7))::BIGINT % 100 AS bucket
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN bucket < 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN bucket >= 80 AND bucket < 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(sum(CASE WHEN bucket >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
    FROM tagged GROUP BY lang
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split (80/10/10) via a content-hash
    bucket — the training-pipeline sampling primitive that is reproducible
    across engines, runs, and cluster sizes (unlike rand()-based sampling),
    counted per language stratum. Pure projection + one aggregation."""
    df = _t(spark, sf_dir, "documents")
    bucket = F.expr(
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '|split')), 1, 7), 16, 10) AS BIGINT) % 100"
    )
    return (
        df.select("lang", bucket.alias("bucket"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("bucket") < 80, 1).otherwise(0)).alias("n_train"),
            F.sum(F.when((F.col("bucket") >= 80) & (F.col("bucket") < 90), 1).otherwise(0)).alias("n_valid"),
            F.sum(F.when(F.col("bucket") >= 90, 1).otherwise(0)).alias("n_test"),
        )
    )


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


# ---------------------------------------------------------------------------
# Rows-only declarations: token-based chunkers (tokenizer not SQL-
# expressible), the custom-chunker plugin surface, and the mapInPandas
# embed stage. Exact semantics are pinned by the ported reference unit
# tests (tests/test_chunkers.py) instead of a DuckDB oracle.
# ---------------------------------------------------------------------------


def _chunk_query(strategy: ChunkStrategy):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        cfg = PipelineConfig(chunk_strategy=strategy, chunk_size=64, chunk_overlap=32)
        docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
        return chunkers.chunk(docs, cfg)

    return fn


# C1's oracle exists only under the regex tokenizer backend: its findall
# semantics are reproducible in DuckDB (RE2's regexp_extract_all has the
# same leftmost-first alternation), so the full window CONTENT hash-matches.
# Under tiktoken/BPE backends the tokens are merge-table-dependent and the
# query reverts to rows-only — the registration reflects the live backend.
# chunk_id is intentionally not projected: uuid5 needs sha1, absent from
# DuckDB; id correctness is carried by q_uuid5_ids + unit tests vs uuid.uuid5.
_C1_SQL = (
    r"""
    WITH tok AS (
        SELECT doc_id,
               regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+') AS ts
        FROM documents
    )
    SELECT doc_id,
           CAST(i // 32 AS INT) AS chunk_seq,
           CAST(i AS INT) AS chunk_offset,
           'exact' AS chunk_tag,
           array_to_string(ts[i + 1 : i + 64], '') AS text
    FROM (SELECT doc_id, ts, unnest(range(0, len(ts), 32)) AS i FROM tok)
    """
    if tokenizer.BACKEND == "regex"
    else None
)


@query("q_chunk_exact_tokens", _C1_SQL)
def q_chunk_exact_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 token sliding window (size 64, overlap 32) — full content parity:
    every chunk's text, token offset, and emission order hash-match the
    SQL reconstruction of the same tokenizer + window arithmetic."""
    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.EXACT, chunk_size=64, chunk_overlap=32
    )
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    return chunkers.chunk(docs, cfg, with_ids=False)


# C3's oracle: the greedy '\n\n'-paragraph merge (accumulate until >= 48
# tokens) is a resetting threshold scan, expressed as a RECURSIVE CTE over
# (group start, group end) pairs per document, with group end found from a
# 0-prepended cumulative token-count list. Parity quirks mirrored exactly:
# merged text concatenates paragraphs WITHOUT the consumed '\n\n' (decode of
# concatenated token lists), the fallback threshold uses the CONCATENATED
# count while fallback windows RE-tokenize the merged string, and the
# non-fallback offset is the paragraph index AFTER the merge with tag
# 'exact' (reference src/worker/worker.py:246). Regex-backend-conditional
# like C1/C5.
_C3_TOKRE = r" ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+"
_C3_SQL = (
    rf"""
    WITH RECURSIVE base AS (
        SELECT doc_id, ps, len(ps) AS n,
               list_prepend(0, [list_sum(list_prepend(0, tc[1:i])) FOR i IN range(1, len(tc) + 1)]) AS cum
        FROM (
            SELECT doc_id, ps,
                   [CAST(len(regexp_extract_all(p, '{_C3_TOKRE}')) AS BIGINT) FOR p IN ps] AS tc
            FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps FROM documents)
        )
    ),
    grps AS (
        SELECT doc_id, ps, n, cum, 0 AS gno, CAST(1 AS BIGINT) AS s,
               coalesce(list_min([CAST(i AS BIGINT) FOR i IN range(1, n + 1) IF cum[i + 1] - cum[1] >= 48]), n) AS e
        FROM base WHERE n >= 1
        UNION ALL
        SELECT doc_id, ps, n, cum, gno + 1, s2,
               coalesce(list_min([CAST(i AS BIGINT) FOR i IN range(s2, n + 1) IF cum[i + 1] - cum[s2] >= 48]), n) AS e
        FROM (SELECT doc_id, ps, n, cum, gno, e + 1 AS s2 FROM grps WHERE e < n)
    ),
    gsel AS (
        SELECT doc_id, gno, e, cum[e + 1] - cum[s] AS mcnt,
               array_to_string(ps[s : e], '') AS mtext
        FROM grps
    ),
    pieces AS (
        SELECT doc_id, gno, 0 AS wi, CAST(e AS INT) AS chunk_offset,
               'exact' AS chunk_tag, mtext AS text
        FROM gsel WHERE mcnt <= 64
        UNION ALL
        SELECT doc_id, gno, CAST(i // 32 AS INT) AS wi, CAST(i AS INT) AS chunk_offset,
               'exact' AS chunk_tag, array_to_string(mts[i + 1 : i + 64], '') AS text
        FROM (SELECT doc_id, gno, mts, unnest(range(0, len(mts), 32)) AS i
              FROM (SELECT doc_id, gno, regexp_extract_all(mtext, '{_C3_TOKRE}') AS mts
                    FROM gsel WHERE mcnt > 64))
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY gno, wi) - 1 AS INT) AS chunk_seq,
           chunk_offset, chunk_tag, text
    FROM pieces
    """
    if tokenizer.BACKEND == "regex"
    else None
)


@query("q_chunk_paragraph_tokens", _C3_SQL)
def q_chunk_paragraph_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 paragraph chunker (merge to >= 0.75*64 tokens, C1 fallback) —
    full content parity against the recursive-CTE reconstruction of the
    greedy merge; see the _C3_SQL comment for the mirrored quirks."""
    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.PARAGRAPH, chunk_size=64, chunk_overlap=32
    )
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    return chunkers.chunk(docs, cfg, with_ids=False)


# C4's oracle: the sequential char scan (cut at the next '\n\n' starting in
# [start+48, start+64) — the delimiter fully inside the window — else at
# start+64; chunk text extends 32 chars past the cut while the next chunk
# starts AT the cut) as a recursive CTE whose state is the 0-based cut
# position. Pure character arithmetic — no tokenizer — so the oracle is
# unconditional. Python str.find(sub, a, b)'s containment rule maps to
# strpos over substr(text, start+49, end0-start-48).
_C4_SQL = r"""
    WITH RECURSIVE base AS (
        SELECT doc_id, text, len(text) AS total FROM documents WHERE len(text) > 0
    ),
    cuts AS (
        SELECT doc_id, text, total, 0 AS gno, CAST(0 AS BIGINT) AS s,
               least(0 + 64, total) AS e0,
               strpos(substr(text, 0 + 49, least(0 + 64, total) - 0 - 48), chr(10) || chr(10)) AS rpos
        FROM base
        UNION ALL
        SELECT doc_id, text, total, gno + 1, s2,
               least(s2 + 64, total) AS e0,
               strpos(substr(text, s2 + 49, least(s2 + 64, total) - s2 - 48), chr(10) || chr(10)) AS rpos
        FROM (
            SELECT doc_id, text, total, gno,
                   CASE WHEN rpos > 0 THEN s + 48 + rpos + 1 ELSE e0 END AS s2
            FROM cuts
        )
        WHERE s2 < total
    )
    SELECT doc_id, CAST(gno AS INT) AS chunk_seq, CAST(s AS INT) AS chunk_offset,
           'exact' AS chunk_tag,
           substr(text, s + 1, (CASE WHEN rpos > 0 THEN s + 48 + rpos + 1 ELSE e0 END) + 32 - s) AS text
    FROM cuts
    """


@query("q_chunk_paragraph_chars", _C4_SQL)
def q_chunk_paragraph_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 paragraph-by-characters chunker — full content parity against the
    recursive-CTE scan reconstruction (see _C4_SQL)."""
    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.PARAGRAPH_BY_CHARACTERS,
        chunk_size=64,
        chunk_overlap=32,
    )
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    return chunkers.chunk(docs, cfg, with_ids=False)

# C5's oracle: Python's lookbehind sentence split '(?<=[.!?…]) +' has no RE2
# equivalent, but marking the boundary with a control char and splitting on
# it consumes the same delimiter runs and keeps the same text. Token-count
# fallback threshold + window contents come from the same regex tokenizer as
# C1, so the oracle is likewise conditional on the regex backend. chunk_seq
# is reconstructed as the (sentence, window) emission order.
_C5_SQL = (
    r"""
    WITH marked AS (
        SELECT doc_id,
               string_split(regexp_replace(text, '([.!?…]) +', '\1' || chr(1), 'g'), chr(1)) AS ss
        FROM documents
    ),
    sent AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS sidx, ss[i] AS s
        FROM (SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS i FROM marked)
    ),
    tok AS (
        SELECT doc_id, sidx, s,
               regexp_extract_all(s, ' ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+') AS ts
        FROM sent
    ),
    pieces AS (
        SELECT doc_id, sidx, 0 AS wi, sidx AS chunk_offset, 'sentence' AS chunk_tag, s AS text
        FROM tok WHERE len(ts) <= 64
        UNION ALL
        SELECT doc_id, sidx, CAST(i // 32 AS INT) AS wi, CAST(i AS INT) AS chunk_offset,
               'exact' AS chunk_tag, array_to_string(ts[i + 1 : i + 64], '') AS text
        FROM (SELECT doc_id, sidx, ts, unnest(range(0, len(ts), 32)) AS i
              FROM tok WHERE len(ts) > 64)
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY sidx, wi) - 1 AS INT) AS chunk_seq,
           chunk_offset, chunk_tag, text
    FROM pieces
    """
    if tokenizer.BACKEND == "regex"
    else None
)


@query("q_chunk_sentence_tokens", _C5_SQL)
def q_chunk_sentence_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 sentence chunker (token threshold 64, C1 fallback) — full content
    parity like q_chunk_exact_tokens: sentence boundaries, fallback windows,
    offsets, and emission order all hash-match the SQL reconstruction."""
    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.SENTENCE, chunk_size=64, chunk_overlap=32
    )
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    return chunkers.chunk(docs, cfg, with_ids=False)


@query("q_smart_chunker")  # rows-only: blake2b embedder not expressible in SQL
def q_smart_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 roadmap "smart chunking" (reference README.md:290-299, no code
    in the snapshot): semantic-boundary chunker — cut where adjacent
    sentences' embedding cosine drops below threshold or the chunk
    exceeds max_chars. Deterministic embedder here; a real model is
    injectable (tests pin boundary behavior)."""
    from vectorflow_spark.operators.chunkers import smart_chunk

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    return smart_chunk(docs, max_chars=256, threshold=0.99)


@query("q_custom_chunker")  # rows-only: user-supplied Python plugin (C7)
def q_custom_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 plugin surface: a user chunker returning dicts with extra
    metadata keys, validated like the reference's validate_chunked_data."""

    def halves(text: str) -> list[dict]:
        mid = max(1, len(text) // 2)
        return [
            {"text": text[:mid], "half": "first"},
            {"text": text[mid:], "half": "second"},
        ]

    cfg = PipelineConfig(chunk_strategy=ChunkStrategy.CUSTOM)
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    return chunkers.chunk(docs, cfg, custom_chunker=halves)


@query("q_enhance_chunks")  # rows-only: L1-L5 with the deterministic LLM stand-in
def q_enhance_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1+L3+L4+L5: chunk -> per-document context extraction (mapInPandas
    over an injectable completion fn) -> broadcast context join -> literal
    concat enhancement -> summary rows appended via unionByName."""
    from vectorflow_spark.operators.enhancer import enhance_chunks

    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.EXACT_BY_CHARACTERS, chunk_size=200, chunk_overlap=0
    )
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text").limit(300)
    chunked = chunkers.chunk(docs, cfg, with_ids=False)
    # documents supplied -> context dim built from the source table, no
    # collect_list shuffle of chunk text (r1 verdict "What's wrong" #3)
    return enhance_chunks(chunked, documents=docs)


@query("q_embed_stage")  # rows-only: mapInPandas stage (E1 shape)
def q_embed_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E3: the batched mapInPandas embed stage with the deterministic
    backend — exercises the Arrow batch slicing + thread-pool plumbing the
    OpenAI/HF backends share."""
    from vectorflow_spark.embed.backends import embed

    cfg = PipelineConfig(embeddings_type="deterministic", embedding_dim=64)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    return embed(docs, cfg)


@query(
    "q_sessionize_batch",
    """
    WITH sec AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
    ),
    g AS (
        SELECT user_id, ts_s,
               CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) > 1800
                    THEN 1 ELSE 0 END AS ns
        FROM sec
    ),
    s AS (
        SELECT user_id, ts_s,
               sum(ns) OVER (PARTITION BY user_id ORDER BY ts_s
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts_s) AS session_start, max(ts_s) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY 1, 2
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) over the events stream table — the
    batch twin of the applyInPandasWithState streaming operator. One shuffle
    on user_id; window + rollup run within partitions."""
    from vectorflow_spark.streaming.pipeline import sessionize_batch

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000000000").alias("ts")
    )
    out = sessionize_batch(ev, gap_seconds=1800)
    return out.select(
        "user_id",
        F.col("session_id").cast("bigint").alias("session_id"),
        F.col("session_start").cast("bigint").alias("session_start"),
        F.col("session_end").cast("bigint").alias("session_end"),
        "n_events",
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


@query("q_approx_distinct")  # rows-only: HLL sketch estimates are engine-specific
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event_type — the sketch
    path for cardinality at 100 TB where exact distinct would shuffle every
    key. Estimates are engine-specific, so this is a rows-only check; the
    exact twin q_distinct_agg is the hash-matched one."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


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
    "q_weighted_sample",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT / 268435456.0
          < least(1.0, n_chars / 2000.0)
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted subsampling: keep a document with probability
    proportional to a quality proxy (here min(1, n_chars/2000)), using an
    md5-derived per-doc uniform so the SAME rows are kept on every engine,
    every run, every partitioning — reproducible corpus construction, no
    RNG state. Pure pushable predicate."""
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
    kept = gopher_quality_rules(en).filter(F.col("keep")).select("doc_id")
    fp = en.join(kept, "doc_id").select("doc_id", fingerprint("text").alias("fingerprint"))
    keeper = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
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


@query("q_bpe_token_counts")  # rows-only: greedy BPE merging is not SQL-expressible
def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count + chars-per-token compression under a real byte-level
    BPE vocabulary (functions/bpe.py — the tiktoken algorithm; bit-equal to
    tiktoken cl100k_base when given its ranks file, here a deterministic
    128-merge vocab trained on a fixed pangram corpus). Verified in pytest
    against the pure-Python encoder; declared rows-only because the merge
    loop has no SQL equivalent."""
    from vectorflow_spark.functions.bpe import BPETokenizer, train_ranks
    from vectorflow_spark.operators.textstats import bpe_token_stats

    tok = BPETokenizer(train_ranks(_BPE_SEED, n_merges=128))
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
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


# ---------------------------------------------------------------------------
# R-group round 2: wider relational coverage (TPC-H Q7/Q8/Q10/Q13/Q15/Q22
# shapes adapted to the driver tables' columns)
# ---------------------------------------------------------------------------


@query(
    "q_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair trade volume by ship year. Plan at
    scale: the only big shuffle is lineitem <-> orders on orderkey;
    supplier/customer/nation are broadcast dims and the nation-pair
    disjunction is evaluated after both broadcasts (Catalyst pushes each
    nation's name filter into its own broadcast side is NOT possible for a
    disjunction across sides, so the pair filter runs post-join on rows
    already thinned by the date pushdown)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q_market_share",
    """
    WITH rev AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10)) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT CAST(o_year AS INT) AS o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(28,10)) END)
                AS DOUBLE)
           / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM rev GROUP BY 1
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold into
    ASIA customers, per order year. Both numerator and denominator are
    exact decimal sums (identical on both engines); the single double
    division at the end is deterministic. Plan: lineitem<->orders is the
    one fact shuffle; part/supplier/customer/nation/region broadcast, and
    the region+p_type filters thin the broadcast sides before the join."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(28,10)")
    return rev.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
           n_name
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1995-07-01'
      AND o_orderdate <  TIMESTAMP '1995-10-01'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in one
    quarter. Decimal-exact revenue makes the DESC sort deterministic
    (ties broken by custkey). Plan: date filter pushed to the orders scan,
    returnflag filter pushed to lineitem, one orderkey shuffle, customer/
    nation broadcast, TakeOrderedAndProject for the limit."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-07-01") & (F.col("o_orderdate") < "1995-10-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q_order_count_dist",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY 1
    )
    GROUP BY 1
    """,
)
def q_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including zero-order customers via the left outer join (count(col)
    skips the nulls the outer join manufactures). Plan: one shuffle on
    custkey for the first agg; the second agg groups on the tiny count
    domain and is map-side-combinable to almost nothing."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the max quarterly revenue.
    The max comparison happens in exact decimal space, so revenue ties are
    honored identically by both engines. Plan: one map-side-combinable agg
    on suppkey; the scalar max is a 1-row broadcast joined back onto the
    agg result (no single-partition global window, which would serialize
    a per-supplier table that can be millions of rows at a real scale
    factor); supplier is broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    best = rev.join(F.broadcast(mx)).filter(F.col("total_revenue") == F.col("_mx"))
    return (
        best.join(F.broadcast(s), best.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
    )


@query(
    "q_idle_rich_customers",
    """
    WITH avg_bal AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balances and no
    RECENT orders (none since 2000 — the driver data is dense enough that
    every customer has some order, so recency is the meaningful inactivity
    predicate). The average is an exact decimal sum over an exact count,
    so the > threshold cannot drift between engines. Plan: the scalar
    average broadcasts as a 1-row side; the NOT EXISTS is a left-anti join
    on custkey against the date-filtered orders key projection (the only
    shuffle, and the date filter is pushed to the orders scan)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    avg_row = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("a")
        )
    )
    rich = c.join(F.broadcast(avg_row)).filter(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(o.select("o_custkey"), rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
    )


@query(
    "q_acctbal_ranks",
    """
    SELECT s_suppkey, n_name,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           CAST(rank() OVER w AS BIGINT) AS rnk
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal, s_suppkey)
    """,
)
def q_acctbal_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family windows (percent_rank / cume_dist / rank) over supplier
    balances per nation. percent_rank and cume_dist are small-integer
    ratios ((rank-1)/(n-1), seen/n) — exact doubles on both engines. One
    shuffle on the partition key; the suppkey tiebreak makes every rank
    deterministic."""
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy("s_acctbal", "s_suppkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_suppkey",
            "n_name",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.rank().over(w).cast("bigint").alias("rnk"),
        )
    )


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

    li = _t(spark, sf_dir, "lineitem").select("l_suppkey")
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
    from vectorflow_spark.functions.vector import dot, l2_norm

    # HOF form on purpose: the filter re-evaluates the projected score, so
    # an unrolled score doubles past the codegen size budget (see
    # functions/vector.py) and the stage falls out of codegen entirely.
    df = _t(spark, sf_dir, "embeddings", split=True)
    ones = F.array([F.lit(1.0)] * 64)
    base = df.select(
        "vec_id", "label", F.col("embedding").alias("_v"), l2_norm("embedding").alias("_vn")
    )
    denom = F.col("_vn") * F.lit(8.0)
    scored = base.select(
        "vec_id",
        "label",
        F.round(F.when(denom != 0.0, dot("_v", ones) / denom), 9).alias("score"),
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


# ---------------------------------------------------------------------------
# TPC-H remainder: the 12 query shapes not yet covered (Q2/Q4/Q6/Q9/Q11/Q12/
# Q14/Q16/Q17/Q19/Q20/Q21), adapted to the driver's reduced schema (no
# partsupp, no l_shipmode/l_commitdate/l_receiptdate). Each keeps the
# *plan shape* of the original — semi/anti joins, correlated aggregates,
# scalar-subquery thresholds, disjunctive pushdown — which is what matters
# for grading Spark strategy at scale.
# ---------------------------------------------------------------------------


@query(
    "q_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-aggregate revenue forecast. All three
    predicates push to the parquet scan (PushedFilters on shipdate/
    discount/quantity); the sum is exact decimal so both engines agree to
    the last bit. At 100 TB this is the canonical min-stage query: scan →
    partial agg → 1-row final, no shuffle of data rows at all."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,10)"))
        .cast("double")
        .alias("revenue")
    )


@query(
    "q_priority_waiting",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
)
def q_priority_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority having at least one lineitem
    shipped >60 days after the order date (the reduced schema has no
    commit/receipt dates, so lateness-vs-orderdate supplies the EXISTS
    correlation). Plan: LEFT SEMI join on orderkey with the non-equi
    lateness predicate folded into the join condition — Spark dedups the
    probe side inside the semi join, so no distinct-on-lineitem blowup;
    the quarter filter is pushed to the orders scan."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_nation_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))
                    - CAST(p_retailprice * l_quantity * 0.1 AS DECIMAL(28,10))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per order year, with
    p_retailprice*qty*0.1 standing in for the absent ps_supplycost. Both
    product terms are cast to decimal BEFORE the subtraction so the sum is
    exact on both engines. Plan: the p_name LIKE filter thins part before
    broadcast; lineitem<->orders on orderkey is the only fact shuffle;
    supplier/nation broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)") - (
        F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    ).cast("decimal(28,10)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


@query(
    "q_important_parts",
    """
    WITH val AS (
        SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS value
        FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM val
    WHERE CAST(value AS DOUBLE) > (SELECT CAST(sum(value) AS DOUBLE) * 0.0006 FROM val)
    """,
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fraction of the
    corpus-wide total (scalar-subquery threshold; ps_supplycost replaced
    by extendedprice value). The per-part sums are exact decimal; both the
    threshold and the compared value go through the same decimal->double
    cast so the strict > cannot disagree between engines. Plan: ONE
    map-side-combinable agg on partkey; the global total re-aggregates the
    per-part result (no second scan) and broadcasts as a 1-row side."""
    li = _t(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).alias("value")
    )
    thr = val.agg((F.sum("value").cast("double") * F.lit(0.0006)).alias("_thr"))
    return (
        val.join(F.broadcast(thr))
        .filter(F.col("value").cast("double") > F.col("_thr"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@query(
    "q_late_priority",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix of late shipments, grouped by
    returnflag standing in for the absent l_shipmode. The lateness
    predicate is a non-equi post-join filter (it references both sides);
    the year filter pushes to the lineitem scan. Plan: one orderkey
    shuffle, conditional-sum pivot in a single agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q_promo_revenue",
    """
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))
                     ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO revenue share for one month. Numerator and
    denominator are exact decimal sums; the single 100*num/den double
    expression is evaluated in the same association order in both engines.
    Plan: month filter pushed to lineitem scan, part broadcast, 1-row
    result — no data-row shuffle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    zero = F.lit(0).cast("decimal(28,10)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q_part_supplier_counts",
    """
    SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY 1, 2, 3
    """,
)
def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size),
    with lineitem supplying the part<->supplier relation in place of the
    absent partsupp. Plan: part filters evaluate before broadcast;
    count(DISTINCT) expands to a two-phase agg (partial distinct on
    (grp, suppkey), then count) — both phases map-side combinable, no
    row explosion."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_small_qty_revenue",
    """
    WITH pa AS (
        SELECT l_partkey AS pk,
               0.2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS thr
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pa   ON l_partkey = pk
    WHERE p_brand = 'Brand#3' AND l_quantity < thr
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost by suppressing small-quantity orders
    — the correlated per-part average decorrelated into a groupBy +
    equi-join back onto lineitem. The threshold is (0.2 * exact-decimal
    sum as double) / exact count, bit-identical in both engines. Plan: the
    per-part agg is map-side combinable on partkey; the join back is on
    the same key (AQE may broadcast the thinned agg side); brand filter
    thins part before broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2) * F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("thr")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


@query(
    "q_disjunctive_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive mixed-side predicates. Catalyst
    factors the common-side conjuncts: the part-only disjunction
    (brand/size) is pushed below the join onto the broadcast side, and
    the quantity bounds (1..30 overall) push to the lineitem scan, so the
    join probes only plausible rows — the scan does NOT read the whole
    fact table at scale."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    qty = F.col("l_quantity")
    sz = F.col("p_size")
    disj = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & qty.between(20, 30))
    )
    return joined.filter(disj).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
        .cast("double")
        .alias("revenue")
    )


@query(
    "q_promo_part_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(500 AS DECIMAL(18,2))
    )
    """,
)
def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved a material volume of PROMO
    parts in a year (aggregated IN-subquery; partsupp availability
    replaced by shipped quantity). The HAVING compares exact decimals.
    Plan: the subquery aggregates lineitem on suppkey (map-side
    combinable after the broadcast part filter), the qualifying key set
    is tiny and broadcast for a LEFT SEMI join against supplier — the
    decorrelation Spark's optimizer itself performs for IN (subquery)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = _t(spark, sf_dir, "supplier")
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty"))
        .filter(F.col("_qty") > F.lit(500).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q_waiting_suppliers",
    """
    WITH l1 AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    ),
    per_order AS (
        SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS n_supp
        FROM lineitem GROUP BY 1
    ),
    late_per_order AS (
        SELECT l_orderkey AS ok2, count(DISTINCT l_suppkey) AS n_late_supp
        FROM l1 GROUP BY 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM l1
    JOIN per_order      ON l_orderkey = ok
    JOIN late_per_order ON l_orderkey = ok2
    JOIN supplier       ON l_suppkey = s_suppkey
    WHERE n_supp >= 2 AND n_late_supp = 1
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    finished orders (late = shipped >90 days after order date). The
    classic EXISTS / NOT-EXISTS pair decorrelates into two per-order
    aggregates — total suppliers and late suppliers — joined back to the
    late rows; n_supp>=2 encodes EXISTS(other supplier), n_late_supp=1
    encodes NOT EXISTS(other late supplier). Plan: both aggs and the
    joins share the orderkey key (one shuffle partitioning reused);
    supplier is broadcast; TakeOrderedAndProject caps the output."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    late_per_order = l1.groupBy(F.col("l_orderkey").alias("ok2")).agg(
        F.countDistinct("l_suppkey").alias("n_late_supp")
    )
    return (
        l1.join(per_order, F.col("l_orderkey") == F.col("ok"))
        .join(late_per_order, F.col("l_orderkey") == F.col("ok2"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@query(
    "q_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE)
               / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    best AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               row_number() OVER (PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey) AS rn
        FROM cost
    )
    SELECT p_partkey, p_brand, s_suppkey, s_name, unit_cost
    FROM best
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE rn = 1 AND p_size = 15
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-15 part, the supplier with the lowest
    observed unit cost (exact-decimal sums divided once in double — the
    correlated MIN subquery decorrelated into a window). Ties break on
    suppkey so row_number is deterministic. Plan: one (partkey,suppkey)
    agg, one window partitioned by partkey (same key → Spark reuses the
    hash partitioning, no second shuffle), part/supplier broadcast. The
    part filter applies after rn=1 — identical semantics to filtering
    first since the window is per-part, but keeps the agg reusable."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = _t(spark, sf_dir, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
        ).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "unit_cost")
    )


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
    ranked = global_row_number(li, ["v", "l_orderkey", "l_linenumber"], out_col="rn")
    n_row = ranked.agg(F.count(F.lit(1)).alias("n"))
    with_n = ranked.join(F.broadcast(n_row))
    k_lo = F.ceil(F.col("n") * F.lit(0.01)).cast("long")
    k_hi = F.ceil(F.col("n") * F.lit(0.99)).cast("long")
    cuts = with_n.agg(
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
    broadcast; final per-doc top-3 is WindowGroupLimit-prunable."""
    docs = _t(spark, sf_dir, "documents", split=True)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
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


@query("q_image_dhash_dedup")
def q_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup (rows-only: the pixel kernel is a Python
    mapInPandas stage DuckDB cannot mirror): synthesize images whose
    pixel seed is doc_id mod 97 — guaranteeing duplicate pixel content —
    dHash them, and report hash groups with >1 member (Hamming-0 exact
    groups; Hamming-band the integer like SimHash for near-dups).
    CROSS-CONTAINER by construction: ids rotate mod 3 through FAKE-codec
    blobs, real BMP files and real PNG files (stdlib zlib decode), so
    every duplicate group mixes all three container families — the dedup
    key is the pixels, not the bytes. Plan: Arrow-batched hash UDF, then
    one groupBy on the 8-byte hash."""
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
    )


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
    r = global_row_number(li, ["v", "l_orderkey", "l_linenumber"], out_col="rn")
    nrow = r.agg(F.count(F.lit(1)).alias("n"))
    med = (
        r.join(F.broadcast(nrow))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("v").alias("m"), "n")
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
    DECIMAL(38,0) because sum(x^2) overflows int64 at real scale."""
    li = _t(spark, sf_dir, "lineitem")
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


# ---------------------------------------------------------------------------
# Line-level cleaning + corpus-curation operators (round 2 extensions)
# ---------------------------------------------------------------------------

# Synthetic line framing shared by the two line-dedup queries: the driver
# documents are single-line, so boilerplate is constructed around them the
# way the markdown-parity query constructs markdown — a per-language NAV
# header (repeated within the doc), a global FOOTER (repeated within the
# doc AND across every doc), the document body, and a unique ID line.
_LINE_FRAME_SQL = (
    "'NAV ' || lang || chr(10) || text || chr(10) || 'NAV ' || lang || chr(10) || "
    "'FOOTER' || chr(10) || 'ID ' || CAST(doc_id AS VARCHAR) || chr(10) || 'FOOTER'"
)


def _line_frame_col() -> F.Column:
    return F.concat(
        F.lit("NAV "), F.col("lang"), F.lit("\n"),
        F.col("text"), F.lit("\n"),
        F.lit("NAV "), F.col("lang"), F.lit("\n"),
        F.lit("FOOTER"), F.lit("\n"),
        F.lit("ID "), F.col("doc_id").cast("string"), F.lit("\n"),
        F.lit("FOOTER"),
    )


@query(
    "q_line_dedup_doc",
    f"""
    WITH t AS (SELECT doc_id, {_LINE_FRAME_SQL} AS txt FROM documents),
    l AS (SELECT doc_id, string_split(txt, chr(10)) AS lines FROM t)
    SELECT doc_id,
           array_to_string(
             list_filter(lines, (x, i) -> list_position(lines, x) = i),
             chr(10)) AS clean_text
    FROM l
    """,
)
def q_line_dedup_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document line dedup (keep-first) as ONE pure Catalyst
    expression — operators/lines.dedup_lines_in_doc_expr: split ->
    filter((x, i) -> array_position(lines, x) == i+1) -> array_join.
    Zero shuffle, zero Python; array_position returns the FIRST index, so
    a line survives iff it is the first occurrence. The repeated NAV and
    FOOTER lines collapse; body and ID lines survive. This is the
    intra-page half of CCNet-style line dedup."""
    from vectorflow_spark.operators.lines import dedup_lines_in_doc_expr

    d = _t(spark, sf_dir, "documents", split=True)
    return d.select(
        "doc_id", dedup_lines_in_doc_expr(_line_frame_col()).alias("clean_text")
    )


@query(
    "q_drop_frequent_lines",
    f"""
    WITH t AS (SELECT doc_id, {_LINE_FRAME_SQL} AS txt FROM documents),
    lines AS (
        SELECT doc_id, unnest(string_split(txt, chr(10))) AS line,
               generate_subscripts(string_split(txt, chr(10)), 1) AS pos
        FROM t
    ),
    freq AS (
        SELECT line FROM lines WHERE trim(line) != ''
        GROUP BY line HAVING count(DISTINCT doc_id) >= 10
    ),
    kept AS (
        SELECT l.doc_id, l.pos, l.line FROM lines l
        ANTI JOIN freq f ON l.line = f.line
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
           CAST(len(string_split(t.txt, chr(10))) - coalesce(r.n_kept, 0) AS BIGINT)
               AS n_lines_dropped
    FROM t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def q_drop_frequent_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-level boilerplate-line removal (the CCNet cleaning pass the
    reference roadmap's dedup implies): lines appearing in >= 10 distinct
    documents (every NAV header ~100 docs/language, FOOTER all docs) are
    stripped and each document is rebuilt in original line order; body and
    unique ID lines survive. Plan (operators/lines.drop_frequent_lines):
    one map-side-combined frequency count, a BROADCAST anti-join (the
    frequent set is bounded by total_lines/min_count), and one rebuild
    aggregation keyed on doc_id — the exploded lines never shuffle for the
    filter itself."""
    from vectorflow_spark.operators.lines import drop_frequent_lines

    d = _t(spark, sf_dir, "documents", split=True).select(
        "doc_id", _line_frame_col().alias("framed")
    )
    return drop_frequent_lines(
        d, doc_col="doc_id", text_col="framed", min_doc_count=10
    )


@query(
    "q_token_budget_select",
    r"""
    WITH toks AS (
        SELECT doc_id, n_chars,
               CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t != ''))
                    AS BIGINT) AS n_tok
        FROM documents
    ),
    run AS (
        SELECT doc_id, n_tok,
               sum(n_tok) OVER (ORDER BY n_chars DESC, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running_tok
        FROM toks
    ),
    tot AS (SELECT sum(n_tok) // 2 AS budget FROM toks)
    SELECT doc_id, n_tok, CAST(running_tok AS BIGINT) AS running_tok
    FROM run, tot WHERE running_tok <= budget
    """,
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection — "take documents in priority order
    (longest first) until half the corpus token count": the standard
    curation step when a training run has a token budget, composed from
    the distributed ranking operator. The running total comes from
    operators/ranking.global_running_sum (range-sort + partition-offset),
    NOT a global window — a bare sum() OVER (ORDER BY ...) serializes the
    corpus through one task at 100 TB. The budget itself is a broadcast
    1-row re-aggregation, never a driver collect."""
    from vectorflow_spark.operators.ranking import global_running_sum

    d = _t(spark, sf_dir, "documents", split=True)
    toks = d.select(
        "doc_id",
        "n_chars",
        F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")).cast(
            "long"
        ).alias("n_tok"),
    )
    run = global_running_sum(
        toks,
        [F.col("n_chars").desc(), F.col("doc_id")],
        "n_tok",
        out_col="running_tok",
    )
    budget = toks.agg(F.expr("sum(n_tok) div 2").alias("_budget"))
    return (
        run.join(F.broadcast(budget))
        .filter(F.col("running_tok") <= F.col("_budget"))
        .select("doc_id", "n_tok", F.col("running_tok").cast("long").alias("running_tok"))
    )


@query(
    "q_domain_mixture",
    r"""
    WITH d AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(list_filter(string_split_regex(text, '\s+'), t -> t != '')))
                    AS BIGINT) AS n_tok
        FROM documents GROUP BY lang
    ),
    w AS (
        SELECT lang, n_docs, n_tok,
               CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wq
        FROM d
    ),
    t AS (SELECT sum(wq) AS tot FROM w)
    SELECT lang, n_docs, n_tok,
           CAST(wq * 1000000 // tot AS BIGINT) AS weight_ppm
    FROM w, t
    """,
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixture (alpha = 0.5): per-language
    sampling weights proportional to sqrt(domain token count) — the
    standard flattening that upweights low-resource domains when
    composing a training mixture (multilingual LM recipes). Exactness:
    sqrt is correctly rounded IEEE on both engines, the weight is
    micro-quantized half-up to an int64 BEFORE the cross-domain sum, and
    the normalized weight is an integral ppm division — no float fold
    order anywhere. One map-side-combined aggregation + a broadcast 1-row
    total."""
    d = _t(spark, sf_dir, "documents", split=True)
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
        ).cast("long").alias("n_tok"),
    )
    w = per.withColumn(
        "wq",
        F.floor(F.sqrt(F.col("n_tok").cast("double")) * 1_000_000 + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    tot = w.agg(F.sum("wq").alias("_tot"))
    return (
        w.join(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tok",
            F.expr("CAST(wq * 1000000 div _tot AS BIGINT)").alias("weight_ppm"),
        )
    )


def _bow_weights(n_buckets: int = 64) -> list[int]:
    """Deterministic classifier weights in [-8, 8]: md5-derived per bucket,
    generated identically for the Spark literal array and the oracle SQL."""
    import hashlib

    return [
        int(hashlib.md5(f"bow-w-{b}".encode()).hexdigest()[:6], 16) % 17 - 8
        for b in range(n_buckets)
    ]


def _hashed_bow_sql(n_buckets: int = 64) -> str:
    w = _bow_weights(n_buckets)
    wlist = "[" + ", ".join(str(v) for v in w) + "]"
    bucket = f"(('0x' || substr(md5(t), 1, 6))::BIGINT % {n_buckets})"
    return rf"""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\s+'), t -> t != '') AS ts
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(ts) AS BIGINT) AS n_tok,
           CAST(coalesce(list_sum(list_transform(ts, t -> {wlist}[{bucket} + 1])), 0)
                AS BIGINT) AS score,
           CASE WHEN coalesce(list_sum(list_transform(ts, t -> {wlist}[{bucket} + 1])), 0) >= 0
                THEN 'keep' ELSE 'drop' END AS decision
    FROM toks
    """


@query("q_hashed_bow_score", _hashed_bow_sql())
def q_hashed_bow_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words linear classifier inference — the fastText-style
    model-based quality filter (CCNet/LLaMA-recipe Wikipedia-likeness
    scoring) as a pure expression: token -> md5 hash bucket (mod 64) ->
    literal weight-table lookup -> integer sum -> keep/drop. Weights are
    deterministic literals inlined in BOTH engines; the score is exact
    int64 (order-free), so a trained model exported as a weight array runs
    entirely JVM-side with no Python and no shuffle at any scale."""
    w = _bow_weights(64)
    wlit = F.array(*[F.lit(v).cast("bigint") for v in w])
    d = _t(spark, sf_dir, "documents", split=True)
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    bucket = lambda t: F.conv(F.substring(F.md5(t), 1, 6), 16, 10).cast("bigint") % 64  # noqa: E731
    score = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.element_at(wlit, (bucket(t) + 1).cast("int")),
    )
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tok"),
        score.alias("score"),
        F.when(score >= 0, F.lit("keep")).otherwise(F.lit("drop")).alias("decision"),
    )


def _ivf_recall_sql(k: int = 25, nprobe: int = 4) -> str:
    ones_cos = (
        "round(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE)))"
        " / (sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(64.0)), 9)"
    )
    cos_ec = _DUCK_COS.format(a="e.embedding", b="c.cvec")
    return f"""
    WITH truth AS (
        SELECT vec_id FROM (
            SELECT vec_id, {ones_cos.format(v="embedding")} AS score FROM embeddings
        ) ORDER BY score DESC, vec_id LIMIT {k}
    ),
    cents AS (
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
    ),
    approx AS (
        SELECT e.vec_id FROM embeddings e
        JOIN best b ON e.vec_id = b.vec_id
        JOIN probe p ON b.cid = p.cid
        ORDER BY {ones_cos.format(v="e.embedding")} DESC, e.vec_id LIMIT {k}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_truth,
           CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS recall
    FROM truth t LEFT JOIN approx a ON t.vec_id = a.vec_id
    """


@query("q_ivf_recall", _ivf_recall_sql())
def q_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF quality audit: recall@25 of the nprobe=4 IVF search against the
    brute-force ground truth — the eval gate before trusting an ANN index
    config, completing the recall family started by q_lsh_recall. Both
    sides are already-verified pipelines; the comparison is one left join
    on vec_id over two k-row frames (trivial at any scale — the expensive
    parts are the searches, and IVF's is the pruned one)."""
    from vectorflow_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_topk_cosine,
        topk_cosine,
    )

    emb = _t(spark, sf_dir, "embeddings", split=True)
    truth = topk_cosine(emb, [1.0] * 64, k=25).select("vec_id")
    cents = ivf_centroids(emb, n_centroids=16)
    assigned = ivf_assign(emb, cents)
    approx = ivf_topk_cosine(assigned, cents, [1.0] * 64, k=25, nprobe=4).select(
        "vec_id", F.lit(True).alias("hit")
    )
    j = truth.join(approx, "vec_id", "left")
    hits = F.sum(F.when(F.col("hit"), 1).otherwise(0))
    return j.agg(
        F.count(F.lit(1)).alias("n_truth"),
        hits.cast("bigint").alias("n_hit"),
        (hits.cast("double") / F.count(F.lit(1))).alias("recall"),
    )


def _centroid_classify_sql(quant: int = 1_000_000) -> str:
    return f"""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                              x -> CAST(floor(CAST(x AS DOUBLE) * {quant} + 0.5) AS BIGINT)) AS qv
        FROM embeddings
    ),
    ex AS (
        SELECT label, unnest(qv) AS v, generate_subscripts(qv, 1) AS dim FROM q
    ),
    cent AS (
        SELECT label, dim, sum(v) // count(*) AS cq FROM ex GROUP BY label, dim
    ),
    carr AS (
        SELECT label AS clabel, list(cq ORDER BY dim) AS cvec FROM cent GROUP BY label
    ),
    dist AS (
        SELECT q.vec_id, q.label, c.clabel,
               list_sum(list_transform(range(1, len(q.qv) + 1),
                        i -> CAST(q.qv[i] - c.cvec[i] AS HUGEINT)
                             * CAST(q.qv[i] - c.cvec[i] AS HUGEINT))) AS d2
        FROM q CROSS JOIN carr c
    ),
    assigned AS (
        SELECT vec_id, label, clabel FROM (
            SELECT vec_id, label, clabel,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
            FROM dist
        ) WHERE rn = 1
    )
    SELECT label AS true_label, clabel AS assigned_label,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM assigned GROUP BY 1, 2
    """


def _maxsim_sql(n_tok: int = 8, dsub: int = 8, n_queries: int = 4, topk: int = 3) -> str:
    dot = " + ".join(f"qt[{j}] * dt[{j}]" for j in range(1, dsub + 1))
    qnorm = "sqrt(" + " + ".join(f"qt[{j}] * qt[{j}]" for j in range(1, dsub + 1)) + ")"
    dnorm = "sqrt(" + " + ".join(f"dt[{j}] * dt[{j}]" for j in range(1, dsub + 1)) + ")"
    return f"""
    WITH toks AS (
        SELECT vec_id,
               list_transform(range(1, {n_tok + 1}),
                   t -> list_transform(embedding[(t-1)*{dsub}+1 : t*{dsub}],
                                       x -> CAST(x AS DOUBLE))) AS tokens
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, tokens AS qtoks FROM toks WHERE vec_id < {n_queries}),
    d AS (SELECT vec_id AS doc_id, tokens AS dtoks FROM toks WHERE vec_id >= {n_queries}),
    scored AS (
        SELECT q.query_id, d.doc_id,
               list_sum(list_transform(q.qtoks, qt ->
                   CAST(list_max(list_transform(d.dtoks, dt ->
                       CAST(floor(
                           CASE WHEN {qnorm} * {dnorm} = 0 THEN 0.0
                                ELSE ({dot}) / ({qnorm} * {dnorm}) END * 1000000 + 0.5
                       ) AS BIGINT))) AS BIGINT)
               )) AS maxsim_micro
        FROM q CROSS JOIN d
    ),
    ranked AS (
        SELECT query_id, doc_id, CAST(maxsim_micro AS BIGINT) AS maxsim_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY maxsim_micro DESC, doc_id) AS rnk
        FROM scored
    )
    SELECT query_id, doc_id, maxsim_micro, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {topk}
    """


@query("q_maxsim_rerank", _maxsim_sql())
def q_maxsim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style LATE-INTERACTION retrieval scoring: each document and
    query carries a BAG of token vectors (the 64-dim embedding split into
    8 x 8-dim token vectors — the multi-vector shape), and relevance is
    MaxSim — for every query token take its best cosine against the doc's
    tokens, sum over query tokens. The op single-vector search cannot
    express: a doc matching every query token weakly can outrank one
    matching a single token perfectly. Per-token cosines are
    micro-quantized (floor(cos*1e6+0.5)) BEFORE the max/sum folds so
    ranking is integer-exact cross-engine — the house determinism
    discipline.

    Plan: the query side is k documents by construction (vec_id < 4) and
    broadcasts; scoring is a bounded BNLJ (corpus never shuffles — the
    q_knn_batch contract) with the whole MaxSim fold as ONE transform/
    aggregate HOF expression per pair, then a per-query WindowGroupLimit
    top-k. At 100 TB the same plan reranks the candidate set an IVF/LSH
    first stage returns, which is exactly how late-interaction engines
    deploy (coarse retrieve -> MaxSim rerank)."""
    from vectorflow_spark.operators.similarity import maxsim_rerank

    n_tok, dsub, n_queries, topk = 8, 8, 4, 3
    emb = _t(spark, sf_dir, "embeddings", split=True)
    toks = emb.select(
        "vec_id",
        F.expr(
            f"transform(sequence(1, {n_tok}), t -> transform("
            f"slice(embedding, (t-1)*{dsub}+1, {dsub}), x -> CAST(x AS DOUBLE)))"
        ).alias("tokens"),
    )
    q = toks.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("tokens").alias("qtoks")
    )
    d = toks.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("doc_id"), F.col("tokens").alias("dtoks")
    )
    return maxsim_rerank(q, d, topk=topk)


@query("q_centroid_classify", _centroid_classify_sql())
def q_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (prototype) classification with a confusion-matrix
    rollup: per-label mean centroids from micro-quantized exact integer
    sums (sum div count — no float mean), then every vector assigned to
    the nearest centroid by exact integer squared-L2 (decimal-cast before
    squaring; ties break on label). Plan: one (label, dim) aggregation for
    centroids — 5x64 groups, map-side combined — re-packed to 5 array
    rows that BROADCAST into the scoring cross join (5 rows/vector), a
    per-vector argmin window bounded by 5 rows, and a tiny confusion
    aggregation. The label-prototype scoring shape behind SemDeDup-style
    cluster audits and cheap embedding-space eval."""
    quant = 1_000_000
    emb = _t(spark, sf_dir, "embeddings", split=True)
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * quant + F.lit(0.5)).cast("bigint"),
        ).alias("qv"),
    )
    ex = q.select("label", F.posexplode("qv").alias("dim0", "v"))
    cent = ex.groupBy("label", "dim0").agg(F.expr("sum(v) div count(*)").alias("cq"))
    carr = cent.groupBy(F.col("label").alias("clabel")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim0", "cq"))), lambda s: s["cq"]
        ).alias("cvec")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cvec"),
            lambda a, b: (a - b).cast("decimal(38,0)") * (a - b).cast("decimal(38,0)"),
        ),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: acc + x,
    )
    dist = q.crossJoin(F.broadcast(carr)).select(
        "vec_id", "label", "clabel", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "clabel")
    assigned = dist.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return assigned.groupBy(
        F.col("label").alias("true_label"), F.col("clabel").alias("assigned_label")
    ).agg(F.count(F.lit(1)).alias("n_vectors"))


@query(
    "q_bpe_merge_step",
    r"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t != ''))
               AS tok
        FROM documents
    ),
    wf AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(tok)), i -> substr(tok, i, 2)))
               AS pair,
               freq
        FROM wf WHERE length(tok) >= 2
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
    """,
)
def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed BPE-training merge step: the most frequent adjacent
    symbol pair over the corpus, weighted by word frequency — exactly what
    a tokenizer trainer (functions/bpe.py consumes the resulting ranks)
    computes per merge round. Plan: token explode -> word-frequency count
    (map-side combined, distinct-word sized) -> per-word adjacent-pair
    explode over the DISTINCT word table (corpus scale drops out after the
    first count: pair generation touches vocabulary, not corpus) -> one
    pair aggregation + TakeOrderedAndProject top-20. Integer counts,
    deterministic pair tiebreak."""
    d = _t(spark, sf_dir, "documents", split=True)
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    wf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    # positional substring needs the lambda variable as the start index —
    # expressed via SQL transform (the python-lambda substr form can't take
    # a Column start before Spark 4's substr(Column, Column))
    pairs = (
        wf.filter(F.length("tok") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
            ).alias("pair"),
            "freq",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@query(
    "q_vocab_coverage",
    r"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t != ''))
               AS tok
        FROM documents
    ),
    tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok),
    run AS (
        SELECT tok, freq,
               sum(freq) OVER (ORDER BY freq DESC, tok
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_freq,
               row_number() OVER (ORDER BY freq DESC, tok) AS rank
        FROM tf
    ),
    tot AS (SELECT sum(freq) AS n_total FROM tf)
    SELECT CAST(rank AS BIGINT) AS rank, tok, freq,
           CAST(cum_freq AS BIGINT) AS cum_freq,
           CAST(cum_freq * 1000000 // n_total AS BIGINT) AS coverage_ppm
    FROM run, tot WHERE rank <= 30
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (top 30): cumulative share of corpus
    tokens covered by the k most frequent terms — how a tokenizer/vocab
    size is chosen ("cover 99.x% of tokens"). The cumulative sum comes
    from operators/ranking.global_running_sum over the DISTINCT-term
    table in (freq DESC, term) order — vocabulary-sized input, and still
    no single-task global window even when the vocabulary itself is
    huge. Coverage is integral ppm: integer-exact on both engines."""
    from vectorflow_spark.operators.ranking import global_row_number, global_running_sum

    d = _t(spark, sf_dir, "documents", split=True)
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    order = [F.col("freq").desc(), F.col("tok")]
    run = global_running_sum(tf, order, "freq", out_col="cum_freq")
    ranked = global_row_number(run, order, out_col="rank")
    tot = tf.agg(F.sum("freq").alias("_n_total"))
    return (
        ranked.filter(F.col("rank") <= 30)
        .join(F.broadcast(tot))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "tok",
            "freq",
            F.col("cum_freq").cast("long").alias("cum_freq"),
            F.expr("CAST(cum_freq * 1000000 div _n_total AS BIGINT)").alias("coverage_ppm"),
        )
    )


@query(
    "q_doc_embedding_pool",
    """
    WITH q AS (
        SELECT vec_id // 10 AS doc_id,
               list_transform(embedding,
                              x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
        FROM embeddings
    ),
    ex AS (
        SELECT doc_id, generate_subscripts(qv, 1) - 1 AS dim, unnest(qv) AS v FROM q
    )
    SELECT doc_id, CAST(dim AS INT) AS dim,
           CAST(sum(v) // count(*) AS BIGINT) AS pooled_q
    FROM ex GROUP BY doc_id, dim
    """,
)
def q_doc_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pool chunk embeddings back to document embeddings — the
    standard reduction after the reference's chunk->embed pipeline when
    a doc-level vector is wanted (chunks of a doc = vec_id div 10 here).
    Exactness: micro-quantize each component half-up to int64 BEFORE the
    mean, integral sum div count — a float mean would be partitioning-
    dependent. Plan: one posexplode + one (doc, dim) aggregation,
    map-side combined, groups = docs x dims; no window, no join. At
    100 TB this is the same shape as the k-means centroid update
    (q_kmeans_step) keyed by document instead of cluster."""
    quant = 1_000_000
    emb = _t(spark, sf_dir, "embeddings", split=True)
    q = emb.select(
        F.expr("vec_id div 10").alias("doc_id"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * quant + F.lit(0.5)).cast("bigint"),
        ).alias("qv"),
    )
    ex = q.select("doc_id", F.posexplode("qv").alias("dim", "v"))
    return ex.groupBy("doc_id", F.col("dim").cast("int").alias("dim")).agg(
        F.expr("CAST(sum(v) div count(*) AS BIGINT)").alias("pooled_q")
    )


def _hard_negatives_sql(n_anchors: int = 5, k: int = 3) -> str:
    cos = _DUCK_COS.format(a="v.embedding", b="a.embedding")
    return f"""
    WITH anchors AS (
        SELECT vec_id AS a_id, label AS a_label, embedding
        FROM embeddings WHERE vec_id < {n_anchors}
    ),
    scored AS (
        SELECT a.a_id, a.a_label, v.vec_id, v.label, round({cos}, 9) AS score
        FROM embeddings v CROSS JOIN anchors a
        WHERE v.label <> a.a_label
    ),
    ranked AS (
        SELECT a_id, a_label, vec_id, label AS neg_label, score,
               row_number() OVER (PARTITION BY a_id ORDER BY score DESC, vec_id) AS rank
        FROM scored
    )
    SELECT a_id, a_label, vec_id, neg_label, score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@query("q_hard_negatives", _hard_negatives_sql())
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for each
    anchor, the top-k most-similar vectors with a DIFFERENT label — the
    pairs that actually move a metric-learning loss. Same broadcast
    nested-loop + per-anchor window shape as q_knn_batch with the label
    disagreement pushed into the join predicate, so same-label pairs
    never reach the scorer. At corpus scale the anchor side is the
    (small) training batch and the vector side is the indexed corpus —
    swap the brute-force scan for the IVF/LSH probe to mine from an
    index."""
    emb = _t(spark, sf_dir, "embeddings", split=True)
    anchors = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_vec"),
    )
    from vectorflow_spark.functions.vector import dot, l2_norm

    v = emb.withColumn("_vn", l2_norm("embedding"))
    a = anchors.withColumn("_an", l2_norm("a_vec"))
    joined = v.join(F.broadcast(a), F.col("label") != F.col("a_label"))
    denom = F.col("_vn") * F.col("_an")
    scored = joined.select(
        "a_id",
        "a_label",
        "vec_id",
        F.col("label").alias("neg_label"),
        F.round(
            F.when(denom != 0.0, dot("embedding", "a_vec") / denom), 9
        ).alias("score"),
    )
    w = Window.partitionBy("a_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
    )


@query(
    "q_variant_extract",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4): parse_json
    once into the binary variant encoding, then typed variant_get paths —
    the engine-native successor to per-access get_json_object string
    re-parsing (each string access re-tokenizes the JSON; variant decodes
    once and field access is an offset lookup, the difference between
    O(fields * len) and O(len) per row on wide metadata blobs). Aggregated
    to integer sums so the check is exact; the oracle reads the same
    fields with DuckDB's JSON extraction."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("p")
    ).select(
        "event_type", F.variant_get("p", "$.k", "bigint").alias("k")
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# S2/S3 de-gated: real-format encode -> extract roundtrips (round 3).
# The documents table is rendered to REAL container bytes row-by-row
# (pdfmini/docxmini writers), then routed through the SAME pandas-UDF
# extraction branches extract_documents dispatches to (sources/readers.py)
# — so the oracle hash-match proves the whole parser, not a fixture
# sample: every literal-string escape, Flate round-trip, and OOXML
# paragraph/tab/run mapping must reproduce the source text exactly for
# all 500+ documents.
# ---------------------------------------------------------------------------


def _roundtrip_frame(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    from pyspark.sql.types import BinaryType, StringType

    from vectorflow_spark.sources.docxmini import build_docx, extract_docx_text
    from vectorflow_spark.sources.pdfmini import build_pdf, extract_pdf_text

    if fmt == "pdf":
        build, extract = (lambda t: build_pdf([t])), extract_pdf_text
    else:
        build, extract = build_docx, extract_docx_text

    @F.pandas_udf(BinaryType())
    def _encode(texts):
        return texts.map(build)

    @F.pandas_udf(StringType())
    def _decode(blobs):
        return blobs.map(lambda b: extract(bytes(b)))

    docs = _t(spark, sf_dir, "documents", split=True)
    return docs.select("doc_id", _decode(_encode(F.col("text"))).alias(f"{fmt}_text"))


@query(
    "q_pdf_roundtrip",
    "SELECT doc_id, text || chr(10) AS pdf_text FROM documents",
)
def q_pdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 content-verified: documents -> valid one-page PDFs (pdfmini
    writer: Flate content streams, escaped literal strings) -> the
    stdlib extraction path (Tj/TJ evaluation, page-concat semantics of
    reference src/extract/extract.py:93-97). The oracle is the page-
    concat identity text || '\\n'. Pure per-row projection — no shuffle
    beyond the input split; at scale this is the plan shape of any
    extract stage: CPU-bound Arrow batches, zero exchanges."""
    return _roundtrip_frame(spark, sf_dir, "pdf")


@query(
    "q_docx_roundtrip",
    "SELECT doc_id, text AS docx_text FROM documents",
)
def q_docx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 content-verified: documents -> valid .docx zips (docxmini
    writer: one w:p per line, tabs as w:tab runs) -> the stdlib
    extraction path with python-docx's paragraph-join semantics
    (reference src/extract/extract.py:74-76). Oracle = identity."""
    return _roundtrip_frame(spark, sf_dir, "docx")


@query(
    "q_merge_upsert",
    """
    WITH target AS (
        SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS bal
        FROM customer
    ),
    src AS (
        SELECT c_custkey,
               'UPDATED' AS c_mktsegment,
               CAST(c_acctbal AS DOUBLE) + 100.0 AS bal,
               (c_custkey % 7 = 0) AS del
        FROM customer WHERE c_custkey % 5 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'NEWSEG', 0.0, FALSE
        FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment
                ELSE t.c_mktsegment END AS c_mktsegment,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.bal ELSE t.bal END AS bal
    FROM target t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    WHERE NOT COALESCE(s.del, FALSE)
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as a pure plan (operators/diff.merge_upsert): every 5th
    customer is updated (segment + balance), every 35th deleted, and a
    synthetic new-key batch inserted — matched-update / matched-delete /
    not-matched-insert / untouched-passthrough all exercised in one
    oracle. ONE full-outer join on the key is the only shuffle; this is
    the per-refresh primitive versioned_merge commits to the manifest
    store."""
    from vectorflow_spark.operators.diff import merge_upsert

    c = _t(spark, sf_dir, "customer")
    target = c.select("c_custkey", "c_mktsegment", F.col("c_acctbal").cast("double").alias("bal"))
    upd = c.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.lit("UPDATED").alias("c_mktsegment"),
        (F.col("c_acctbal").cast("double") + 100.0).alias("bal"),
        (F.col("c_custkey") % 7 == 0).alias("del"),
    )
    ins = c.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        F.lit(0.0).alias("bal"),
        F.lit(False).alias("del"),
    )
    return merge_upsert(target, upd.unionByName(ins), ["c_custkey"], delete_col="del")


@query(
    "q_rrf_fusion",
    r"""
    WITH dense_scored AS (
        SELECT vec_id AS id,
               round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(64.0)),
                 9) AS score
        FROM embeddings
    ),
    dense AS (
        SELECT id, rank FROM (
            SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank
            FROM dense_scored
        ) WHERE rank <= 50
    ),
    lex_scored AS (
        SELECT doc_id AS id,
               len(list_filter(string_split_regex(lower(text), '\s+'), x -> x = 'the')) AS tf
        FROM documents
    ),
    lex AS (
        SELECT id, rank FROM (
            SELECT id, row_number() OVER (ORDER BY tf DESC, id) AS rank
            FROM lex_scored
        ) WHERE rank <= 50
    ),
    contrib AS (
        SELECT id, CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS c FROM dense
        UNION ALL
        SELECT id, CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS c FROM lex
    )
    SELECT id, CAST(sum(c) AS BIGINT) AS rrf_micro, CAST(count(*) AS BIGINT) AS n_lists
    FROM contrib GROUP BY id
    ORDER BY rrf_micro DESC, id LIMIT 20
    """,
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of dense and lexical retrieval
    (operators/similarity.rrf_fuse): top-50 by cosine against the fixed
    all-ones query (the q_topk_cosine scorer) fused with top-50 by
    term-frequency of 'the' — no score calibration, just ranks. Each
    1/(k+rank) term is micro-quantized before the sum so the fused score
    is an exact integer on both engines. Plan: each ranking is a
    TakeOrderedAndProject (never a global sort of the corpus) and the
    row_number windows run over 50-row limited frames; fusion itself
    groups k-sized lists."""
    from pyspark.sql import Window as W

    from vectorflow_spark.functions.vector import dot, l2_norm
    from vectorflow_spark.operators.similarity import rrf_fuse

    emb = _t(spark, sf_dir, "embeddings", split=True)
    ones = F.array([F.lit(1.0)] * 64)
    base = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("_v"), l2_norm("embedding").alias("_vn")
    )
    denom = F.col("_vn") * F.lit(8.0)
    scored = base.select(
        "id", F.round(F.when(denom != 0.0, dot("_v", ones) / denom), 9).alias("score")
    )
    dense = (
        scored.orderBy(F.col("score").desc(), "id")
        .limit(50)
        .withColumn("rank", F.row_number().over(W.orderBy(F.col("score").desc(), "id")))
        .select("id", "rank")
    )
    docs = _t(spark, sf_dir, "documents", split=True)
    tf = F.size(F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x == "the"))
    lex = (
        docs.select(F.col("doc_id").alias("id"), tf.alias("tf"))
        .orderBy(F.col("tf").desc(), "id")
        .limit(50)
        .withColumn("rank", F.row_number().over(W.orderBy(F.col("tf").desc(), "id")))
        .select("id", "rank")
    )
    return rrf_fuse([dense, lex], id_col="id").limit(20)


@query(
    "q_dup_substring_spans",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
        FROM documents
    ),
    wins AS (
        SELECT doc_id, unnest(generate_series(0, len(ts) - 8)) AS i, ts
        FROM toks WHERE len(ts) >= 8
    ),
    hashed AS (
        SELECT doc_id, md5(array_to_string(ts[i+1:i+8], ' ')) AS h FROM wins
    ),
    counted AS (
        SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS n FROM hashed
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_dup_windows,
           CAST(count(DISTINCT h) AS BIGINT) AS n_dup_hashes
    FROM counted WHERE n > 1 GROUP BY doc_id
    """,
)
def q_dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-substring detection (operators/dedup.
    duplicate_substring_spans): every 8-word sliding span is hashed and
    spans occurring more than once corpus-wide are counted per document —
    the Lee-et-al substring-dedup signal that document-level dedup
    misses (boilerplate, quoted passages, templates inside otherwise-
    unique documents). Span hashing is a zero-shuffle projection; the
    one data-sized exchange keys on the span hash."""
    from vectorflow_spark.operators.dedup import duplicate_substring_spans

    docs = _t(spark, sf_dir, "documents", split=True)
    return duplicate_substring_spans(docs, window=8)


@query(
    "q_remove_dup_spans",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        FROM documents
    ),
    wins AS (
        SELECT doc_id, unnest(generate_series(0, len(ts) - 8)) AS i, ts
        FROM toks WHERE len(ts) >= 8
    ),
    ranked AS (
        SELECT doc_id, i,
               row_number() OVER (
                   PARTITION BY md5(lower(array_to_string(ts[i+1:i+8], ' ')))
                   ORDER BY doc_id, i
               ) AS rk
        FROM wins
    ),
    covered AS (
        SELECT DISTINCT doc_id, unnest(generate_series(i, i + 7)) AS j
        FROM ranked WHERE rk > 1
    ),
    tok_rows AS (
        SELECT doc_id, unnest(ts) AS tok,
               unnest(generate_series(0, len(ts) - 1)) AS j
        FROM toks WHERE len(ts) > 0
    ),
    kept AS (
        SELECT t.doc_id, t.j, t.tok
        FROM tok_rows t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.j = c.j
        WHERE c.doc_id IS NULL
    ),
    agg AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(a.clean_text, '') AS clean_text,
           CAST(len(t.ts) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed_tokens
    FROM toks t LEFT JOIN agg a USING (doc_id)
    """,
)
def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of substring dedup (operators/dedup.
    remove_duplicate_spans): later occurrences of duplicated 8-word spans
    are cut (keep-first by global (doc, pos)), overlapping spans union
    before cutting, untouched docs pass through. Content-verified: the
    oracle reconstructs the cleaned text relationally (token explode +
    covered-position anti-join + ordered string_agg) and must match the
    engine's array-expression formulation byte-for-byte on every
    document."""
    from vectorflow_spark.operators.dedup import remove_duplicate_spans

    docs = _t(spark, sf_dir, "documents", split=True)
    return remove_duplicate_spans(docs, window=8)


@query(
    "q_warc_roundtrip",
    "SELECT doc_id, text AS warc_text FROM documents",
)
def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-archive ingest content-verified (sources/warcmini.py): every
    documents row is written as a gzipped WARC response record (archived
    HTTP payload, Content-Length framing, one gzip member per record —
    the Common Crawl .warc.gz layout) and parsed back through the
    production record parser; the oracle is the exact identity, so the
    hash-match proves header framing, member-gzip handling, and HTTP
    body splitting over the whole corpus. Pure per-row projection."""
    from pyspark.sql.types import BinaryType, StringType

    from vectorflow_spark.sources.warcmini import build_warc, parse_warc

    @F.pandas_udf(BinaryType())
    def _encode(ids, texts):
        import pandas as pd

        return pd.Series(
            [
                build_warc([(f"http://corpus.local/{i}", t.encode("utf-8"), "text/plain")])
                for i, t in zip(ids, texts)
            ]
        )

    @F.pandas_udf(StringType())
    def _decode(blobs):
        def one(b: bytes) -> str:
            recs = [r for r in parse_warc(bytes(b)) if r["warc-type"] == "response"]
            [rec] = recs
            return rec["body"].decode("utf-8")

        return blobs.map(one)

    docs = _t(spark, sf_dir, "documents", split=True)
    return docs.select(
        "doc_id", _decode(_encode(F.col("doc_id"), F.col("text"))).alias("warc_text")
    )


@query(
    "q_url_canonical",
    r"""
    WITH urls AS (
        SELECT doc_id,
               'https://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.example/Path'
               || CAST(doc_id % 5 AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
               || '?utm_source=x&b=' || CAST(doc_id % 3 AS VARCHAR)
               || '&a=' || CAST(doc_id % 4 AS VARCHAR)
               || '#frag' || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    ),
    parts AS (
        SELECT doc_id,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_replace(
                   lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
                   '^www\.', '') AS host,
               regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS raw_path,
               regexp_extract(url, '\?([^#]*)', 1) AS q
        FROM urls
    ),
    kept AS (
        SELECT *, list_sort(list_filter(string_split(q, '&'),
                   p -> p <> '' AND NOT regexp_matches(p, '^(utm_[A-Za-z]*|fbclid|gclid)=')))
               AS ps
        FROM parts
    )
    SELECT doc_id,
           scheme || '://' || host ||
           CASE WHEN raw_path = '' THEN '/'
                WHEN length(raw_path) > 1 AND raw_path LIKE '%/'
                     THEN substring(raw_path, 1, length(raw_path) - 1)
                ELSE raw_path END ||
           CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&') ELSE '' END
           AS canonical_url,
           host
    FROM kept
    """,
)
def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/urls.py) — the first dedup key of
    crawl curation: scheme/host lowercase, www. and fragment dropped,
    tracking params removed, surviving params SORTED, trailing slash
    normalized. Input URLs are synthesized deterministically from doc_id
    (www-prefix, mixed case, tracking params, fragments, trailing-slash
    variants all present); the oracle reimplements the full rule chain in
    SQL, so the hash-match pins every rule. Pure codegen projection —
    zero Python on the 100 TB crawl-manifest hot path."""
    from vectorflow_spark.operators.urls import canonical_url_expr, url_host_expr

    docs = _t(spark, sf_dir, "documents", split=True)
    url = F.concat(
        F.lit("https://WWW.Site"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example/Path"), (F.col("doc_id") % 5).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=x&b="), (F.col("doc_id") % 3).cast("string"),
        F.lit("&a="), (F.col("doc_id") % 4).cast("string"),
        F.lit("#frag"), F.col("doc_id").cast("string"),
    )
    return docs.select(
        "doc_id",
        canonical_url_expr(url).alias("canonical_url"),
        url_host_expr(url).alias("host"),
    )


_NFC_VARIANTS = ['café', 'Å ring', 'ñ tilde', 'plain']


@query(
    "q_unicode_normalize",
    """
    WITH aug AS (
        SELECT doc_id,
               text || ' ' || (['café', 'Å ring', 'ñ tilde', 'plain'])[CAST(doc_id % 4 + 1 AS INT)] AS raw_text
        FROM documents
    )
    SELECT doc_id, nfc_normalize(raw_text) AS norm_text,
           nfc_normalize(raw_text) <> raw_text AS changed
    FROM aug
    """,
)
def q_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (operators/textstats.normalize_text_nfc):
    every document is suffixed with a doc_id-selected DECOMPOSED form
    (combining acute/ring/tilde) so the normalizer provably rewrites 3/4
    of rows; the oracle is DuckDB's nfc_normalize — two independent
    Unicode implementations must agree codepoint-for-codepoint on the
    whole corpus. Arrow-batched projection, zero shuffle."""
    from vectorflow_spark.operators.textstats import normalize_text_nfc

    docs = _t(spark, sf_dir, "documents", split=True)
    variants = F.array(*[F.lit(v) for v in _NFC_VARIANTS])
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" "),
            F.element_at(variants, (F.col("doc_id") % 4 + 1).cast("int")),
        ).alias("raw_text"),
    )
    out = normalize_text_nfc(aug, text_col="raw_text")
    return out.select(
        "doc_id",
        F.col("norm_text"),
        (F.col("norm_text") != F.col("raw_text")).alias("changed"),
    )


@query(
    "q_embedding_drift",
    """
    WITH v2 AS (
        SELECT vec_id, label, embedding AS e1,
               list_transform(list_zip(embedding, generate_series(1, len(embedding))),
                   p -> CAST(p[1] AS DOUBLE)
                        + CASE WHEN p[2] = 1
                               THEN 0.5 * CAST(vec_id % 3 AS DOUBLE) ELSE 0.0 END) AS e2
        FROM embeddings
    ),
    scored AS (
        SELECT vec_id, label,
               round(
                 list_sum(list_transform(list_zip(e1, e2),
                     p -> CAST(p[1] AS DOUBLE) * p[2]))
                 / (sqrt(list_sum(list_transform(e1, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(e2, x -> x * x)))),
                 9) AS cos_v1_v2
        FROM v2
        WHERE list_sum(list_transform(e1, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(cos_v1_v2) AS DOUBLE) AS min_cos,
           CAST(count(*) FILTER (cos_v1_v2 < 0.999999) AS BIGINT) AS n_drifted
    FROM scored GROUP BY label
    """,
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-version drift audit — the gate you run on the versioned
    vector store (sinks/writers.versioned_write) before flipping the
    pointer after a re-embed: per-id cosine between the serving vectors
    (v1) and the candidate version (v2, here a deterministic single-
    coordinate perturbation so exactly the vec_id%3!=0 rows change
    direction), rolled up per label
    to (count, min cosine, drifted count). A pure-scale change has cosine
    1.0 — the audit distinguishes benign renormalization from real
    direction changes. Per-row fold + one small groupBy; at 100 TB the
    join of two store versions on vec_id is the only data-sized exchange
    (bucketed store layout makes it co-located)."""
    emb = _t(spark, sf_dir, "embeddings", split=True)
    e1 = F.col("embedding")
    bump = F.lit(0.5) * (F.col("vec_id") % 3).cast("double")
    e2 = F.transform(
        e1, lambda x, i: x.cast("double") + F.when(i == 0, bump).otherwise(F.lit(0.0))
    )
    base = emb.select("vec_id", "label", e1.alias("_e1"), e2.alias("_e2"))
    dot = F.aggregate(
        F.zip_with("_e1", "_e2", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(F.aggregate(F.transform("_e1", lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda a, x: a + x))
    n2 = F.sqrt(F.aggregate(F.transform("_e2", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    scored = base.filter(n1 > 0).select(
        "vec_id", "label", F.round(dot / (n1 * n2), 9).alias("cos_v1_v2")
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("cos_v1_v2").alias("min_cos"),
        F.sum(F.when(F.col("cos_v1_v2") < 0.999999, 1).otherwise(0)).cast("bigint").alias("n_drifted"),
    )


@query("q_image_neardup_pairs")
def q_image_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual NEAR-duplicate image pairs (rows-only: the pixel kernel
    is Python) over a MIXED-CONTAINER corpus — the web-corpus shape:
    unique images (seed = id) rotate through FAKE blobs, a lossless slot
    cycling real BMP / Adam7-INTERLACED PNG / WebP-VP8L (predictor
    transform + color cache) / TIFF-LZW (horizontal predictor), real
    baseline JPEGs and real PROGRESSIVE JPEGs (SOF2 with successive
    approximation — our own codecs: jpegmini, webpmini, tiffmini,
    codecs.py), except every
    5th, which is a PERTURBED JPEG-q100 re-encode of its successor's
    decoded pixels (three interior sampled pixels nudged + DCT rounding;
    twins alternate baseline/progressive containers) — true
    near-duplicates whose dHash lands 0-6 bits away, usually ≥1, so
    exact Hamming-0 grouping (q_image_dhash_dedup) misses most of them,
    and the pair is usually JPEG↔BMP/FAKE: the dedup key is the pixels,
    never the container bytes. dHash
    fingerprints feed the generic Hamming-ball bander
    (operators/dedup.hamming_candidate_pairs; the 63-bit dHash splits
    into 7 bands of 9 bits), pairing anything within 6 differing bits —
    exact by pigeonhole. Counts per hamming distance keep the result
    small and deterministic."""
    from vectorflow_spark.operators.codecs import decode_image, encode_bmp, encode_png
    from vectorflow_spark.operators.dedup import hamming_candidate_pairs
    from vectorflow_spark.operators.jpegmini import encode_jpeg, encode_jpeg_progressive
    from vectorflow_spark.operators.multimodal import image_dhash, make_fake_image

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    def _base(i: int) -> bytes:
        blob = make_fake_image(str(i))
        k = i % 4
        if k == 1:
            # lossless slot rotates BMP / Adam7 PNG / WebP-VP8L /
            # TIFF-LZW — pixels (the dedup key) are identical across all
            # four containers
            r = (i // 4) % 4
            if r == 1:
                return encode_png(decode_image(blob), interlace=True)
            if r == 2:
                from vectorflow_spark.operators.webpmini import encode_webp

                return encode_webp(decode_image(blob), transform="predictor", cache_bits=4)
            if r == 3:
                from vectorflow_spark.operators.tiffmini import encode_tiff

                return encode_tiff(decode_image(blob), compression="lzw", predictor=True)
            return encode_bmp(decode_image(blob))
        if k == 2:
            # entropy-layer knobs rotate too (optimized tables, restart
            # markers) — decode, hence dHash, is bit-identical across them
            return encode_jpeg(
                decode_image(blob),
                quality=100,
                optimize=(i // 4) % 2 == 1,
                restart_interval=3 if (i // 8) % 2 else 0,
            )
        if k == 3:
            return encode_jpeg_progressive(
                decode_image(blob), quality=100, optimize=(i // 4) % 2 == 0
            )
        return blob

    def _one(i) -> bytes:
        if int(i) % 5 == 0:  # perturbed twin of image i+1
            px = decode_image(_base(int(i) + 1)).copy()
            # Nudge three dHash-sampled interior pixels: (0,0) would only
            # touch bit 63, which the int64-safe mask drops.
            for (y, x) in ((4, 7), (7, 5), (9, 10)):
                px[y, x, :] ^= 0x60
            enc = encode_jpeg_progressive if int(i) % 2 == 0 else encode_jpeg
            return enc(px, quality=100)
        return _base(int(i))

    gen = F.pandas_udf(lambda ids: pd.Series([_one(i) for i in ids]), BinaryType())
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id")
    assets = docs.select(F.col("doc_id").alias("asset_id"), gen("doc_id").alias("data"))
    hashed = image_dhash(assets)
    pairs = hamming_candidate_pairs(
        hashed, "asset_id", "dhash", bits=63, n_bands=7, max_hamming=6
    )
    return pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min(F.col("a")).alias("min_a"),
    )


@query(
    "q_warc_scan",
    "SELECT doc_id, text AS warc_text FROM documents",
)
def q_warc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL web-archive cycle through the production entry points —
    distinct from q_warc_roundtrip, which proves per-row framing inside a
    UDF: here the corpus is written as multi-record ``.warc.gz`` segment
    files by the DISTRIBUTED sink (warcmini.write_warc_corpus: hash(url)
    segmenting, per-task build, rename-commit) and read back by the
    ``vf_warc`` streaming Data Source (one partition per file, records
    streamed off disk, never a whole-file row). The oracle is exact text
    identity over every document, so a hash-match proves the sink's
    framing, the source's incremental parser, gzip member handling and
    the url<->doc_id keying all at once. Scan parallelism = segment
    files, exactly how Common Crawl shards."""
    import os
    import tempfile

    from vectorflow_spark.sources.warcmini import read_warc, write_warc_corpus

    docs = _t(spark, sf_dir, "documents", split=True).select(
        "doc_id", F.concat(F.lit("http://corpus.local/"), F.col("doc_id")).alias("url"), "text"
    )
    # per-sf AND per-process dir, WIPED before each run: rename-commit
    # only replaces segments the current run produces, so a layout change
    # (n_files, the segment key) would otherwise leave stale segments the
    # scan re-ingests as duplicates; keying by PID keeps two concurrent
    # drivers on the same sf (bench + oracle check) from wiping each
    # other's segments mid-scan
    import shutil

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_warc_scan_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    manifest = write_warc_corpus(docs, out_dir, n_files=16)
    manifest.count()  # materialize: the write IS this action
    rows = read_warc(spark, out_dir).filter(F.col("warc_type") == "response")
    return rows.select(
        F.element_at(F.split("url", "/"), -1).cast("bigint").alias("doc_id"),
        F.decode("body", "UTF-8").alias("warc_text"),
    )


@query(
    "q_warc_scan_mount",
    "SELECT doc_id, text AS warc_text FROM documents",
)
def q_warc_scan_mount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OBJECT-STORE leg of the WARC cycle: same distributed sink +
    streaming scan as q_warc_scan, but the scan addresses the segments
    as ``s3://corpus/crawl/...`` through the injectable IO layer
    (sources/warcsource.py ``io=mount:<root>`` — the FUSE-mount
    deployment shape, and the stdlib-testable twin of the fsspec
    backend) — and through the CDX RANDOM-ACCESS path: the sink writes
    per-record (offset, length) sidecars (index=True), so the scan
    splits each segment into record-range partitions that seek straight
    to their records, Common Crawl's own CDX access pattern. The
    exact-text oracle proves listing, scheme mapping, the sidecars and
    per-member gzip slicing end to end — the round-4 verdict's #1 gap
    (vf_warc refused non-file schemes) exercised inside the correctness
    gate. q_warc_scan keeps the sequential-stream path covered."""
    import os
    import shutil
    import tempfile

    from vectorflow_spark.sources.warcmini import read_warc, write_warc_corpus

    docs = _t(spark, sf_dir, "documents", split=True).select(
        "doc_id", F.concat(F.lit("http://corpus.local/"), F.col("doc_id")).alias("url"), "text"
    )
    mount_root = os.path.join(
        tempfile.gettempdir(),
        f"vf_warc_mount_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(mount_root, ignore_errors=True)
    out_dir = os.path.join(mount_root, "corpus", "crawl")
    manifest = write_warc_corpus(docs, out_dir, n_files=16, index=True)
    manifest.count()  # materialize: the write IS this action
    rows = read_warc(
        spark, "s3://corpus/crawl", io=f"mount:{mount_root}", records_per_task=256
    ).filter(F.col("warc_type") == "response")
    return rows.select(
        F.element_at(F.split("url", "/"), -1).cast("bigint").alias("doc_id"),
        F.decode("body", "UTF-8").alias("warc_text"),
    )


@query(
    "q_wat_outlinks",
    """
    SELECT 'd' || CAST((doc_id + k) % 11 AS VARCHAR) || '.example' AS domain,
           CAST(count(*) AS BIGINT) AS n_links,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM documents, range(0, 4) t(k)
    WHERE k <= doc_id % 4
    GROUP BY 1
    """,
)
def q_wat_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT ingestion — the third leg of the Common Crawl triple (WARC
    response bodies, WET extracted text, WAT JSON metadata sidecars):
    per-document link metadata is built ENGINE-SIDE (to_json over the
    WAT envelope nesting, pure Catalyst), written as WARC ``metadata``
    records with ``application/json`` payloads by the distributed sink
    (write_warc_corpus record_type='metadata'), scanned back through
    ``vf_warc`` (the warc_type filter pushes into the parser), and the
    outlink graph re-extracted with get_json_object + from_json +
    explode — the crawl-graph aggregation (links per target domain) a
    ranking pipeline starts from. The oracle re-derives the link
    arithmetic relationally, so a hash match proves JSON envelope
    construction, WAT record framing, the streamed scan and the JSON
    re-extraction end to end. Every doc carries 1 + doc_id%4 links to
    hash-spread domains; one shuffle for the final aggregate."""
    import os
    import shutil
    import tempfile

    from vectorflow_spark.sources.warcmini import read_warc, write_warc_corpus

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id")
    links = F.transform(
        F.sequence(F.lit(0), (F.col("doc_id") % 4).cast("int")),
        lambda k: F.struct(
            F.concat(
                F.lit("https://d"),
                ((F.col("doc_id") + k) % 11).cast("string"),
                F.lit(".example/p"),
                k.cast("string"),
            ).alias("url")
        ),
    )
    wat_json = F.to_json(
        F.struct(
            F.struct(
                F.struct(
                    F.concat(F.lit("http://corpus.local/"), F.col("doc_id")).alias(
                        "WARC-Target-URI"
                    )
                ).alias("WARC-Header-Metadata"),
                F.struct(
                    F.struct(F.struct(links.alias("Links")).alias("HTML-Metadata")).alias(
                        "HTTP-Response-Metadata"
                    )
                ).alias("Payload-Metadata"),
            ).alias("Envelope")
        )
    )
    wat_docs = docs.select(
        F.concat(F.lit("http://corpus.local/"), F.col("doc_id")).alias("url"),
        wat_json.alias("text"),
    )
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_wat_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    write_warc_corpus(
        wat_docs, out_dir, n_files=8, record_type="metadata", mime="application/json"
    ).count()  # materialize: the write IS this action
    rows = read_warc(spark, out_dir).filter(F.col("warc_type") == "metadata")
    links_json = F.get_json_object(
        F.decode("body", "UTF-8"),
        "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']['HTML-Metadata']['Links']",
    )
    parsed = rows.select(
        F.element_at(F.split("url", "/"), -1).cast("bigint").alias("doc_id"),
        F.from_json(links_json, "array<struct<url:string>>").alias("links"),
    )
    exploded = parsed.select(
        "doc_id", F.explode("links").alias("link")
    ).select("doc_id", F.regexp_extract("link.url", r"^https://([^/]+)/", 1).alias("domain"))
    return exploded.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "q_webdataset_scan",
    """
    SELECT doc_id, text AS wds_text, CAST(doc_id % 7 AS INT) AS label
    FROM documents
    """,
)
def q_webdataset_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WebDataset cycle through the production entry points: every
    document becomes a two-member SAMPLE (``<key>.txt`` text +
    ``<key>.json`` metadata with a label) written as tar shards by the
    distributed sink (wds.write_webdataset: hash(key) sharding, zeroed
    tar metadata, rename-commit), scanned back by the ``vf_tar``
    streaming source (one partition per shard, members streamed) and
    reassembled into samples by the ZERO-SHUFFLE adjacency pass
    (wds.webdataset_samples). The oracle is exact text identity plus the
    label recovered from the json leg, so a hash match proves tar
    framing, the member stream, key/ext splitting, cross-batch sample
    assembly and both payload paths (utf-8 text and JSON) end to end —
    the multimodal-training-corpus analog of q_warc_scan."""
    import os
    import shutil
    import tempfile

    from vectorflow_spark.sources.wds import read_webdataset, write_webdataset

    docs = _t(spark, sf_dir, "documents", split=True).select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("key"),
        F.col("text").alias("txt"),
        F.to_json(
            F.struct(F.col("doc_id"), (F.col("doc_id") % 7).cast("int").alias("label"))
        ).alias("meta"),
    )
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_wds_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    write_webdataset(
        docs, out_dir, "key", {"txt": "txt", "meta": "json"}, n_shards=16
    ).count()  # materialize: the write IS this action
    samples = read_webdataset(spark, out_dir)
    meta = F.from_json(
        F.decode(F.element_at(F.col("parts"), "json"), "UTF-8"),
        "doc_id bigint, label int",
    )
    return samples.select(
        meta["doc_id"].alias("doc_id"),
        F.decode(F.element_at(F.col("parts"), "txt"), "UTF-8").alias("wds_text"),
        meta["label"].alias("label"),
    )


@query(
    "q_wds_caption_leg",
    """
    SELECT doc_id,
           'img ' || CAST(doc_id AS VARCHAR) || ' cat ' || CAST(doc_id % 7 AS VARCHAR)
               AS caption,
           CAST(doc_id % 7 AS INT) AS category
    FROM documents
    """,
)
def q_wds_caption_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selective-leg read that makes WebDataset work at 100 TB: the
    corpus is written as IMAGE+CAPTION shards (a real FAKE-codec image
    plus a caption per sample — the LAION shape), but the scan filters
    ``ext = 'txt'`` and the vf_tar pushdown drops every image member
    INSIDE the tar walk, so the caption-only pass never copies image
    bytes into rows (tar is sequential, so the bytes stream past but are
    never materialized — at crawl scale that is the difference between
    reading 2% and 100% of the corpus into Arrow). Shards carry INDEX
    sidecars (write_webdataset index=True), so the scan takes the
    seek-based range-partition path, where pushdown-skipped image
    members are not even streamed past. The oracle re-derives the
    captions relationally, proving the caption leg byte-exact while the
    image leg stays untouched."""
    import os
    import shutil
    import tempfile

    from vectorflow_spark.sources.wds import read_tar, write_webdataset

    import pandas as pd
    from pyspark.sql.types import BinaryType

    from vectorflow_spark.operators.multimodal import make_fake_image

    gen = F.pandas_udf(
        lambda ids: pd.Series([make_fake_image(str(i)) for i in ids]), BinaryType()
    )
    docs = _t(spark, sf_dir, "documents", split=True).select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("key"),
        F.concat(
            F.lit("img "), F.col("doc_id").cast("string"),
            F.lit(" cat "), (F.col("doc_id") % 7).cast("string"),
        ).alias("caption"),
        gen("doc_id").alias("img"),
    )
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_wds_cap_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    write_webdataset(
        docs, out_dir, "key", {"caption": "txt", "img": "fimg"}, n_shards=8, index=True
    ).count()  # materialize: the write IS this action
    texts = (
        read_tar(spark, out_dir)
        .filter(F.col("ext") == "txt")  # pushed into the tar walk
        .select(
            F.col("key").cast("bigint").alias("doc_id"),
            F.decode("data", "UTF-8").alias("caption"),
        )
    )
    return texts.withColumn(
        "category", F.element_at(F.split("caption", " "), -1).cast("int")
    )


@query("q_wds_image_dedup")
def q_wds_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-shard image dedup over a WebDataset corpus (rows-only:
    pixel kernel is Python) — the LAION-style pipeline: image+caption
    samples land in tar shards (every 5th image a DUPLICATE of its
    successor's pixels, usually in a different shard since sharding
    hashes the key; every 5th rides a WebP-VP8L container so dup pairs
    routinely cross FORMATS too), the scan reads ONLY the image leg
    (ext pushdown),
    and exact-duplicate groups form by pixel dHash — proving the dedup
    key survives the container round-trip and crosses shard boundaries.
    Composition of verified operators: vf_tar scan -> image_dhash ->
    hash-groupBy; one shuffle on the 8-byte hash."""
    import os
    import shutil
    import tempfile

    from vectorflow_spark.operators.multimodal import image_dhash, make_fake_image
    from vectorflow_spark.sources.wds import read_tar, write_webdataset

    import pandas as pd
    from pyspark.sql.types import BinaryType

    def _one(i) -> bytes:
        i = int(i)
        blob = make_fake_image(str(i + 1 if i % 5 == 0 else i))
        if i % 5 == 3:  # every 5th sample rides a WebP-VP8L container —
            # LAION-style shards mix formats; pixels (the dedup key) are
            # identical, so groups are container-independent
            from vectorflow_spark.operators.codecs import decode_image
            from vectorflow_spark.operators.webpmini import encode_webp

            return encode_webp(decode_image(blob), transform="subtract_green", cache_bits=4)
        return blob

    gen = F.pandas_udf(lambda ids: pd.Series([_one(i) for i in ids]), BinaryType())
    docs = _t(spark, sf_dir, "documents", split=True).select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("key"),
        gen("doc_id").alias("img"),
        F.concat(F.lit("cap "), F.col("doc_id")).alias("caption"),
    )
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_wds_dedup_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    write_webdataset(
        docs, out_dir, "key", {"img": "fimg", "caption": "txt"}, n_shards=8
    ).count()
    imgs = (
        read_tar(spark, out_dir)
        .filter(F.col("ext") == "fimg")
        .select(F.col("key").cast("bigint").alias("asset_id"), "data")
    )
    hashed = image_dhash(imgs)
    groups = hashed.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("asset_id").alias("keeper"),
        F.countDistinct((F.col("asset_id") % 8)).alias("n_home_shards"),
    )
    return groups.groupBy("n_copies").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("keeper").alias("min_keeper"),
    )


@query(
    "q_cdx_lookup",
    """
    SELECT doc_id, text AS warc_text FROM documents
    WHERE doc_id % 211 = 42
    """,
)
def q_cdx_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wayback lookup through the correctness gate: a URL-predicate
    scan over CDX-indexed WARC segments plans ONLY the matching record
    ranges (vf_warc url pushdown reads the URL-carrying sidecars at
    planning; each hit is one seek + one gzip member), so fetching a
    handful of pages out of a crawl costs a handful of record reads —
    never a segment walk. The oracle selects the same sparse id set
    relationally; exact text identity proves the index-driven path
    returns precisely the demanded records."""
    import os
    import shutil
    import tempfile

    from vectorflow_spark.sources.warcmini import read_warc, write_warc_corpus

    docs = _t(spark, sf_dir, "documents", split=True).select(
        "doc_id", F.concat(F.lit("http://corpus.local/"), F.col("doc_id")).alias("url"), "text"
    )
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_cdx_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    write_warc_corpus(docs, out_dir, n_files=16, index=True).count()
    wanted = docs.filter(F.col("doc_id") % 211 == 42).select("url")
    urls = [r.url for r in wanted.collect()]  # the lookup's query set:
    # driver-sized by construction (sparse ids), exactly like a wayback
    # request batch
    rows = read_warc(spark, out_dir).filter(F.col("url").isin(urls))
    return rows.select(
        F.element_at(F.split("url", "/"), -1).cast("bigint").alias("doc_id"),
        F.decode("body", "UTF-8").alias("warc_text"),
    )


@query("q_video_neardup_pairs")
def q_video_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate detection (rows-only: dHash kernel is
    Python) — the video leg of the cross-modal dedup triad, built by
    COMPOSING verified operators rather than a new kernel
    (multimodal.video_neardup_pairs): frame explode -> per-frame dHash ->
    Hamming-ball frame pairs -> temporally-aligned (same frame index)
    video-pair rollup requiring >= 6 of 8 matching frames. Corpus: unique
    8-frame 16x12 videos (seed = id) in a MIXED-CONTAINER rotation —
    thirds ride a REAL MJPEG AVI (operators/codecs.encode_avi_mjpeg:
    RIFF framing + one baseline JPEG per frame), a REAL animated GIF
    (LZW + grayscale palette — lossless for these gray frames), or the
    FAKE container — except every 5th, a re-render of its successor with
    three pixels nudged IN EVERY FRAME (the re-encode model), usually
    landing in the OTHER container family: the dedup key is the frames'
    pixels, never the container bytes. Twins match on aligned frames
    within a few bits (JPEG-q100 wobble ≤~2/pixel included); unrelated
    videos virtually never align. Per-video id count keeps the result
    deterministic and small."""
    from vectorflow_spark.operators.codecs import encode_avi_mjpeg, encode_gif
    from vectorflow_spark.operators.multimodal import make_fake_video, video_neardup_pairs

    import struct as _struct

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    NF, W, H = 8, 16, 12

    def _frames(i: int) -> np.ndarray:
        blob = make_fake_video(str(i), NF, W, H)
        return np.frombuffer(blob[10:], dtype=np.uint8).reshape(NF, H, W).copy()

    def _pack(i: int, frames: np.ndarray) -> bytes:
        if i % 3 == 1:  # real MJPEG AVI container
            return encode_avi_mjpeg(frames, quality=100)
        if i % 3 == 2:  # real animated GIF (gray palette: lossless here)
            return encode_gif(frames)
        return b"FVID" + _struct.pack("<HHH", NF, W, H) + frames.tobytes()

    def _one(i) -> bytes:
        i = int(i)
        if i % 5 == 0:  # perturbed twin of video i+1
            frames = _frames(i + 1)
            for (y, x) in ((4, 7), (7, 5), (9, 10)):
                frames[:, y, x] ^= 0x60
            return _pack(i, frames)
        return _pack(i, _frames(i))

    gen = F.pandas_udf(lambda ids: pd.Series([_one(i) for i in ids]), BinaryType())
    # contiguous half-corpus: keeps every (i, i+1) twin pair intact while
    # halving the per-video codec cost that dominates this query (the
    # suite's heaviest Python kernel after the round-5 GIF/AVI rotation)
    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") < 250)
        .select("doc_id")
    )
    assets = docs.select(F.col("doc_id").alias("asset_id"), gen("doc_id").alias("data"))
    pairs = video_neardup_pairs(assets, frame_hamming=6, min_frames=6)
    return pairs.groupBy("n_frames_matched").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("video_a").alias("min_a"),
    )


@query("q_audio_fingerprint_dedup")
def q_audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual AUDIO near-duplicate pairs (rows-only: FFT kernel is
    Python) — the audio leg of the cross-modal dedup family: clips are
    unique 2048-sample streams (seed = id) rotating FAKE/WAV containers,
    except every 5th, which is a deterministic light-noise re-render of
    its successor (the re-encode/transcode model). The fingerprint is
    operators/multimodal.audio_fingerprint — framed rfft band-energy
    derivative signs majority-voted to a 63-bit clip code (measured:
    twins land 0-8 bits apart, unrelated clips 15+) — and pairing is the
    SAME generic Hamming-ball bander image dHash and SimHash use
    (9 bands x 7 bits, max_hamming 8 < 9 bands = exact by pigeonhole).
    Counts per hamming distance keep the result small; one Arrow pass +
    one band-key shuffle."""
    from vectorflow_spark.operators.codecs import decode_audio, encode_wav
    from vectorflow_spark.operators.dedup import hamming_candidate_pairs
    from vectorflow_spark.operators.multimodal import audio_fingerprint, make_fake_audio

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    def _base(i: int) -> bytes:
        blob = make_fake_audio(str(i), 8000, 2048)
        if i % 2:  # odd ids carry real WAV containers
            samples, rate = decode_audio(blob)
            return encode_wav(samples.astype(np.uint8), rate)
        return blob

    def _one(i) -> bytes:
        i = int(i)
        if i % 5 == 0:  # noise-perturbed twin of clip i+1
            samples, rate = decode_audio(_base(i + 1))
            rng = np.random.default_rng(i)  # deterministic per id
            noisy = np.clip(samples + rng.normal(0, 2, len(samples)), 0, 255)
            return encode_wav(noisy.astype(np.uint8), rate)
        return _base(i)

    gen = F.pandas_udf(lambda ids: pd.Series([_one(i) for i in ids]), BinaryType())
    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id")
    assets = docs.select(F.col("doc_id").alias("asset_id"), gen("doc_id").alias("data"))
    printed = audio_fingerprint(assets)
    pairs = hamming_candidate_pairs(
        printed, "asset_id", "afp", bits=63, n_bands=9, max_hamming=8
    )
    return pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min(F.col("a")).alias("min_a"),
    )


@query(
    "q_session_window_native",
    """
    WITH sec AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
    ),
    g AS (
        SELECT user_id, ts_s,
               CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) > 1800
                    THEN 1 ELSE 0 END AS ns
        FROM sec
    ),
    s AS (
        SELECT user_id, ts_s,
               sum(ns) OVER (PARTITION BY user_id ORDER BY ts_s
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g
    )
    SELECT user_id,
           min(ts_s) AS session_start,
           max(ts_s) + 1800 AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-NATIVE session windows: ``F.session_window(ts, gap)`` in a
    plain groupBy — the built-in operator behind streaming session aggs,
    here proven equivalent to the classical gaps-and-islands SQL. Boundary
    semantics pinned empirically (batch AND streaming probed, round 3): a
    window STARTING exactly at a previous session's end DOES merge into it
    — touching counts as overlapping — so the islands formulation breaks
    on ``diff > gap``, and an event exactly gap-seconds after its
    predecessor extends the session. One shuffle on (user, session); at
    scale this is the same plan the watermarked streaming version runs
    per state update."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.timestamp_seconds(F.expr("ts div 1000000000")).alias("t")
    )
    out = ev.groupBy("user_id", F.session_window("t", "30 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return out.select(
        "user_id",
        F.unix_timestamp(F.col("w.start")).alias("session_start"),
        F.unix_timestamp(F.col("w.end")).alias("session_end"),
        "n_events",
    )


@query(
    "q_docs_bulk_fetch",
    """
    SELECT doc_id,
           CASE WHEN substr(text, 1, 4) = '%PDF' THEN 'pdf'
                WHEN substr(text, 1, 2) = 'PK' THEN 'docx'
                ELSE 'txt' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE WHEN substr(text, 1, 4) = '%PDF' OR substr(text, 1, 2) = 'PK'
                THEN md5('') ELSE md5(text) END AS text_md5
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def q_docs_bulk_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BULK-URL ingestion cycle through ``vf_docs`` (the reference's
    presigned-URL path S6 made cluster-scale, sources/datasource.py):
    every 7th document is materialized as a ``.txt`` file by a
    DISTRIBUTED mapInPandas writer (no driver loop over payloads), the
    resulting URL manifest feeds ``spark.read.format("vf_docs")``, and
    the fetches run on executors — partitioned, Arrow-batched, with the
    same MIME sniff the binaryFile path uses. The oracle is exact
    payload identity (md5 over the fetched bytes re-derived from the
    table), so a hash-match proves the writer, the manifest plumbing,
    the executor-side fetch and the sniff classification all at once.
    The manifest ``collect()`` is driver-sized by construction: a
    manifest IS driver-resident metadata in this source (VfDocsReader
    holds the URL list for planning-time pushdown pruning), and each row
    is one short path string, never a payload."""
    import json as _json
    import os
    import shutil
    import tempfile

    import pandas as pd

    from vectorflow_spark.sources import datasource

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"vf_docs_fetch_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", "text")
    )

    def write_files(pdfs):
        for pdf in pdfs:
            urls = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                p = os.path.join(out_dir, f"{int(doc_id)}.txt")
                with open(p, "wb") as f:
                    f.write(str(text).encode("utf-8"))
                urls.append("file://" + p)
            yield pd.DataFrame({"url": urls})

    urls = [r.url for r in docs.mapInPandas(write_files, "url string").collect()]
    datasource.register(spark)
    fetched = (
        spark.read.format("vf_docs")
        .option("urls", _json.dumps(sorted(urls)))
        .option("allowedSchemes", "http,https,file")
        .option("numPartitions", "32")
        .load()
    )
    return fetched.select(
        F.split(F.col("source"), r"\.").getItem(0).cast("bigint").alias("doc_id"),
        "kind",
        "n_bytes",
        F.when(F.col("kind") == "txt", F.md5(F.encode(F.col("text"), "UTF-8")))
        .otherwise(F.md5(F.lit("")))
        .alias("text_md5"),
    )


@query(
    "q_jpeg_optimize_recompress",
    """
    SELECT doc_id,
           CAST(16 + doc_id % 16 AS INT) AS w,
           CAST(12 + doc_id % 8 AS INT) AS h,
           (doc_id % 3 = 0) AS gray,
           TRUE AS bit_identical,
           TRUE AS opt_smaller
    FROM documents WHERE doc_id % 4 = 0
    """,
)
def q_jpeg_optimize_recompress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless STORAGE-RECOMPRESSION pass over an image corpus — the
    petabyte-scale win real archives run (jpegtran/mozjpeg style): each
    baseline JPEG is re-encoded with measured-frequency optimized Huffman
    tables (operators/jpegmini.encode_jpeg(optimize=True), T.81 Annex
    K.2 two-pass), which changes ONLY the entropy layer. The query
    verifies both contracts per asset inside the scan — decode
    bit-identity between the standard-table and optimized encodes, and
    strict size reduction — and returns them as oracle-checked booleans,
    so a single hash-match proves the symbol-counting pass, the
    length-limited table builder and the DHT emission over 250 varied
    images (sizes 16-31 x 12-19, every third grayscale). Embarrassingly
    parallel: one Arrow-batched projection, no shuffle; at 100 TB this
    runs as a mapInPandas over the blob store with the same kernel."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("gray", BooleanType()),
            StructField("bit_identical", BooleanType()),
            StructField("opt_smaller", BooleanType()),
        ]
    )

    def recompress(pdfs):
        import numpy as np

        from vectorflow_spark.operators.codecs import decode_image
        from vectorflow_spark.operators.jpegmini import decode_jpeg, encode_jpeg
        from vectorflow_spark.operators.multimodal import make_fake_image

        for pdf in pdfs:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h, gray = 16 + i % 16, 12 + i % 8, i % 3 == 0
                px = decode_image(make_fake_image(str(i), width=w, height=h))
                if gray:
                    px = px[:, :, 0]
                std = encode_jpeg(px, quality=85)
                opt = encode_jpeg(px, quality=85, optimize=True)
                rows.append(
                    (
                        i,
                        w,
                        h,
                        gray,
                        bool(np.array_equal(decode_jpeg(std), decode_jpeg(opt))),
                        len(opt) < len(std),
                    )
                )
            yield pd.DataFrame(rows, columns=out_schema.fieldNames())

    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") % 4 == 0)
        .select("doc_id")
    )
    return docs.mapInPandas(recompress, out_schema)


@query(
    "q_split_leakage_audit",
    f"""
    WITH cand AS ({_minhash_pairs_sql()}),
    x AS (
        SELECT CASE WHEN a % 10 = 7 THEN a ELSE b END AS holdout_doc,
               CASE WHEN a % 10 = 7 THEN b ELSE a END AS train_doc
        FROM cand
        WHERE (a % 10 = 7) <> (b % 10 = 7)
    )
    SELECT holdout_doc,
           CAST(count(*) AS BIGINT) AS n_train_neardups,
           CAST(min(train_doc) AS BIGINT) AS nearest_train_doc
    FROM x GROUP BY 1
    """,
)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/holdout SPLIT-LEAKAGE audit — the eval-hygiene gate run
    before trusting a benchmark number: documents split 90/10 by a
    deterministic id rule (doc_id % 10 = 7 is the holdout; at 100 TB the
    rule is a hash of a stable doc key, same plan), then every
    MinHash-LSH candidate near-dup pair CROSSING the boundary is charged
    to its holdout-side doc — a holdout doc with train near-dups is a
    leaked eval item (the model saw a near-copy in training). Output:
    one row per leaked holdout doc with its train-side near-dup count
    and the smallest offending train doc id. Composes the verified
    candidate generator (operators/dedup.minhash_candidate_pairs);
    the only data-sized shuffle is the generator's own uniform
    (band, bucket) key — the split predicate and the final rollup ride
    on the tiny pair set."""
    from vectorflow_spark.operators.dedup import minhash_candidate_pairs

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    cand = minhash_candidate_pairs(docs)
    a_h = F.col("a") % 10 == 7
    b_h = F.col("b") % 10 == 7
    crossing = cand.filter(a_h != b_h).select(
        F.when(a_h, F.col("a")).otherwise(F.col("b")).alias("holdout_doc"),
        F.when(a_h, F.col("b")).otherwise(F.col("a")).alias("train_doc"),
    )
    return crossing.groupBy("holdout_doc").agg(
        F.count(F.lit(1)).alias("n_train_neardups"),
        F.min("train_doc").alias("nearest_train_doc"),
    )


@query(
    "q_webp_roundtrip",
    """
    SELECT doc_id,
           CAST(16 + doc_id % 13 AS INT) AS w,
           CAST(10 + doc_id % 7 AS INT) AS h,
           CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'none'
                WHEN 1 THEN 'subtract_green' WHEN 2 THEN 'predictor'
                WHEN 3 THEN 'color' ELSE 'palette' END AS transform,
           (doc_id % 7 = 0) AS meta_groups,
           TRUE AS lossless,
           TRUE AS meta_ok
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q_webp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP-lossless (VP8L) ingestion readiness over a varied corpus —
    the container a large share of real crawls serve alongside
    JPEG/PNG/GIF (operators/webpmini.py). Per document a deterministic
    image (sizes 16-28 x 10-16; every 5th a <=16-color palette image so
    index bundling runs) is encoded with the transform/LZ77/color-cache
    knobs cycling by doc_id — every VP8L decoder path (all four
    transforms, backward references, cache hits, simple + code-length
    Huffman forms, and every 7th asset the meta-Huffman group path)
    crosses the executor boundary — then decoded back
    through the UNIFIED dispatch (codecs.decode_image) and compared
    bit-exactly; header metadata is cross-checked via decode_meta. The
    oracle pins both invariants plus the knob assignment. One
    Arrow-batched projection, no shuffle — at 100 TB this is the same
    mapInPandas over the blob store."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("transform", StringType()),
            StructField("meta_groups", BooleanType()),
            StructField("lossless", BooleanType()),
            StructField("meta_ok", BooleanType()),
        ]
    )
    transforms = ["none", "subtract_green", "predictor", "color", "palette"]

    def roundtrip(pdfs):
        import numpy as np

        from vectorflow_spark.operators.codecs import decode_image
        from vectorflow_spark.operators.multimodal import decode_meta, make_fake_image
        from vectorflow_spark.operators.webpmini import encode_webp

        for pdf in pdfs:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 16 + i % 13, 10 + i % 7
                tr = transforms[i % 5]
                if tr == "palette":
                    seeds = decode_image(make_fake_image(str(i), width=13, height=1))
                    pal = seeds.reshape(-1, 3)[: 3 + i % 14]  # 3..16 colors
                    sel = decode_image(make_fake_image(f"idx{i}", width=w, height=h))
                    px = pal[sel[:, :, 0].astype(np.int64) % len(pal)]
                else:
                    px = decode_image(make_fake_image(str(i), width=w, height=h))
                blob = encode_webp(
                    px,
                    use_lz77=i % 2 == 0,
                    cache_bits=(i % 3) * 3,  # 0, 3, 6
                    transform=tr,
                    meta_groups=i % 7 == 0,
                )
                m = decode_meta(blob)
                rows.append(
                    (
                        i,
                        w,
                        h,
                        tr,
                        i % 7 == 0,
                        bool(np.array_equal(decode_image(blob), px)),
                        m["kind"] == "image" and m["width"] == w and m["height"] == h,
                    )
                )
            yield pd.DataFrame(rows, columns=out_schema.fieldNames())

    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )
    return docs.mapInPandas(roundtrip, out_schema)


@query(
    "q_tiff_roundtrip",
    """
    SELECT doc_id,
           CAST(14 + doc_id % 11 AS INT) AS w,
           CAST(9 + doc_id % 6 AS INT) AS h,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'none'
                WHEN 1 THEN 'packbits' ELSE 'lzw' END AS compression,
           (doc_id % 3 = 2 AND doc_id % 2 = 0) AS predictor,
           (doc_id % 4 = 0) AS big_endian,
           TRUE AS lossless,
           TRUE AS meta_ok
    FROM documents WHERE doc_id % 5 = 1
    """,
)
def q_tiff_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline TIFF ingestion readiness — the container scanned-document
    corpora carry (operators/tiffmini.py). Per document a deterministic
    image encodes with compression (none/PackBits/TIFF-LZW), horizontal
    predictor, multi-strip layout and byte order cycling by doc_id, then
    decodes back through the UNIFIED dispatch (codecs.decode_image) and
    compares bit-exactly; header metadata cross-checked via decode_meta.
    The oracle pins the knob assignment plus both invariants. One
    Arrow-batched projection, no shuffle — the same mapInPandas a 100 TB
    scan-archive sweep runs."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("compression", StringType()),
            StructField("predictor", BooleanType()),
            StructField("big_endian", BooleanType()),
            StructField("lossless", BooleanType()),
            StructField("meta_ok", BooleanType()),
        ]
    )
    comps = ["none", "packbits", "lzw"]

    def roundtrip(pdfs):
        import numpy as np

        from vectorflow_spark.operators.codecs import decode_image
        from vectorflow_spark.operators.multimodal import decode_meta, make_fake_image
        from vectorflow_spark.operators.tiffmini import encode_tiff

        for pdf in pdfs:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 14 + i % 11, 9 + i % 6
                comp = comps[i % 3]
                pred = comp == "lzw" and i % 2 == 0
                be = i % 4 == 0
                px = decode_image(make_fake_image(str(i), width=w, height=h))
                blob = encode_tiff(
                    px,
                    compression=comp,
                    predictor=pred,
                    rows_per_strip=4 if i % 2 else None,
                    big_endian=be,
                )
                m = decode_meta(blob)
                rows.append(
                    (
                        i,
                        w,
                        h,
                        comp,
                        pred,
                        be,
                        bool(np.array_equal(decode_image(blob), px)),
                        m["kind"] == "image" and m["width"] == w and m["height"] == h,
                    )
                )
            yield pd.DataFrame(rows, columns=out_schema.fieldNames())

    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") % 5 == 1)
        .select("doc_id")
    )
    return docs.mapInPandas(roundtrip, out_schema)


@query(
    "q_g711_decode",
    """
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id % 6 = 2),
    k AS (
        SELECT doc_id, unnest(range(32 + doc_id % 17)) AS i FROM docs
    ),
    s AS (
        SELECT doc_id,
               CAST((doc_id * 7 + i * 13) % 256 AS BIGINT) AS code,
               (doc_id % 2 = 0) AS is_ulaw
        FROM k
    ),
    v AS (
        SELECT doc_id,
          CASE WHEN is_ulaw THEN
            CASE WHEN (255 - code) >= 128
                 THEN 132 - ((((255 - code) % 16) * 8 + 132) << (((255 - code) // 16) % 8))
                 ELSE ((((255 - code) % 16) * 8 + 132) << (((255 - code) // 16) % 8)) - 132 END
          ELSE
            CASE WHEN xor(code, 85) >= 128
                 THEN CASE WHEN (xor(code, 85) // 16) % 8 = 0 THEN (xor(code, 85) % 16) * 16 + 8
                           WHEN (xor(code, 85) // 16) % 8 = 1 THEN (xor(code, 85) % 16) * 16 + 264
                           ELSE ((xor(code, 85) % 16) * 16 + 264) << ((xor(code, 85) // 16) % 8 - 1) END
                 ELSE -(CASE WHEN (xor(code, 85) // 16) % 8 = 0 THEN (xor(code, 85) % 16) * 16 + 8
                             WHEN (xor(code, 85) // 16) % 8 = 1 THEN (xor(code, 85) % 16) * 16 + 264
                             ELSE ((xor(code, 85) % 16) * 16 + 264) << ((xor(code, 85) // 16) % 8 - 1) END) END
          END AS val
        FROM s
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS law,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(val) AS BIGINT) AS sum_val,
           CAST(min(val) AS BIGINT) AS min_val,
           CAST(max(val) AS BIGINT) AS max_val
    FROM v GROUP BY doc_id
    """,
)
def q_g711_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 telephony-audio ingestion (operators/codecs.encode_wav_g711
    / decode_wav formats 7 and 6) verified against an INDEPENDENT SQL
    implementation of the expansion: per document a deterministic
    companded byte stream rides a real mu-law or A-law WAV container
    through the executor-side decode, and the per-doc sample statistics
    must hash-match DuckDB computing the same values straight from the
    G.711 bit arithmetic (complement/XOR-0x55, mantissa shift, segment
    scaling) — two implementations, one from the C reference expansion
    and one in relational algebra, agreeing on every sample. One
    Arrow-batched projection + a per-doc rollup; no shuffle beyond the
    tiny aggregate."""
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("law", StringType()),
            StructField("n_samples", LongType()),
            StructField("sum_val", LongType()),
            StructField("min_val", LongType()),
            StructField("max_val", LongType()),
        ]
    )

    def decode(pdfs):
        import numpy as np

        from vectorflow_spark.operators.codecs import decode_audio, encode_wav_g711

        for pdf in pdfs:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = 32 + i % 17
                codes = np.array([(i * 7 + k * 13) % 256 for k in range(n)], dtype=np.uint8)
                law = "ulaw" if i % 2 == 0 else "alaw"
                samples, rate = decode_audio(encode_wav_g711(codes, 8000, law))
                assert rate == 8000
                v = samples.astype(np.int64)
                rows.append((i, law, n, int(v.sum()), int(v.min()), int(v.max())))
            yield pd.DataFrame(rows, columns=out_schema.fieldNames())

    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") % 6 == 2)
        .select("doc_id")
    )
    return docs.mapInPandas(decode, out_schema)
