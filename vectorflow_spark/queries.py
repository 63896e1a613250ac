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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectorflow_spark.config import ChunkStrategy, PipelineConfig
from vectorflow_spark.functions.ids import content_id, uuid5_udf
from vectorflow_spark.functions.vector import cosine_similarity
from vectorflow_spark.operators import chunkers
from vectorflow_spark.operators.batching import batch_counts, minibatch_ids
from vectorflow_spark.operators.filters import (
    dedup_filenames,
    filter_nonempty,
    filter_valid_source,
    semi_join_valid,
)
from vectorflow_spark.operators.rollup import job_rollup

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
    f"SELECT doc_id, source FROM documents WHERE {_VALID_EXT_SQL}",
)
def q_filter_valid_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: extension whitelist filter."""
    return filter_valid_source(_t(spark, sf_dir, "documents")).select("doc_id", "source")


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
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
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
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
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
    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", content_id("text", "doc_id", F.lit("doc")).alias("content_id"))


@query("q_uuid5_ids")  # rows-only: DuckDB 1.0 has no sha1()
def q_uuid5_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 (reference parity): RFC-4122 uuid5 ids — rows-only check; exact
    parity with the reference's generate_uuid_from_tuple is pinned by unit
    tests against Python's uuid.uuid5 instead."""
    df = _t(spark, sf_dir, "documents")
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
    (all-ones, dim 8) as built-in array expressions; deterministic tiebreak
    on vec_id. At scale this is a single scan + TakeOrderedAndProject."""
    df = _t(spark, sf_dir, "embeddings")
    ones = F.array([F.lit(1.0)] * 64)
    scored = df.select(
        "vec_id",
        "label",
        F.round(cosine_similarity(F.col("embedding"), ones), 9).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id")).limit(25)
