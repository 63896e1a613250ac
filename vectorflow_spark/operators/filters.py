"""Filters / validation operators (F1, F3, F4, S8, K2).

Reference behaviors re-expressed as DataFrame predicates so Catalyst pushes
them into the parquet scan (check ``.explain`` for PushedFilters):

  F3  empty-file filter           reference src/api/app.py:94-97
  F4  25 MB size guard            reference src/api/app.py:54-59
  S8  file-type whitelist + utf-8 content sniff  src/api/app.py:291-310
  K2  duplicate-filename skip     reference src/api/app.py:103-104
  F1  chunk-validation webhook    reference src/worker/worker.py:156-172
"""

from __future__ import annotations

import json as _json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectorflow_spark.config import MAX_FILE_SIZE_BYTES

# reference src/api/app.py:292 (supported_extensions)
SUPPORTED_EXTENSIONS = (".txt", ".pdf", ".docx", ".md", ".html")


def filter_nonempty(df: DataFrame, text_col: str = "text") -> DataFrame:
    """F3: drop rows with no content (empty filename/text)."""
    return df.filter(F.length(F.col(text_col)) > 0)


def filter_max_size(df: DataFrame, text_col: str = "text", cap: int = MAX_FILE_SIZE_BYTES) -> DataFrame:
    """F4: the /embed 25 MB cap as a predicate."""
    return df.filter(F.length(F.col(text_col)) <= cap)


def valid_source_predicate(source_col: str = "source"):
    """S8 (filename part): extension whitelist, case-insensitive."""
    lowered = F.lower(F.col(source_col))
    pred = F.lit(False)
    for ext in SUPPORTED_EXTENSIONS:
        pred = pred | lowered.endswith(ext)
    return pred


def filter_valid_source(df: DataFrame, source_col: str = "source") -> DataFrame:
    return df.filter(valid_source_predicate(source_col))


def dedup_filenames(df: DataFrame, source_col: str = "source") -> DataFrame:
    """K2: same filename appearing twice in one request is skipped.
    dropDuplicates is a partial-agg-friendly first-wins per key."""
    return df.dropDuplicates([source_col])


def semi_join_valid(df: DataFrame, valid: DataFrame, key: str = "chunk_id") -> DataFrame:
    """F1 generalized: keep only rows whose key appears in ``valid`` —
    the reference's chunk-validation webhook reduced to its data-plane
    essence (a left-semi join; broadcast when the valid set is small)."""
    return df.join(valid.select(key).distinct(), key, "left_semi")


# --- F1, full form: chunk-validation webhook ------------------------------
#
# Reference src/worker/worker.py:156-172: POST each batch of chunks to a
# user-supplied validation endpoint with a 30 s timeout; keep only the
# chunk ids the endpoint returns; a timeout / transport error FAILS THAT
# BATCH (its chunks are dropped and the job continues) — not the whole job.
#
# The HTTP call is an injectable ``transport(rows) -> valid_ids`` callable
# (the same external-service seam as enhancer.Completion / the embedding
# backends), so the operator is fully testable offline and swapping in the
# real endpoint changes one argument, not the plan.

ValidationTransport = Callable[[list[dict]], list[str]]


def http_validation_transport(
    url: str, webhook_key: str = "", timeout: float = 30.0
) -> ValidationTransport:
    """The real F1 transport: POST ``{"chunks": [{"id", "text"}, ...]}``,
    expect ``{"valid_ids": [...]}`` back. 30 s default timeout = reference
    parity (worker.py:161). stdlib urllib — no extra deps; raises on
    non-2xx / timeout, which the operator converts to a failed batch."""

    def post(rows: list[dict]) -> list[str]:
        import urllib.request

        req = urllib.request.Request(
            url,
            data=_json.dumps({"chunks": rows}).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "X-Chunk-Validation-Key": webhook_key,
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = _json.loads(resp.read().decode("utf-8"))
        return [str(i) for i in body.get("valid_ids", [])]

    return post


def validate_chunks_webhook(
    chunks: DataFrame,
    transport: ValidationTransport,
    id_col: str = "chunk_id",
    text_col: str = "text",
    batch_size: int = 128,
) -> DataFrame:
    """F1: per-batch webhook validation as one mapInPandas pass — each
    Arrow batch is sliced into ``batch_size`` groups, each group POSTed
    via ``transport``, and only rows whose id comes back survive. A
    transport exception (timeout, 5xx, connection refused) drops exactly
    that batch's rows and moves on — reference fail-batch semantics.

    Scale shape: embarrassingly parallel, no shuffle; each task talks to
    the endpoint independently, so endpoint concurrency == task count
    (tune with the input partitioning, not executor settings)."""
    schema = chunks.schema

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                sub = pdf.iloc[start : start + batch_size]
                rows = [
                    {"id": str(i), "text": t if t is not None else ""}
                    for i, t in zip(sub[id_col], sub[text_col])
                ]
                try:
                    valid = {str(v) for v in transport(rows)}
                except Exception:
                    continue  # failed batch: drop its chunks, keep going
                keep = sub[sub[id_col].astype(str).isin(valid)]
                if len(keep):
                    yield keep

    return chunks.mapInPandas(run, schema=schema)


# --- F2: request-validation chain -----------------------------------------
#
# Reference src/api/validators.py:7-46 + app.py:40-45,79-84: every endpoint
# runs an ORDERED list of named validations over the incoming
# VectorflowRequest and dispatches the FIRST failure to an (error message,
# status code) pair; a request with no failure proceeds (200).
#
# Data-plane form: a batch of requests is a DataFrame (one row per request,
# columns = the VectorflowRequest surface, shared/vectorflow_request.py:6-19)
# and the chain is ONE Catalyst CASE expression — first-match-wins exactly
# like the reference's ``next(v for v in checks if not VALID[v])``. Pure
# projection: no shuffle, no Python, fully pushdown-friendly, and the whole
# chain whole-stage-codegens into the scan at any scale.

# validators.py:18-27 (message, status) — order of _EMBED_CHECKS is
# app.py:40-45; _JOBS_CHECKS is app.py:79-84.
DISPATCH_ERROR_MAP = {
    "CRED": ("Invalid credentials", 401),
    "METADATA": ("Missing required fields", 400),
    "METADATA2": ("Missing required fields", 400),
    "EMBEDDING_TYPE": (
        'Hugging face embeddings models require a "hugging_face_model_name" '
        'in the "embeddings_metadata"',
        400,
    ),
    "WEBHOOK": ("Webhook URL provided but no webhook key", 400),
    "SOURCE_DATA": ("No file part in the request", 400),
    "HAS_FILES": ("No file part in the request", 400),
    "PRE_SIGNED": ("Missing required fields", 400),
}

EMBED_CHECKS = ("CRED", "METADATA", "EMBEDDING_TYPE", "WEBHOOK", "SOURCE_DATA")
JOBS_CHECKS = ("CRED", "METADATA", "EMBEDDING_TYPE", "WEBHOOK", "HAS_FILES")


def _nonempty(col: str):
    c = F.col(col)
    return c.isNotNull() & (F.length(c) > 0)


def validate_requests(
    requests: DataFrame,
    checks: tuple[str, ...] = EMBED_CHECKS,
    valid_keys: tuple[str, ...] = (),
    local_vector_db: bool = False,
) -> DataFrame:
    """F2: the validation chain as one first-match-wins CASE projection.

    Expected columns (the VectorflowRequest surface; any may be null):
      vectorflow_key, embeddings_type, vector_db_type, vector_db_index,
      vector_db_key, webhook_url, webhook_key, has_source_data (boolean).

    Per-check truth (validators.py:35-44):
      CRED            key present AND in ``valid_keys`` (Auth stand-in)
      METADATA        embeddings_metadata AND vector_db_metadata AND
                      (vector_db_key OR LOCAL_VECTOR_DB)
      METADATA2       vector_db_metadata AND (vector_db_key OR LOCAL_VECTOR_DB)
      EMBEDDING_TYPE  embeddings_type == 'open_ai' (EmbeddingsType.OPEN_AI)
      WEBHOOK         no webhook_url OR webhook_key present
      SOURCE_DATA /   modeled by the ``has_source_data`` boolean (the
      HAS_FILES       multipart body never reaches the data plane)

    ``local_vector_db`` mirrors the LOCAL_VECTOR_DB env toggle
    (validators.py:37-38). Output: input columns + ``failed_validation``,
    ``error``, ``status_code`` (null/null/200 for accepted requests).
    """
    meta_db = F.col("vector_db_type").isNotNull() & F.col("vector_db_index").isNotNull()
    db_key_ok = _nonempty("vector_db_key") | F.lit(bool(local_vector_db))
    ok = {
        "CRED": _nonempty("vectorflow_key")
        & (F.col("vectorflow_key").isin(*valid_keys) if valid_keys else F.lit(False)),
        "METADATA": F.col("embeddings_type").isNotNull() & meta_db & db_key_ok,
        "METADATA2": meta_db & db_key_ok,
        "EMBEDDING_TYPE": F.col("embeddings_type") == "open_ai",
        "WEBHOOK": F.col("webhook_url").isNull() | _nonempty("webhook_key"),
        "SOURCE_DATA": F.col("has_source_data"),
        "HAS_FILES": F.col("has_source_data"),
        "PRE_SIGNED": _nonempty("presigned_url"),
    }
    failed = F.lit(None).cast("string")
    for name in reversed(checks):
        failed = F.when(~F.coalesce(ok[name], F.lit(False)), F.lit(name)).otherwise(failed)
    out = requests.withColumn("failed_validation", failed)
    err = F.lit(None).cast("string")
    code = F.lit(200)
    for name in checks:
        msg, status = DISPATCH_ERROR_MAP[name]
        hit = F.col("failed_validation") == name
        err = F.when(hit, F.lit(msg)).otherwise(err)
        code = F.when(hit, F.lit(status)).otherwise(code)
    return out.withColumn("error", err).withColumn("status_code", code)
