"""Filters / validation operators (F1, F3, F4, S8, K2).

Reference behaviors re-expressed as DataFrame predicates so Catalyst pushes
them into the parquet scan (check ``.explain`` for PushedFilters):

  F3  empty-file filter           reference src/api/app.py:94-97
  F4  25 MB size guard            reference src/api/app.py:54-59
  S8  file-type whitelist + utf-8 content sniff  src/api/app.py:291-310
  K2  duplicate-filename skip     reference src/api/app.py:103-104
  F1  chunk-validation semi-join  reference src/worker/worker.py:156-172
"""

from __future__ import annotations

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
