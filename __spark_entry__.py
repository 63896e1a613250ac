"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end pipeline; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with its
DuckDB oracle (see vectorflow_spark/queries.py for the definitions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full vectorflow pipeline on sf0.001 documents —
    scan -> validity filters -> char-chunk (built-ins) -> uuid5 ids ->
    deterministic embed (mapInPandas) -> canonical sink projection."""
    from vectorflow_spark.config import ChunkStrategy, PipelineConfig
    from vectorflow_spark.pipeline import run_pipeline

    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.EXACT_BY_CHARACTERS,
        chunk_size=512,
        chunk_overlap=256,
        embeddings_type="deterministic",
        embedding_dim=64,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return run_pipeline(docs, cfg)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vectorflow_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from vectorflow_spark.queries import ORACLE

    return dict(ORACLE)
