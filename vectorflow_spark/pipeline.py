"""The end-to-end pipeline: documents -> chunks -> vectors -> sink records.

This is the reference's whole 4-stage dataflow (extract -> split -> chunk ->
embed -> upload, SURVEY.md §3) collapsed into ONE declarative Spark plan.
There are no queue hops and no control-plane rendezvous: Catalyst sees the
entire lineage, so filter pushdown and column pruning reach the parquet scan,
and chunk+embed run fused in the same stage (no shuffle between them —
order preservation is positional within rows, SURVEY.md §4.3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from vectorflow_spark.config import PipelineConfig
from vectorflow_spark.embed.backends import embed
from vectorflow_spark.operators.chunkers import chunk
from vectorflow_spark.operators.filters import filter_max_size, filter_nonempty
from vectorflow_spark.sinks.writers import to_vector_records


def run_pipeline(documents: DataFrame, cfg: PipelineConfig, text_col: str = "text", doc_col: str = "source") -> DataFrame:
    """documents(doc_id, text, source, ...) -> (id, source_data,
    source_document, embeddings) ready for any U1-U5 writer.

    One repartition sits between the (pushed-down) filters and the chunk+
    embed stages: scan partitions are sized for I/O bytes, but chunking and
    embedding are CPU-bound per document, so partition count must track
    cores, not input size — the Spark analog of the reference's 1000-line
    batch fan-out (SURVEY.md §2.2 P1/P2)."""
    docs = filter_max_size(filter_nonempty(documents, text_col), text_col, cfg.max_file_size_bytes)
    sc = documents.sparkSession.sparkContext
    docs = docs.repartition(sc.defaultParallelism)
    chunks = chunk(docs, cfg, text_col=text_col)
    vectors = embed(chunks, cfg, text_col="text")
    return to_vector_records(vectors, doc_col=doc_col)
