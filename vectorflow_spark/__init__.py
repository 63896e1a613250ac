"""vectorflow_spark — a PySpark-native engine with the query and
data-processing capabilities of dgarnitz/vectorflow (reference at
/root/reference, studied for behavior only).

Design stance (SURVEY.md §7): DataFrames in/out everywhere; the pipeline is a
composition of pure stage functions ``DataFrame -> DataFrame``; external
effects only in readers and ``foreachPartition`` writers; deterministic
content ids make every write idempotent; custom logic is confined to pandas
UDFs / ``mapInPandas`` / ``foreachPartition`` — no RDDs, no driver-side loops.
"""

from vectorflow_spark.config import ChunkStrategy, PipelineConfig
from vectorflow_spark.session import get_spark


def run_pipeline(documents, cfg, text_col: str = "text", doc_col: str = "source"):
    """Top-level convenience re-export: documents -> sink records (see
    vectorflow_spark.pipeline.run_pipeline). Imported lazily so
    ``import vectorflow_spark`` stays cheap for config-only callers."""
    from vectorflow_spark.pipeline import run_pipeline as _run

    return _run(documents, cfg, text_col=text_col, doc_col=doc_col)


__all__ = ["ChunkStrategy", "PipelineConfig", "get_spark", "run_pipeline"]
__version__ = "0.1.0"
