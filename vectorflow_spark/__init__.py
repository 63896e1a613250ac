"""vectorflow_spark — a PySpark-native engine with the query and
data-processing capabilities of dgarnitz/vectorflow (reference at
/root/reference, studied for behavior only).

Design stance (SURVEY.md §7): DataFrames in/out everywhere; the pipeline is a
composition of pure stage functions ``DataFrame -> DataFrame``; external
effects only in readers and ``foreachPartition`` writers; deterministic
content ids make every write idempotent; custom logic is confined to pandas
UDFs / ``mapInPandas`` / ``foreachPartition`` — no RDDs, no driver-side loops.
"""

from vectorflow_spark.config import PipelineConfig
from vectorflow_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]
__version__ = "0.1.0"
