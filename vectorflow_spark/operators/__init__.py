from vectorflow_spark.operators.chunkers import chunk

__all__ = ["chunk"]
