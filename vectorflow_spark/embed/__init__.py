from vectorflow_spark.embed.backends import embed

__all__ = ["embed"]
