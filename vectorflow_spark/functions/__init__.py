from vectorflow_spark.functions.ids import content_id, uuid5_udf
from vectorflow_spark.functions.vector import cosine_similarity, dot, l2_norm

__all__ = ["content_id", "uuid5_udf", "cosine_similarity", "dot", "l2_norm"]
