from vectorflow_spark.sinks.writers import to_vector_records, write_vectors

__all__ = ["to_vector_records", "write_vectors"]
