from vectorflow_spark.sources.readers import extract_documents, read_raw_files

__all__ = ["extract_documents", "read_raw_files"]
