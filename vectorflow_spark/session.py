"""SparkSession factory tuned for the vectorflow workload.

Local mode is a stand-in for a real cluster: every knob here is chosen so the
same code scales to many executors (AQE, arrow batching aligned with the
embedding minibatch size, skew handling for post-explode fat partitions —
SURVEY.md §4.2/§7 risk register).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size == the reference's OpenAI embedding minibatch
# (MAX_OPENAI_EMBEDDING_BATCH_SIZE, reference src/worker/config.py:2): each
# pandas-UDF batch is then exactly one API minibatch.
ARROW_BATCH_SIZE = 2048


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "vectorflow_spark", cpus: int | None = None) -> SparkSession:
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # one shuffle partition per core locally; on a real cluster this is
        # sized to (executors * cores); AQE coalesces the excess either way
        .config("spark.sql.shuffle.partitions", str(max(n, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (vf_warc prunes segment
        # partitions on warc_file and skips records on warc_type)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_SIZE))
        .config("spark.ui.enabled", "false")
        # single-JVM local mode: the driver heap IS the executor heap; sized
        # so 32 concurrent tasks + shuffle buffers never force full GCs
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
