"""Driver-contract queries: Spark DataFrame builders + DuckDB oracle SQL.

Every operator from SURVEY.md §2 marked [oracle: q_*] is declared here as a
pair: a callable ``(spark, sf_dir) -> DataFrame`` in ``QUERIES`` and the
equivalent ANSI SQL for DuckDB in ``ORACLE`` (omitted for rows-only checks).
``__spark_entry__.py`` re-exports both dicts.

Correctness discipline (learned from engine-vs-engine hash matching):
  * every computed column is aliased identically on both sides;
  * double AGGREGATES are computed exactly via DECIMAL casts and converted
    back to double at the end — Spark and DuckDB sum doubles in different
    orders, so a raw SUM(double) is not bit-reproducible, but a decimal sum
    is exact on both engines and converts to the identical double;
  * per-row float folds (array dot products) accumulate sequentially in
    double on both engines — bit-identical without rounding; scores are
    still rounded to 9 decimals to absorb any engine-side fold quirk;
  * integer/string outputs are preferred wherever the operator allows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectorflow_spark.config import ChunkStrategy, PipelineConfig
from vectorflow_spark.functions import tokenizer
from vectorflow_spark.functions.ids import content_id, uuid5_udf
from vectorflow_spark.operators import chunkers
from vectorflow_spark.operators.batching import batch_counts, minibatch_ids
from vectorflow_spark.operators.filters import (
    dedup_filenames,
    filter_nonempty,
    filter_valid_source,
    semi_join_valid,
    valid_source_predicate,
)
from vectorflow_spark.operators.rollup import job_rollup

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


# Session-lifetime schema + base-DataFrame cache for the read-only driver
# tables, keyed by (path, mtime_ns, size) so a changed file can never serve
# a stale schema. spark.read.parquet() re-infers the schema from the footer
# on EVERY call (~90 ms driver-side at any scale); an explicit
# read.schema() skips that, and reusing the resulting immutable DataFrame
# OBJECT skips the remaining ~15-20 ms of DataSource resolution per read
# (r12 — 286 reader constructions per suite pass). This caches file
# METADATA and the lazy plan handle only — rows are still scanned from
# parquet on every action — the same class as Spark's own FileStatusCache,
# and the local stand-in for the manifest catalog (Iceberg/Delta) a 100 TB
# table would use to avoid per-query footer reads (guide §6). The cache
# key includes the session id: a new SparkSession cannot be served a
# DataFrame bound to a stopped one.
_SCHEMA_CACHE: dict = {}
_DF_CACHE: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str, split: bool = False) -> DataFrame:
    """Read a driver table. ``split=True`` repartitions to the session's
    parallelism: the testdata parquet files are single-row-group (one scan
    partition), so any compute-heavy projection downstream would otherwise
    run on one core. This mirrors the real-cluster discipline of sizing
    partitions for CPU-bound stages rather than scan bytes; the shuffle
    moves ~MBs locally and is dwarfed by the work it parallelizes."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        import stat as _stat

        st = os.stat(path)
        # cache only single-FILE tables: for a directory of part files
        # (standard Spark write layout) an in-place part rewrite changes
        # neither the dir mtime nor size, so a stale schema could be
        # served (r11 ADVICE item 5). The driver tables are all single
        # files; anything else just skips the cache.
        key = (path, st.st_mtime_ns, st.st_size) if _stat.S_ISREG(st.st_mode) else None
    except OSError:
        key = None
    df_key = (
        (key, spark.sparkContext.applicationId, name) if key is not None else None
    )
    df = _DF_CACHE.get(df_key) if df_key is not None else None
    if df is None:
        schema = _SCHEMA_CACHE.get(key) if key is not None else None
        if schema is not None:
            df = spark.read.schema(schema).parquet(path)
        else:
            df = spark.read.parquet(path)
            if key is not None:
                _SCHEMA_CACHE[key] = df.schema
        if name == "events":
            # events.ts arrives as parquet timestamp (read as TIMESTAMP_NTZ);
            # every consumer here does integer time arithmetic, so present it
            # uniformly as epoch NANOS (bigint). The session timezone is UTC,
            # so the ntz->timestamp cast is value-preserving, and the *1000
            # matches DuckDB's epoch_ns() on the same micro-precision values.
            df = df.withColumn(
                "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("bigint")
            )
        if df_key is not None:
            _DF_CACHE[df_key] = df
    if split:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def query(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # A duplicate registration silently replaces the earlier gate in
        # both QUERIES and ORACLE — that cost q_weighted_subsample its
        # oracle for two rounds (r11 verdict item 1). Fail loudly instead.
        assert name not in QUERIES, f"duplicate query registration: {name}"
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


