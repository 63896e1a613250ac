"""AQE skew-join handling — the config-level half of the skew story.

q_salted_join/q_salted_agg pin the EXPLICIT salting pattern (known,
extreme skew); this module proves the runtime fix the docstrings point
to: with adaptive execution on, a skewed sort-merge join partition is
split at runtime and the final plan carries the ``skew=true`` marker.
Together they close the loop: engineered salt for pathological keys,
AQE for everything the optimizer can see at runtime.

The skew thresholds are lowered to test scale (the detector needs the
skewed partition to exceed both 5x the median AND the byte threshold);
every touched conf is restored afterwards because the Spark session is
session-scoped.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_aqe_splits_skewed_join_partition(spark):
    """One key holds ~97% of the fact rows; with broadcast off the join
    must sort-merge, AQE detects the oversized partition and the executed
    plan shows SortMergeJoin(skew=true)."""
    n_hot, n_cold = 200_000, 2_000
    fact = (
        spark.range(n_hot + n_cold)
        .select(
            F.when(F.col("id") < n_hot, F.lit(7)).otherwise(F.col("id")).alias("k"),
            # INCOMPRESSIBLE payload: skew detection reads the map-output
            # statistics, which are compressed shuffle bytes — a constant
            # pad lz4-compresses ~200x and the hot partition never crosses
            # the byte threshold (found the hard way)
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
    )
    dim = spark.range(0, n_hot + n_cold, 1).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("attr")
    )
    with _confs(
        spark,
        **{
            "spark__sql__adaptive__enabled": "true",
            "spark__sql__adaptive__skewJoin__enabled": "true",
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "64KB",
            "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2.0",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "32KB",
            "spark__sql__adaptive__coalescePartitions__enabled": "false",
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__shuffle__partitions": "16",
        },
    ):
        joined = fact.join(dim, "k").select(F.sum(F.length("pad") + F.col("attr")).alias("s"))
        joined.collect()  # materialize so AQE finalizes the plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan


def test_salted_join_needs_no_skew_split(spark, sf_dir):
    """The engineered-salt twin under the same AQE configs: the salted
    join spreads the hot key by construction, so AQE finds nothing to
    split (no skew=true) and the result matches the unsalted oracle
    semantics (pinned separately by the q_salted_join oracle)."""
    import __spark_entry__ as entry

    q = entry.queries()["q_salted_join"]
    with _confs(
        spark,
        **{
            "spark__sql__adaptive__enabled": "true",
            "spark__sql__adaptive__skewJoin__enabled": "true",
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "64KB",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "32KB",
            "spark__sql__autoBroadcastJoinThreshold": "-1",
        },
    ):
        df = q(spark, sf_dir)
        rows = df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(rows) > 0
    assert "skew=true" not in plan, plan
