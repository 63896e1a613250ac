"""Bucketed-table co-located joins — the shuffle-elimination pattern for
repeated large-large joins at 100 TB.

A fact table re-joined on the same key every run (orders <-> lineitem,
chunks <-> embeddings) pays a full shuffle per run unless both sides are
written bucketed by that key: then each bucket pairs 1:1 and the sort-merge
join runs with NO Exchange on either side. Locally the tables are tiny; the
assertion is on the plan, which is what scales.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # session-shared warehouse: use unique names, drop at teardown
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bkt_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("bkt_lineitem")
    )
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Both sides bucketed on the join key with equal bucket counts: the
    sort-merge join must read buckets pairwise — zero shuffle exchanges."""
    ot, lt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = (
            spark.table(lt)
            .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # the join itself must consume bucketed scans directly: no shuffle
        # between the join and either scan
        below_join = plan.split("SortMergeJoin")[-1]
        assert "Exchange hashpartitioning" not in below_join, plan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucket_pruning_on_key_filter(spark, bucketed_tables):
    """A point filter on the bucket key scans only that key's bucket —
    1 of 8 — the file-level analog of partition pruning."""
    ot, _ = bucketed_tables
    key = spark.table(ot).agg(F.min("o_orderkey")).collect()[0][0]
    # the planner auto-disables bucketed scans when no join would benefit;
    # force it on so the pruning path is observable on a bare filter
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(ot).filter(F.col("o_orderkey") == key)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert df.count() >= 1
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
