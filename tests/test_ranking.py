"""Distributed global ranking (operators/ranking.py).

The reference has no ranking operator (SURVEY.md §2.12 — no windows at
all); this is engine-surface extension. The invariants that matter:

- global_row_number equals the single-partition window's row_number for a
  total order, regardless of partition count;
- equidepth_bins puts every row in exactly one of k bins whose sizes
  differ by at most 1, in rank order;
- the plan contains NO un-partitioned window over the data (the whole
  point: a global window collapses 100 TB into one task).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vectorflow_spark.operators.ranking import equidepth_bins, global_row_number


@pytest.fixture(scope="module")
def df(spark):
    # values deliberately unsorted + duplicated; (v, id) is the total order
    return spark.range(0, 2003).select(
        F.col("id"), ((F.col("id") * 37) % 101).alias("v")
    )


def test_global_row_number_matches_global_window(spark, df):
    got = global_row_number(df, ["v", "id"], num_partitions=7)
    w = Window.orderBy("v", "id")
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_global_row_number_is_dense_permutation(df):
    rns = [r.rn for r in global_row_number(df, ["v", "id"]).select("rn").collect()]
    assert sorted(rns) == list(range(1, 2004))


def test_equidepth_bin_sizes_and_order(df):
    k = 10
    out = equidepth_bins(df, ["v", "id"], k=k)
    sizes = {r.bin: r.n for r in out.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(range(1, k + 1))
    # 2003 rows over 10 bins: every bin 200 or 201 rows
    assert all(s in (200, 201) for s in sizes.values())
    assert sum(sizes.values()) == 2003
    # bins are contiguous in rank order: max key of bin i < min key of bin i+1
    bounds = (
        out.groupBy("bin")
        .agg(F.min(F.struct("v", "id")).alias("lo"), F.max(F.struct("v", "id")).alias("hi"))
        .orderBy("bin")
        .collect()
    )
    for a, b in zip(bounds, bounds[1:]):
        assert (a.hi.v, a.hi.id) < (b.lo.v, b.lo.id)


def test_no_unpartitioned_window_over_data(df):
    # the only un-partitioned window allowed is over the numPartitions-row
    # offsets table; the data-bearing window must be keyed on _pid. Check
    # the optimized plan: every Window node's partition spec is non-empty
    # except ones feeding from a tiny Aggregate (the offsets path).
    plan = global_row_number(df, ["v", "id"])._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"Window \[.*?windowspecdefinition\((.*?)\)", plan):
        spec = m.group(1)
        # spec args before the ORDER BY sort orders: partition cols. The
        # data window partitions by _pid; the offsets window orders by _pid
        # over an Aggregate input — distinguishable by the rowsBetween
        # frame on sum(_cnt).
        if "sum" in spec or "_cnt" in m.group(0):
            continue
        assert "_pid" in spec, f"un-partitioned data window in plan: {m.group(0)[:200]}"


def test_reliable_checkpoint_matches_local(spark, df, tmp_path):
    """The spark.vectorflow.reliableCheckpoint switch (r11 verdict item 7)
    must produce ranks identical to the default localCheckpoint pin."""
    base = sorted(
        map(tuple, global_row_number(df, ["v", "id"], "rn").collect())
    )
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set("spark.vectorflow.reliableCheckpoint", "true")
    try:
        reliable = sorted(
            map(tuple, global_row_number(df, ["v", "id"], "rn").collect())
        )
    finally:
        spark.conf.set("spark.vectorflow.reliableCheckpoint", "false")
    assert base == reliable


def test_n_col_attaches_exact_total(df):
    """n_col (r12) must equal the exact row count on every row, and the
    rank column must be unchanged vs the plain call."""
    out = global_row_number(df, ["v", "id"], out_col="rn", n_col="n", num_partitions=7)
    rows = out.select("rn", "n").collect()
    assert all(r.n == 2003 for r in rows)
    assert sorted(r.rn for r in rows) == list(range(1, 2004))


def test_equidepth_plan_has_single_pin_scan(df):
    """equidepth_bins (r12) derives n from the operator's own counts
    table: the optimized plan must not re-scan the ranked frame for a
    separate global count (exactly one LogicalRDD pin consumer tree)."""
    plan = (
        equidepth_bins(df, ["v", "id"], k=10)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # one pin feeds the row side, one feeds the tiny counts agg: 2 refs.
    assert plan.count("LogicalRDD") <= 2
