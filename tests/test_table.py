"""vf_table snapshot-isolation table format (sources/table.py):
atomic snapshots, time travel, copy-on-write delete, compaction,
manifest-side stats pruning, and optimistic-concurrency conflicts."""

import os

import pyspark.sql.functions as F
import pytest

from vectorflow_spark.sources.table import (
    ConflictError,
    plan_files,
    table_append,
    table_compact,
    table_create,
    table_delete_where,
    table_files,
    table_read,
    table_snapshots,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def test_create_append_time_travel(spark, root):
    s1 = table_create(_df(spark, 0, 100), root)
    s2 = table_append(_df(spark, 100, 250), root)
    assert (s1, s2) == (1, 2)
    assert table_read(spark, root, snapshot=1).count() == 100
    assert table_read(spark, root, snapshot=2).count() == 250
    assert table_read(spark, root).count() == 250  # current
    ops = [s["operation"] for s in table_snapshots(root)]
    assert ops == ["create", "append"]


def test_snapshot_isolation_under_concurrent_append(spark, root):
    table_create(_df(spark, 0, 50), root)
    pinned = table_read(spark, root, snapshot=1)  # reader resolves snapshot 1
    table_append(_df(spark, 50, 90), root)
    # the pinned frame still sees exactly snapshot 1's rows
    assert pinned.count() == 50
    assert table_read(spark, root).count() == 90


def test_delete_where_copy_on_write(spark, root):
    table_create(_df(spark, 0, 100), root)
    table_append(_df(spark, 100, 200), root)
    before = {f["path"] for f in table_files(root)}
    sid = table_delete_where(
        spark, root, "k >= 150", predicates=[("k", ">=", 150)]
    )
    got = sorted(r.k for r in table_read(spark, root).collect())
    assert got == list(range(150))
    # files with k-range entirely below 150 were carried by reference
    after = {f["path"] for f in table_files(root)}
    assert before & after, "untouched files must carry forward, not rewrite"
    # time travel still sees the pre-delete rows
    assert table_read(spark, root, snapshot=sid - 1).count() == 200


def test_delete_to_empty_drops_files(spark, root):
    table_create(_df(spark, 0, 10), root)
    table_delete_where(spark, root, "k >= 0")
    assert table_files(root) == []
    assert table_read(spark, root, snapshot=1).count() == 10  # history intact


def test_compact_preserves_rows_and_shrinks_file_count(spark, root):
    table_create(_df(spark, 0, 10).repartition(8), root)
    for i in range(3):
        table_append(_df(spark, 10 * (i + 1), 10 * (i + 2)).repartition(4), root)
    n_before = len(table_files(root))
    before = sorted(map(tuple, table_read(spark, root).collect()))
    table_compact(spark, root, target_bytes=64 * 1024 * 1024)
    after = sorted(map(tuple, table_read(spark, root).collect()))
    assert after == before
    assert len(table_files(root)) < n_before
    assert len(table_files(root)) == 1  # everything small -> one file


def test_stats_pruning_skips_files(spark, root):
    # 4 appends with disjoint key ranges -> disjoint file stats
    table_create(_df(spark, 0, 100).coalesce(1), root)
    for lo in (100, 200, 300):
        table_append(_df(spark, lo, lo + 100).coalesce(1), root)
    keep, pruned = plan_files(root, predicates=[("k", "between", (250, 260))])
    assert pruned == 3 and len(keep) == 1
    df = table_read(spark, root, predicates=[("k", "between", (250, 260))])
    got = sorted(r.k for r in df.filter("k between 250 and 260").collect())
    assert got == list(range(250, 261))


def test_pruning_is_conservative_without_stats(spark, root):
    table_create(_df(spark, 0, 10).coalesce(1), root)
    keep, pruned = plan_files(root, predicates=[("no_such_col", "=", 5)])
    assert pruned == 0 and len(keep) == 1


def test_empty_prune_returns_empty_frame_with_schema(spark, root):
    table_create(_df(spark, 0, 10).coalesce(1), root)
    df = table_read(spark, root, predicates=[("k", ">", 10_000)])
    assert df.count() == 0
    assert df.columns == ["k", "v"]


def test_optimistic_concurrency_conflict(spark, root):
    import json

    table_create(_df(spark, 0, 10), root)
    # writer A resolves base snapshot 1... then writer B commits first
    from vectorflow_spark.sources import table as T

    m, base, sid = T._next(root)
    table_append(_df(spark, 10, 20), root)  # B lands snapshot 2
    m["snapshots"].append(
        {"id": sid, "parent": base["id"], "operation": "append", "files": base["files"]}
    )
    m["current"] = sid
    with pytest.raises(ConflictError):
        T._commit(root, m, expected_parent=base["id"])
    # table unharmed: B's commit is current
    assert table_read(spark, root).count() == 20


def test_create_refuses_existing_table(spark, root):
    table_create(_df(spark, 0, 5), root)
    with pytest.raises(FileExistsError):
        table_create(_df(spark, 0, 5), root)


def test_stats_match_own_footer_parser(spark, root):
    """The manifest's bounds come from OUR footer parser reading SPARK's
    writer output — assert they equal the true column extremes."""
    table_create(_df(spark, 7, 53).coalesce(1), root)
    [f] = table_files(root)
    assert f["stats"]["k"] == [7, 52]
    assert f["stats"]["v"] == [70, 520]
    assert f["rows"] == 46
