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

    m, base, _, sid = T._next(root)
    table_append(_df(spark, 10, 20), root)  # B lands snapshot 2
    m["snapshots"].append(
        {"id": sid, "parent": base["id"], "operation": "append", "added": [], "removed": []}
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


# --- merge / txn append / streaming sink ---


def test_merge_updates_and_inserts(spark, root):
    from vectorflow_spark.sources.table import table_merge

    table_create(_df(spark, 0, 100).coalesce(1), root)
    table_append(_df(spark, 100, 200).coalesce(1), root)
    # merge 1: updates confined to keys 10..19 — the 100..199 file lies
    # outside the update key range, so it must carry forward BY REFERENCE
    ups = spark.range(10, 20).select(F.col("id").alias("k"), F.lit(-1).alias("v"))
    table_merge(spark, root, ups, "k")
    rows = {r.k: r.v for r in table_read(spark, root).collect()}
    assert len(rows) == 200
    assert all(rows[k] == -1 for k in range(10, 20))
    assert rows[5] == 50 and rows[150] == 1500  # untouched
    paths = {f["path"] for f in table_files(root)}
    prev = {f["path"] for f in table_files(root, snapshot=2)}
    assert prev & paths, "file outside the update key range must carry by reference"
    # merge 2: pure inserts (new keys) appear alongside everything else
    ins = spark.range(500, 505).select(F.col("id").alias("k"), F.lit(-2).alias("v"))
    table_merge(spark, root, ins, "k")
    rows = {r.k: r.v for r in table_read(spark, root).collect()}
    assert len(rows) == 205
    assert all(rows[k] == -2 for k in range(500, 505))
    assert all(rows[k] == -1 for k in range(10, 20))


def test_txn_append_is_idempotent(spark, root):
    from vectorflow_spark.sources.table import committed_txns, table_append_txn

    table_create(_df(spark, 0, 10), root)
    s = table_append_txn(_df(spark, 10, 20), root, "batch-7")
    assert s == 2
    # replay: same txn token -> no-op, no double rows
    assert table_append_txn(_df(spark, 10, 20), root, "batch-7") is None
    assert table_read(spark, root).count() == 20
    assert committed_txns(root) == {"batch-7"}


def test_streaming_sink_exactly_once_with_compaction(spark, tmp_path):
    import json as _json

    from vectorflow_spark.sources.table import (
        streaming_table_sink,
        table_files,
        table_read,
        table_snapshots,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    for fno in range(4):
        with open(inp / f"f{fno}.json", "w") as f:
            for i in range(25):
                f.write(_json.dumps({"k": fno * 25 + i, "v": i}) + "\n")
    root = str(tmp_path / "stbl")
    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = streaming_table_sink(stream, root, str(tmp_path / "ckpt"), compact_every=2)
    q.awaitTermination(120)
    assert table_read(spark, root).count() == 100
    ops = [s["operation"] for s in table_snapshots(root)]
    assert ops[0] == "create" and "compact" in ops
    # replayed batch id -> absorbed by the txn token
    from vectorflow_spark.sources.table import table_append_txn

    assert table_append_txn(
        spark.read.schema("k long, v long").json(str(inp / "f1.json")), root, "stream-batch-1"
    ) is None
    assert table_read(spark, root).count() == 100


# --- clustering / snapshot expiry ---


def test_cluster_tightens_pruning_on_both_columns(spark, root):
    from vectorflow_spark.sources.table import table_cluster

    # ingest order scatters k2: every file spans the whole k2 range
    df = spark.range(0, 4096).select(
        F.col("id").alias("k1"), ((F.col("id") * 2654435761) % 4096).alias("k2")
    )
    table_create(df.repartition(8), root)
    before_k2 = plan_files(root, [("k2", "between", (0, 63))])[1]
    assert before_k2 == 0  # nothing prunable: hash-scattered ingest
    table_cluster(spark, root, ["k1", "k2"], n_files=8)
    # after z-order clustering, a narrow predicate on EITHER column prunes.
    # repartitionByRange SAMPLES split points, so the exact pruned count
    # wobbles run-to-run (observed 3-5 of 8) — assert the property
    # (pruning exists where there was none), not a sampled boundary.
    _, pruned_k1 = plan_files(root, [("k1", "between", (0, 63))])
    _, pruned_k2 = plan_files(root, [("k2", "between", (0, 63))])
    assert pruned_k1 >= 2 and pruned_k2 >= 2
    # content identical
    got = sorted(r.k1 for r in table_read(spark, root).collect())
    assert got == list(range(4096))


def test_expire_snapshots_gc_and_history_bound(spark, root):
    from vectorflow_spark.sources.table import table_expire_snapshots

    table_create(_df(spark, 0, 50).coalesce(1), root)
    table_append(_df(spark, 50, 100).coalesce(1), root)
    table_delete_where(spark, root, "k < 25", predicates=[("k", "<", 25)])
    n_data = len(os.listdir(os.path.join(root, "data")))
    expired, removed = table_expire_snapshots(root, keep=1)
    assert expired == [1, 2]
    # snapshot 1's original 0..49 file was rewritten by the delete -> gone
    assert removed >= 1
    assert len(os.listdir(os.path.join(root, "data"))) == n_data - removed
    # current snapshot unaffected; deep time travel now refuses
    assert table_read(spark, root).count() == 75
    with pytest.raises(KeyError):
        table_read(spark, root, snapshot=1)


def test_expire_gc_spares_all_referenced_files(spark, root):
    from vectorflow_spark.sources.table import table_expire_snapshots

    table_create(_df(spark, 0, 40).coalesce(1), root)
    table_append(_df(spark, 40, 80).coalesce(1), root)
    # keep both snapshots: nothing may be deleted
    expired, removed = table_expire_snapshots(root, keep=2)
    assert expired == [] and removed == 0
    assert table_read(spark, root, snapshot=1).count() == 40


# --- schema evolution / incremental changes ---


def test_add_column_is_metadata_only_and_reads_null_backfilled(spark, root):
    from vectorflow_spark.sources.table import (
        table_add_column,
        table_read_evolved,
    )

    table_create(_df(spark, 0, 10).coalesce(1), root)
    files_before = {f["path"] for f in table_files(root)}
    table_add_column(root, "score", "double")
    assert {f["path"] for f in table_files(root)} == files_before  # no rewrite
    # old rows read the new column as typed NULL
    df = table_read_evolved(spark, root)
    assert dict(df.dtypes)["score"] == "double"
    assert df.filter("score IS NULL").count() == 10
    # new appends carry values; old files still backfill
    table_append(
        spark.range(10, 15).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
            F.lit(0.5).alias("score"),
        ),
        root,
    )
    df = table_read_evolved(spark, root)
    assert df.count() == 15
    assert df.filter("score IS NULL").count() == 10
    assert df.filter("score = 0.5").count() == 5
    # duplicate add refuses
    with pytest.raises(ValueError):
        table_add_column(root, "score", "double")


def test_changes_between_append_snapshots(spark, root):
    from vectorflow_spark.sources.table import table_changes

    table_create(_df(spark, 0, 10).coalesce(1), root)
    table_append(_df(spark, 10, 30).coalesce(1), root)
    table_append(_df(spark, 30, 35).coalesce(1), root)
    got = sorted(r.k for r in table_changes(spark, root, from_snapshot=1).collect())
    assert got == list(range(10, 35))
    got2 = sorted(r.k for r in table_changes(spark, root, 2, 3).collect())
    assert got2 == list(range(30, 35))
    assert table_changes(spark, root, 3, 3).count() == 0


def test_changes_refuse_across_rewrites(spark, root):
    from vectorflow_spark.sources.table import table_changes

    table_create(_df(spark, 0, 10).coalesce(1), root)
    table_delete_where(spark, root, "k < 3", predicates=[("k", "<", 3)])
    table_append(_df(spark, 10, 12).coalesce(1), root)
    with pytest.raises(ValueError, match="rewrite"):
        table_changes(spark, root, from_snapshot=1)
    # a range that skips the rewrite is fine
    got = sorted(r.k for r in table_changes(spark, root, 2, 3).collect())
    assert got == [10, 11]


# --- review-pass regression tests (r11 self-review findings) ---


def test_streaming_create_batch_replay_is_absorbed(spark, root):
    """Batch 0 creates the table; its txn token must land in the create
    snapshot so a replayed first batch no-ops instead of re-appending."""
    from vectorflow_spark.sources.table import committed_txns, table_append_txn

    table_create(_df(spark, 0, 10), root, txn="stream-batch-0")
    assert committed_txns(root) == {"stream-batch-0"}
    assert table_append_txn(_df(spark, 0, 10), root, "stream-batch-0") is None
    assert table_read(spark, root).count() == 10


def test_decimal_columns_get_no_stats(spark, root):
    """DECIMAL stats surface as unscaled physical ints; keeping them
    would mis-prune COW deletes/merges — they must be dropped so the
    column is always-overlapping (conservative)."""
    df = spark.range(0, 10).select(
        F.col("id").alias("k"),
        (F.col("id") * 100).cast("decimal(15,2)").alias("price"),
    )
    table_create(df.coalesce(1), root)
    [f] = table_files(root)
    assert "price" not in f["stats"]
    assert f["stats"]["k"] == [0, 9]
    # and therefore a price predicate prunes nothing
    keep, pruned = plan_files(root, predicates=[("price", "<", 1)])
    assert pruned == 0 and len(keep) == 1


def test_changes_allowed_across_add_column(spark, root):
    from vectorflow_spark.sources.table import table_add_column, table_changes

    table_create(_df(spark, 0, 5).coalesce(1), root)
    table_add_column(root, "score", "double")
    table_append(
        spark.range(5, 8).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"), F.lit(1.0).alias("score")
        ).coalesce(1),
        root,
    )
    got = sorted(r.k for r in table_changes(spark, root, from_snapshot=1).collect())
    assert got == [5, 6, 7]


def test_expire_gc_spares_in_flight_staged_files(spark, root):
    """A concurrent writer moves files into data/ BEFORE its manifest
    commit under snapshot id current+1; the vacuum must not unlink
    them."""
    from vectorflow_spark.sources.table import table_expire_snapshots

    table_create(_df(spark, 0, 10).coalesce(1), root)
    table_append(_df(spark, 10, 20).coalesce(1), root)
    inflight = os.path.join(root, "data", "s00003-00000-deadbeef.parquet")
    with open(inflight, "wb") as f:
        f.write(b"staged-by-in-flight-writer")
    _, removed = table_expire_snapshots(root, keep=1)
    assert os.path.exists(inflight), "in-flight staging must survive the vacuum"
    assert removed == 0  # snapshot 2 references every committed file


def test_concurrent_create_cannot_clobber(spark, root):
    """_commit with expected_parent=None is atomic-exclusive: the loser
    of a create race gets FileExistsError, never a silent overwrite."""
    from vectorflow_spark.sources import table as T

    table_create(_df(spark, 0, 5), root)
    with pytest.raises(FileExistsError):
        T._commit(root, {"format_version": 1, "current": 1, "snapshots": []}, None)
    assert table_read(spark, root).count() == 5  # winner intact


def test_manifest_stores_deltas_not_cumulative_lists(spark, root):
    import json

    from vectorflow_spark.sources import table as T

    table_create(_df(spark, 0, 10).coalesce(1), root)
    for i in range(4):
        table_append(_df(spark, 10 * (i + 1), 10 * (i + 2)).coalesce(1), root)
    m = json.load(open(T._manifest_path(root)))
    snaps = sorted(m["snapshots"], key=lambda s: s["id"])
    assert "files" in snaps[0] and len(snaps[0]["files"]) == 1
    for s in snaps[1:]:
        assert "files" not in s
        assert len(s["added"]) == 1 and s["removed"] == []
    # reconstruction still yields the cumulative view
    assert len(table_files(root)) == 5
    assert len(table_files(root, snapshot=3)) == 3


def test_sync_provider_merge_outside_window_and_expired_history(spark, tmp_path):
    from vectorflow_spark.sources.syncsource import TableChangesSyncProvider
    from vectorflow_spark.sources.table import (
        table_expire_snapshots,
        table_merge,
    )

    root = str(tmp_path / "tbl3")
    table_create(_df(spark, 0, 5).coalesce(1), root)
    table_append(_df(spark, 5, 9).coalesce(1), root)
    prov = TableChangesSyncProvider(root, "k long, v long", ["k", "v"])
    items = prov.list_range(None, None)
    assert len(items) == 2
    hi = items[-1]["cursor"]
    # a merge lands AFTER the committed window: replaying the committed
    # range must still work (the raise is window-scoped)
    table_merge(spark, root, _df(spark, 100, 102).coalesce(1), "k")
    replay = prov.list_range(None, hi)
    assert [i["cursor"] for i in replay] == [i["cursor"] for i in items]
    # ...but listing INTO the merge still refuses
    with pytest.raises(ValueError, match="merge"):
        prov.list_range(hi, None)
    # retention truncates history below the committed cursor -> loud stop
    table_expire_snapshots(root, keep=1)
    with pytest.raises(ValueError, match="retained history"):
        prov.list_range(items[0]["cursor"], None)
