"""vf_sync streaming source contracts (sources/syncsource.py): the
watermark cursor as stream offset — incremental micro-batches, empty
triggers, commit pruning, batch-mode full refresh — plus the
GDrive/Salesforce provider adapters' window bounds."""

from __future__ import annotations

import json
import urllib.parse

import pytest

from vectorflow_spark.sources import syncsource
from vectorflow_spark.sources.syncsource import (
    GDriveSyncProvider,
    SalesforceSyncProvider,
    VfSyncStreamReader,
    provider_option,
)

# ---------------------------------------------------------------------------
# fake provider: listing reads a JSON file (the planning runs in a separate
# Python worker process, so in-memory state would be invisible there);
# fetch derives payloads from the item dict alone — stateless on executors
# ---------------------------------------------------------------------------


class FakeProvider:
    def __init__(self, store_path: str):
        self.store_path = store_path

    @staticmethod
    def schema() -> str:
        return "item_id string, payload string, cursor string"

    def list_range(self, after, upto):
        import json as j
        import pathlib as pl

        path = pl.Path(self.store_path)
        items = j.loads(path.read_text()) if path.exists() else []
        return [
            it
            for it in items
            if (after is None or it["cursor"] > after)
            and (upto is None or it["cursor"] <= upto)
        ]

    def fetch(self, items):
        for it in items:
            yield (it["id"], f"payload-{it['id']}", it["cursor"])


def _store(tmp_path, items):
    path = tmp_path / "items.json"
    path.write_text(json.dumps(items))
    return path


def _item(i: int, t: str) -> dict:
    return {"id": f"it-{i}", "cursor": t}


@pytest.fixture()
def sync_spark(spark):
    syncsource.register(spark)
    return spark


def test_stream_advances_with_cursor_and_never_refetches(sync_spark, tmp_path):
    items = [_item(0, "2026-01-01"), _item(1, "2026-01-02")]
    store = _store(tmp_path, items)
    opt = provider_option(FakeProvider(str(store)))
    batches: list[set] = []

    def sink(df, _bid):
        batches.append({(r.item_id, r.payload, r.cursor) for r in df.collect()})

    q = (
        sync_spark.readStream.format("vf_sync")
        .option("provider", opt)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        store.write_text(json.dumps(items + [_item(2, "2026-01-03")]))
        q.processAllAvailable()
        q.processAllAvailable()  # no new items -> no re-fetch
    finally:
        q.stop()
    seen = [b for b in batches if b]
    assert seen[0] == {
        ("it-0", "payload-it-0", "2026-01-01"),
        ("it-1", "payload-it-1", "2026-01-02"),
    }
    assert seen[1] == {("it-2", "payload-it-2", "2026-01-03")}
    assert len(seen) == 2  # exactly-once planning


def test_items_per_task_fans_out(sync_spark, tmp_path):
    store = _store(tmp_path, [_item(i, f"2026-02-{i + 1:02d}") for i in range(9)])
    npartitions: list[int] = []

    def sink(df, _bid):
        npartitions.append(df.rdd.getNumPartitions())
        df.collect()

    q = (
        sync_spark.readStream.format("vf_sync")
        .option("provider", provider_option(FakeProvider(str(store))))
        .option("itemsPerTask", "4")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert npartitions[0] == 3  # ceil(9 / 4)


def test_batch_mode_full_refresh(sync_spark, tmp_path):
    store = _store(tmp_path, [_item(i, f"2026-03-{i + 1:02d}") for i in range(5)])
    opt = provider_option(FakeProvider(str(store)))
    df = sync_spark.read.format("vf_sync").option("provider", opt).load()
    assert df.count() == 5


def test_bad_provider_option_refuses(sync_spark):
    with pytest.raises(Exception, match="not a provider_option"):
        sync_spark.read.format("vf_sync").option("provider", "ghost").load().count()
    with pytest.raises(Exception, match="requires .option"):
        sync_spark.read.format("vf_sync").load().count()


def test_stream_reader_recovery_relists_committed_window(tmp_path):
    # simulate a restart: fresh reader, checkpointed offsets passed in
    store = _store(tmp_path, [_item(i, f"2026-04-{i + 1:02d}") for i in range(4)])
    r = VfSyncStreamReader({"provider": provider_option(FakeProvider(str(store)))})
    assert r.initialOffset() == {"cursor": ""}
    # recovery: partitions() called for a window the pending cache never saw
    parts = r.partitions({"cursor": "2026-04-01"}, {"cursor": "2026-04-03"})
    items = [it for p in parts for it in p.items]
    assert [it["id"] for it in items] == ["it-1", "it-2"]
    # the incremental walk resumes past the recovered window
    assert r.latestOffset() == {"cursor": "2026-04-04"}
    parts = r.partitions({"cursor": "2026-04-03"}, {"cursor": "2026-04-04"})
    assert [it["id"] for p in parts for it in p.items] == ["it-3"]
    r.commit({"cursor": "2026-04-04"})
    assert r._pending == []


def test_commit_prunes_pending(tmp_path):
    store = _store(tmp_path, [_item(0, "a"), _item(1, "b")])
    r = VfSyncStreamReader({"provider": provider_option(FakeProvider(str(store)))})
    r.latestOffset()
    assert len(r._pending) == 2
    r.commit({"cursor": "a"})
    assert [it["id"] for it in r._pending] == ["it-1"]


# ---------------------------------------------------------------------------
# provider adapters: window bounds hit the wire correctly
# ---------------------------------------------------------------------------


def test_gdrive_provider_bounds_and_fetch():
    from vectorflow_spark.sources.connectors import GDriveConnector

    queries: list[str] = []

    def transport(method, url, headers, body):
        split = urllib.parse.urlsplit(url)
        params = dict(urllib.parse.parse_qsl(split.query))
        if split.path.endswith("/files"):
            queries.append(params["q"])
            files = [
                {"id": "f1", "name": "a", "mimeType": "text/plain", "modifiedTime": "2026-05-02T00:00:00Z"},
            ]
            return 200, {}, json.dumps({"files": files}).encode()
        return 200, {}, b"bytes-" + split.path.split("/")[-1].encode()

    gd = GDriveConnector("t", transport=transport, sleep=lambda s: None)
    p = GDriveSyncProvider(gd, folder_id="fold")
    items = p.list_range("2026-05-01T00:00:00Z", "2026-05-03T00:00:00Z")
    assert queries == [
        "trashed = false and 'fold' in parents "
        "and modifiedTime > '2026-05-01T00:00:00Z' "
        "and modifiedTime <= '2026-05-03T00:00:00Z'"
    ]
    (row,) = list(p.fetch(items))
    assert row[0] == "f1" and row[3] == "media" and row[4] == b"bytes-f1"
    assert row[7] == "2026-05-02T00:00:00Z"  # cursor column


def test_salesforce_provider_bounds_and_fetch():
    from vectorflow_spark.sources.connectors import SalesforceConnector

    soqls: list[str] = []

    def transport(method, url, headers, body):
        split = urllib.parse.urlsplit(url)
        params = dict(urllib.parse.parse_qsl(split.query))
        if split.path.endswith("/query"):
            soqls.append(params["q"])
            recs = [{"Id": "001", "SystemModstamp": "2026-06-02T00:00:00.000+0000"}]
            return 200, {}, json.dumps({"done": True, "records": recs}).encode()
        ids = params["ids"].split(",")
        return 200, {}, json.dumps(
            [{"attributes": {}, "Id": i, "Name": f"n-{i}"} for i in ids]
        ).encode()

    sf = SalesforceConnector("https://x", "t", transport=transport, sleep=lambda s: None)
    p = SalesforceSyncProvider(sf, "Doc", ["Id", "Name"])
    items = p.list_range("2026-06-01T00:00:00.000+0000", "2026-06-03T00:00:00.000+0000")
    assert soqls == [
        "SELECT Id, SystemModstamp FROM Doc "
        "WHERE SystemModstamp > 2026-06-01T00:00:00.000+0000 "
        "AND SystemModstamp <= 2026-06-03T00:00:00.000+0000 ORDER BY SystemModstamp"
    ]
    (row,) = list(p.fetch(items))
    assert row[0] == "001" and json.loads(row[1]) == {"Id": "001", "Name": "n-001"}
    assert row[3] == "2026-06-02T00:00:00.000+0000"
    # unbounded start: no WHERE
    p.list_range(None, None)
    assert soqls[-1] == "SELECT Id, SystemModstamp FROM Doc ORDER BY SystemModstamp"


class TestAvroDirProvider:
    """AvroDirSyncProvider: an avro drop-zone directory tailed as a
    vf_sync stream — new rename-committed files arrive in later
    micro-batches exactly once; malformed files yield error rows."""

    def _write(self, path, ids, mtime=None):
        import os

        from vectorflow_spark.sources.avromini import encode_avro

        blob = encode_avro(
            {"doc_id": ids, "text": [f"t{v}" for v in ids]},
            {"doc_id": "i64", "text": "str"},
        )
        tmp = str(path) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, str(path))  # the rename-commit producers must use
        if mtime is not None:
            os.utime(str(path), (mtime, mtime))

    def test_stream_tails_directory_exactly_once(self, sync_spark, tmp_path):
        from vectorflow_spark.sources.syncsource import AvroDirSyncProvider

        land = tmp_path / "land"
        land.mkdir()
        self._write(land / "a.avro", [1, 2], mtime=1_000_000.0)
        prov = AvroDirSyncProvider(
            str(land), "doc_id long, text string", ["doc_id", "text"]
        )
        opt = syncsource.provider_option(prov)
        batches: list[set] = []

        def sink(df, _bid):
            batches.append({(r.doc_id, r.text, r._error) for r in df.collect()})

        q = (
            sync_spark.readStream.format("vf_sync")
            .option("provider", opt)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            self._write(land / "b.avro", [3], mtime=2_000_000.0)
            (land / "broken.avro").write_bytes(b"Obj\x01garbage")
            import os

            os.utime(str(land / "broken.avro"), (3_000_000.0, 3_000_000.0))
            q.processAllAvailable()
            q.processAllAvailable()  # nothing new -> no refetch
        finally:
            q.stop()
        seen = [b for b in batches if b]
        assert seen[0] == {(1, "t1", None), (2, "t2", None)}
        assert {(d, t) for d, t, e in seen[1] if e is None} == {(3, "t3")}
        errors = [e for b in seen for _, _, e in b if e is not None]
        assert len(errors) == 1 and "AvroError" in errors[0]
        assert len(seen) == 2

    def test_late_rename_of_old_file_is_not_skipped(self, tmp_path):
        """r10 ADVICE (medium): rename(2) does NOT update mtime, so a file
        whose last WRITE predates the committed cursor but which is
        renamed into the drop zone afterwards must still be listed. The
        cursor uses max(mtime, ctime) — ctime is bumped by the rename —
        so the late arrival sorts above the committed watermark."""
        from vectorflow_spark.sources.syncsource import AvroDirSyncProvider

        land = tmp_path / "land3"
        land.mkdir()
        self._write(land / "a.avro", [1])
        prov = AvroDirSyncProvider(
            str(land), "doc_id long, text string", ["doc_id", "text"]
        )
        first = prov.list_range(None, None)
        assert [i["path"].endswith("a.avro") for i in first] == [True]
        committed = max(i["cursor"] for i in first)

        # a slow producer: file fully written LONG ago (stale mtime via
        # utime — the same effect as a write that finished before the
        # cursor advanced), rename-committed only now
        self._write(land / "late.avro", [2], mtime=1_000.0)
        newly = prov.list_range(committed, None)
        assert [i["path"].endswith("late.avro") for i in newly] == [True], (
            "late-renamed file with stale mtime was skipped — cursor must "
            "use max(mtime, ctime)"
        )

    def test_batch_mode_reads_everything(self, sync_spark, tmp_path):
        from vectorflow_spark.sources.syncsource import AvroDirSyncProvider

        land = tmp_path / "land2"
        land.mkdir()
        self._write(land / "a.avro", [1, 2])
        self._write(land / "b.avro", [3])
        prov = AvroDirSyncProvider(
            str(land), "doc_id long, text string", ["doc_id", "text"]
        )
        df = (
            sync_spark.read.format("vf_sync")
            .option("provider", syncsource.provider_option(prov))
            .load()
        )
        assert sorted(r.doc_id for r in df.collect()) == [1, 2, 3]
        assert all(r._file.endswith(".avro") for r in df.collect())


class TestTableChangesSync:
    """TableChangesSyncProvider: a vf_table tailed as a change-feed
    stream — append snapshots arrive exactly once across micro-batches,
    rewrite snapshots contribute nothing, merges fail loudly."""

    def _mk(self, spark, root, lo, hi):
        import pyspark.sql.functions as F

        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ).coalesce(1)

    def test_stream_tails_appends_exactly_once(self, sync_spark, tmp_path):
        from vectorflow_spark.sources.syncsource import TableChangesSyncProvider
        from vectorflow_spark.sources.table import table_append, table_create

        root = str(tmp_path / "tbl")
        table_create(self._mk(sync_spark, root, 0, 5), root)
        prov = TableChangesSyncProvider(root, "k long, v long", ["k", "v"])
        opt = syncsource.provider_option(prov)
        seen: list[set] = []

        def sink(df, _bid):
            seen.append({(r.k, r.v) for r in df.collect()})

        q = (
            sync_spark.readStream.format("vf_sync")
            .option("provider", opt)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            table_append(self._mk(sync_spark, root, 5, 9), root)
            q.processAllAvailable()
        finally:
            q.stop()
        got = set().union(*seen) if seen else set()
        assert got == {(k, k * 10) for k in range(9)}
        # no row delivered twice across batches
        assert sum(len(b) for b in seen) == 9

    def test_rewrites_contribute_nothing_and_merge_raises(self, sync_spark, tmp_path):
        import pytest as _pytest

        from vectorflow_spark.sources.syncsource import TableChangesSyncProvider
        from vectorflow_spark.sources.table import (
            table_compact,
            table_create,
            table_delete_where,
            table_merge,
        )

        root = str(tmp_path / "tbl2")
        table_create(self._mk(sync_spark, root, 0, 8), root)
        table_delete_where(sync_spark, root, "k < 2", predicates=[("k", "<", 2)])
        table_compact(sync_spark, root, target_bytes=1 << 30)
        prov = TableChangesSyncProvider(root, "k long, v long", ["k", "v"])
        items = prov.list_range(None, None)
        # only the create snapshot's file is in the feed
        assert len(items) == 1
        rows = list(prov.fetch(items))
        assert {(r[0], r[1]) for r in rows} == {(k, k * 10) for k in range(8)}
        table_merge(
            sync_spark,
            root,
            self._mk(sync_spark, root, 100, 102),
            "k",
        )
        with _pytest.raises(ValueError, match="merge"):
            prov.list_range(None, None)
