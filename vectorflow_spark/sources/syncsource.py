"""Structured-Streaming incremental connector sync (``vf_sync``): the
Spark-native form of the nightly-delta ingest the Salesforce/GDrive
connectors (sources/connectors.py) expose as batch helpers.

The watermark cursor IS the stream offset: each micro-batch lists the
items whose modification stamp falls in the half-open window
``(start_cursor, end_cursor]`` (driver-side, metadata only — the same
listing walk the batch connectors do) and fetches their payloads on the
executors, ``itemsPerTask`` per partition. Checkpointed offsets give
exactly-once PLANNING; payload fetches are at-least-once under task
retry, absorbed by the uuid5-keyed idempotent sinks (U6) exactly like
every other source here.

Providers are injected as a pickled option — a connector carries auth
and an injectable transport that cannot ride a plain string option map,
and Spark 4 instantiates Python data sources in a separate planning
worker where a driver-side registry would be invisible::

    p = SalesforceSyncProvider(conn, "Doc", ["Id", "Name"])
    (spark.readStream.format("vf_sync")
        .option("provider", syncsource.provider_option(p)).load())

A provider is any picklable object with three methods:

* ``schema() -> str`` — the output DDL;
* ``list_range(after, upto) -> list[dict]`` — driver-side listing of
  items with ``after < item["cursor"] <= upto`` (either bound may be
  None for unbounded); each item dict must carry ``cursor`` plus
  whatever ``fetch`` needs;
* ``fetch(items) -> iterable of row tuples`` — executor-side payload
  pull, emitting per-item error rows instead of raising (the A4
  accounting contract).

Watermark semantics (documented limitation, shared with every
timestamp-cursor replication scheme incl. Salesforce's own guidance):
the lower bound is STRICTLY greater, so an item whose stamp ties the
committed cursor but appears after that batch listed is skipped; use
source timestamps with enough granularity, or re-run a bounded batch
backfill (connectors.read_records) to heal. Batch mode
(``spark.read.format("vf_sync")``) runs one unbounded listing+fetch —
the full-refresh twin.

100-TB shape: listing is O(delta metadata) on the driver by the
provider protocols' own pagination (cursor-sequential); payload bytes
only ever exist in executor partitions. Offline-testable end to end
with fake providers (tests/test_syncsource.py).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

def provider_option(provider: Any) -> str:
    """Serialize a sync provider for ``.option('provider', ...)``:
    cloudpickle + base64, so the object (auth, injectable transport and
    all) survives the trip through the string option map into the
    planning worker and out to executors."""
    import base64

    from pyspark import cloudpickle

    return base64.b64encode(cloudpickle.dumps(provider)).decode("ascii")


def _provider(options: dict) -> Any:
    blob = options.get("provider")
    if not blob:
        raise ValueError(
            "vf_sync requires .option('provider', syncsource.provider_option(p))"
        )
    import base64

    from pyspark import cloudpickle

    try:
        return cloudpickle.loads(base64.b64decode(blob.encode("ascii")))
    except Exception as e:
        raise ValueError(
            "vf_sync: the 'provider' option is not a provider_option() "
            f"payload ({type(e).__name__}: {e})"
        ) from e


class _ItemsPartition(InputPartition):
    def __init__(self, items: list[dict]):
        self.items = items


class VfSyncReader(DataSourceReader):
    """Batch mode: one unbounded listing, fetched in parallel."""

    def __init__(self, options: dict):
        self.provider = _provider(options)
        self.items_per_task = max(1, int(options.get("itemspertask", "256")))

    def partitions(self):
        items = self.provider.list_range(None, None)
        return [
            _ItemsPartition(items[i : i + self.items_per_task])
            for i in range(0, len(items), self.items_per_task)
        ] or [_ItemsPartition([])]

    def read(self, partition: _ItemsPartition):
        yield from self.provider.fetch(partition.items)


class VfSyncStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.provider = _provider(options)
        self.items_per_task = max(1, int(options.get("itemspertask", "256")))
        self._last = ""  # "" = beginning of time (cursor strings sort lexically)
        self._pending: list[dict] = []  # listed but not yet committed

    def initialOffset(self) -> dict:
        return {"cursor": ""}

    def latestOffset(self) -> dict:
        items = self.provider.list_range(self._last or None, None)
        if items:
            top = max(it["cursor"] for it in items)
            self._last = max(self._last, top)
            self._pending.extend(items)
        return {"cursor": self._last}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["cursor"], end["cursor"]
        items = [it for it in self._pending if lo < it["cursor"] <= hi]
        if not items and lo != hi:
            # checkpoint recovery: the pending cache died with the old
            # driver — re-list exactly the committed window
            items = self.provider.list_range(lo or None, hi)
            # recovery listing restarts the incremental walk from hi
            self._last = max(self._last, hi)
        return [
            _ItemsPartition(items[i : i + self.items_per_task])
            for i in range(0, len(items), self.items_per_task)
        ] or [_ItemsPartition([])]

    def read(self, partition: _ItemsPartition):
        yield from self.provider.fetch(partition.items)

    def commit(self, end: dict) -> None:
        hi = end["cursor"]
        self._pending = [it for it in self._pending if it["cursor"] > hi]


class VfSyncDataSource(DataSource):
    """``spark.readStream.format("vf_sync").option("provider", name)``
    for incremental sync; ``spark.read.format("vf_sync")`` for the
    full-refresh batch twin. Register once per session with
    ``syncsource.register(spark)`` AFTER registering providers."""

    @classmethod
    def name(cls) -> str:
        return "vf_sync"

    def schema(self) -> str | StructType:
        return _provider(self.options).schema()

    def reader(self, schema: StructType) -> DataSourceReader:
        return VfSyncReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return VfSyncStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(VfSyncDataSource)


# ---------------------------------------------------------------------------
# Provider adapters over the batch connectors
# ---------------------------------------------------------------------------


class GDriveSyncProvider:
    """Google Drive files as a sync stream: cursor = ``modifiedTime``
    (RFC 3339, lexically ordered). Listing uses the connector's q
    bounds; fetch downloads media / Docs exports per item with error
    rows (same row shape as GDriveConnector.read_files plus the
    ``modified_time`` cursor column)."""

    def __init__(self, connector, folder_id: str | None = None):
        self.connector = connector
        self.folder_id = folder_id

    @staticmethod
    def schema() -> str:
        return (
            "file_id string, name string, mime_type string, kind string, "
            "content binary, n_bytes long, error string, modified_time string"
        )

    def list_range(self, after: str | None, upto: str | None) -> list[dict]:
        q = self.connector.incremental_query(self.folder_id, after)
        if upto:
            q += f" and modifiedTime <= '{upto}'"
        return [
            {
                "cursor": f["modifiedTime"],
                "id": f["id"],
                "name": f.get("name"),
                "mimeType": f.get("mimeType", "application/octet-stream"),
            }
            for f in self.connector.list_files(q=q)
        ]

    def fetch(self, items: list[dict]):
        for it in items:
            fid, name, mime = it["id"], it["name"], it["mimeType"]
            try:
                kind, payload = self.connector.fetch_file(fid, mime)
                yield (fid, name, mime, kind, payload, len(payload), None, it["cursor"])
            except Exception as e:
                yield (fid, name, mime, None, None, None, f"{type(e).__name__}: {e}", it["cursor"])


class SalesforceSyncProvider:
    """Salesforce records as a sync stream: cursor = ``SystemModstamp``
    (the replication-safe stamp, lexically ordered in the API's fixed
    format). Listing is the bounded incremental SOQL; fetch is the
    composite retrieve at the 200-id API limit with positional-null
    error rows."""

    def __init__(self, connector, object_type: str, fields: list[str]):
        self.connector = connector
        self.object_type = object_type
        self.fields = fields

    @staticmethod
    def schema() -> str:
        return "id string, record string, error string, modstamp string"

    def list_range(self, after: str | None, upto: str | None) -> list[dict]:
        soql = self.connector.incremental_soql(
            self.object_type, ["Id", "SystemModstamp"], after
        )
        if upto:
            clause = f"SystemModstamp <= {upto}"
            soql = (
                soql.replace(" ORDER BY", f" AND {clause} ORDER BY")
                if " WHERE " in soql
                else soql.replace(" ORDER BY", f" WHERE {clause} ORDER BY")
            )
        return [
            {"cursor": r["SystemModstamp"], "id": r["Id"]}
            for r in self.connector.query(soql)
        ]

    def fetch(self, items: list[dict]):
        conn = self.connector
        by_id = {it["id"]: it["cursor"] for it in items}
        ids = [it["id"] for it in items]
        for j in range(0, len(ids), conn.COMPOSITE_BATCH):
            chunk = ids[j : j + conn.COMPOSITE_BATCH]
            for i, record, error in conn.retrieve_chunk(self.object_type, chunk, self.fields):
                yield (i, record, error, by_id[i])


class AvroDirSyncProvider:
    """An Avro landing DIRECTORY as a sync stream — the classic CDC/event
    drop-zone shape: producers rename-commit ``*.avro`` container files
    into a directory, the stream tails it. Cursor = the file's
    zero-padded ``max(st_mtime, st_ctime)`` + name (lexically ordered,
    stable under re-list); fetch decodes each committed file with the
    byte-level reader (sources/avromini.py), executor-side, with
    per-file error rows instead of task aborts (the A4 accounting
    contract).

    Producers must write-then-rename (every sink in this repo does).
    rename(2) does NOT update mtime — it is fixed at the last write — so
    mtime alone would let a slowly-written file rename into the drop
    zone BELOW an already-committed cursor and be skipped forever (r10
    ADVICE). rename(2) DOES update the inode's ctime, so
    ``max(mtime, ctime)`` is ≥ the rename-commit instant and a committed
    file can never appear under the committed cursor later. Rows carry
    ``_file`` so downstream uuid5 content ids stay idempotent under
    at-least-once fetches."""

    def __init__(self, path: str, ddl: str, columns: list[str]):
        self.path = path
        self._ddl = ddl
        self.columns = columns

    def schema(self) -> str:
        return self._ddl + ", _file string, _error string"

    def list_range(self, after: str | None, upto: str | None) -> list[dict]:
        import glob as g
        import os as _os

        out = []
        for p in sorted(g.glob(_os.path.join(self.path, "*.avro"))):
            try:
                st = _os.stat(p)
                # max(mtime, ctime): ctime covers the rename-commit (see
                # class docstring) — mtime alone loses late-renamed files.
                commit_ts = max(st.st_mtime, st.st_ctime)
                cursor = f"{commit_ts:020.6f}/{_os.path.basename(p)}"
            except OSError:
                continue  # raced a concurrent delete: not yet committed
            if (after is None or cursor > after) and (upto is None or cursor <= upto):
                out.append({"cursor": cursor, "path": p})
        return out

    def fetch(self, items: list[dict]):
        from vectorflow_spark.sources.avromini import read_avro

        for it in items:
            try:
                with open(it["path"], "rb") as f:
                    cols = read_avro(f.read(), self.columns)
                n = len(cols[self.columns[0]]) if self.columns else 0
                for i in range(n):
                    yield tuple(cols[c][i] for c in self.columns) + (it["path"], None)
            except Exception as e:
                yield tuple(None for _ in self.columns) + (
                    it["path"],
                    f"{type(e).__name__}: {e}",
                )


class TableChangesSyncProvider:
    """A vf_table (sources/table.py) as a sync STREAM — tail the table's
    append-shaped change feed: each committed snapshot's NEW data files
    become stream items, cursored by ``(snapshot id, file path)`` so a
    restart resumes exactly where the checkpoint left off and a replayed
    range re-reads the same immutable files (manifest entries never
    mutate — the stronger-than-mtime cursor the drop-zone provider has
    to approximate).

    Change-feed semantics follow table_changes: create/append snapshots
    contribute their new files; delete/compact/cluster snapshots
    contribute NOTHING (their new files hold only pre-existing rows — an
    append-only feed by definition never re-emits them); a merge
    snapshot RAISES, because its files interleave genuine inserts with
    copied rows and either emitting or skipping would be silently wrong.
    Files decode executor-side with the byte-level parquet reader
    (sources/parquetmini.py), per-file error rows per the A4 contract."""

    def __init__(self, root: str, ddl: str, columns: list[str]):
        self.root = root
        self._ddl = ddl
        self.columns = columns

    def schema(self) -> str:
        return self._ddl + ", _file string, _error string"

    def list_range(self, after: str | None, upto: str | None) -> list[dict]:
        import os as _os

        from vectorflow_spark.sources.table import _read_manifest, _walk_file_sets

        m = _read_manifest(self.root)
        walked = [(snap, set(cum)) for snap, cum in _walk_file_sets(m)]
        snaps = [snap for snap, _ in walked]
        file_sets = {snap["id"]: paths for snap, paths in walked}
        if after is not None and snaps:
            after_sid = int(after.split("/", 1)[0])
            if after_sid < snaps[0]["id"] and snaps[0]["parent"] is not None:
                # the committed cursor predates the retained history
                # (table_expire_snapshots truncated it); re-listing from
                # the first kept snapshot would re-emit its cumulative
                # file set as "new" — fail loudly, like a Kafka
                # out-of-range offset, instead of duplicating rows
                raise ValueError(
                    f"cursor {after!r} predates retained history (first kept "
                    f"snapshot {snaps[0]['id']}): cannot resume exactly-once"
                )
        out = []
        prev_files: set[str] = set()
        for i, snap in enumerate(snaps):
            paths = file_sets[snap["id"]]
            new = sorted(paths - prev_files)
            prev_files = paths
            op = snap["operation"]
            truncated_base = i == 0 and snap["parent"] is not None
            if not truncated_base:
                # (a truncated first snapshot is the table's initial
                # state — emit its files whatever operation produced it)
                if op in ("delete", "compact", "cluster", "add_column"):
                    continue  # no new rows for an append-only feed
                if op == "merge" and new:
                    in_window = [
                        p
                        for p in new
                        if (after is None or f"{snap['id']:010d}/{p}" > after)
                        and (upto is None or f"{snap['id']:010d}/{p}" <= upto)
                    ]
                    if in_window:
                        raise ValueError(
                            f"snapshot {snap['id']} is a merge: its files mix "
                            "inserts with copied rows — not expressible as an "
                            "append feed"
                        )
                    continue  # merge outside the window: replay of a
                    # committed range must not trip over later maintenance
            for p in new:
                cursor = f"{snap['id']:010d}/{p}"
                if (after is None or cursor > after) and (upto is None or cursor <= upto):
                    out.append({"cursor": cursor, "path": _os.path.join(self.root, p)})
        return out

    def fetch(self, items: list[dict]):
        from vectorflow_spark.sources.parquetmini import read_file_meta, read_row_group

        for it in items:
            try:
                meta = read_file_meta(it["path"])
                for rg_id in range(len(meta["row_groups"])):
                    cols = read_row_group(it["path"], meta, rg_id, self.columns)
                    n = len(cols[self.columns[0]]) if self.columns else 0
                    for i in range(n):
                        yield tuple(cols[c][i] for c in self.columns) + (
                            it["path"],
                            None,
                        )
            except Exception as e:
                yield tuple(None for _ in self.columns) + (
                    it["path"],
                    f"{type(e).__name__}: {e}",
                )
