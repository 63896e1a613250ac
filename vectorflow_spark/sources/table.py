"""vf_table: a snapshot-isolation table format over parquet files.

What Iceberg/Delta exist for, re-expressed minimally: at 100 TB a
"table" cannot be a directory listing — readers racing writers see
partial file sets, deletes need tombstones or rewrites, and scan
planning must skip files without opening them. The fix is the same in
every modern table format, and here:

* the ONLY source of truth is an immutable snapshot manifest committed
  atomically (write-temp + os.replace, the sinks/writers.py discipline);
  a reader that resolved snapshot N keeps seeing exactly N's file set
  no matter what commits land meanwhile — snapshot isolation for free,
  and time travel is just resolving an older id;
* every manifest entry carries per-column min/max harvested from the
  parquet footers BY OUR OWN parser (parquetmini.footer_meta_rows), so
  scan planning prunes files manifest-side before Spark ever lists or
  opens them — the Iceberg scan-planning win, and a standing pin of our
  footer reader against Spark's writer;
* deletes are copy-on-write: rewrite only the files whose stats overlap
  the predicate, carry every other file forward untouched;
* compaction bin-packs small files into target-sized ones in a new
  snapshot with identical rows — the answer to streaming ingest's
  small-file problem.

The manifest here is ONE json document storing per-snapshot DELTAS
(added entries / removed paths; full lists only at create and
retention bases), so it grows O(total files), not O(snapshots x
files). At production scale the same structure shards into a manifest
file per snapshot plus a tiny pointer (exactly Iceberg's
metadata.json -> manifest-list indirection) without changing any
semantics below. Writers use optimistic concurrency: a
commit records the snapshot id it built on and refuses if the current
id moved (the caller retries on ConflictError).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "ConflictError",
    "table_create",
    "table_append",
    "table_delete_where",
    "table_compact",
    "table_cluster",
    "table_expire_snapshots",
    "table_merge",
    "table_append_txn",
    "committed_txns",
    "streaming_table_sink",
    "table_read",
    "table_read_evolved",
    "table_add_column",
    "table_changes",
    "table_snapshots",
    "table_files",
    "plan_files",
]

_META_DIR = "_vf_meta"
_MANIFEST = "snapshots.json"


class ConflictError(RuntimeError):
    """Another writer committed since this operation resolved its base
    snapshot. Re-read and retry."""


# ---------------------------------------------------------------------------
# Manifest
# ---------------------------------------------------------------------------


def _manifest_path(root: str) -> str:
    return os.path.join(root, _META_DIR, _MANIFEST)


def _read_manifest(root: str) -> dict[str, Any]:
    with open(_manifest_path(root)) as f:
        return json.load(f)


def _commit(root: str, manifest: dict[str, Any], expected_parent: int | None) -> None:
    """Atomic manifest replace with an optimistic-concurrency check: the
    check re-reads the CURRENT manifest immediately before the rename, so
    two writers that both built on snapshot N cannot both land (one sees
    current != N and raises). Not a distributed lock — on a real object
    store this is the compare-and-swap the catalog provides — but the
    single-host semantics match."""
    path = _manifest_path(root)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if expected_parent is not None and os.path.exists(path):
        cur = _read_manifest(root)["current"]
        if cur != expected_parent:
            raise ConflictError(
                f"table moved to snapshot {cur} (expected {expected_parent})"
            )
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    if expected_parent is None:
        # table creation: os.link is atomic-exclusive, so two concurrent
        # creates cannot both land (the exists() precheck alone races —
        # the loser would silently clobber the winner's manifest)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise FileExistsError(f"table already exists at {os.path.dirname(path)}")
        finally:
            os.unlink(tmp)
    else:
        os.replace(tmp, path)


def table_snapshots(root: str) -> list[dict[str, Any]]:
    """Snapshot metadata, ascending by id (file entries included)."""
    return sorted(_read_manifest(root)["snapshots"], key=lambda s: s["id"])


def _resolve(root: str, snapshot: int | None) -> dict[str, Any]:
    m = _read_manifest(root)
    sid = m["current"] if snapshot is None else snapshot
    for s in m["snapshots"]:
        if s["id"] == sid:
            return s
    raise KeyError(f"snapshot {sid} not found (have {[s['id'] for s in m['snapshots']]})")


def _walk_file_sets(m: dict[str, Any]):
    """Yield (snapshot_record, {path: entry}) ascending, folding the
    per-snapshot DELTAS (added/removed) from the nearest full-list
    record. Snapshots store deltas, not cumulative lists — a streaming
    table's manifest grows O(total files), not O(snapshots x files),
    and each commit serializes only what actually changed (plus the
    bookkeeping)."""
    cum: dict[str, dict[str, Any]] = {}
    for snap in sorted(m["snapshots"], key=lambda x: x["id"]):
        if "files" in snap:
            cum = {f["path"]: f for f in snap["files"]}
        else:
            for pth in snap.get("removed", ()):  # removed first: a rewrite
                cum.pop(pth, None)  # replaces paths, never resurrects them
            for f in snap.get("added", ()):
                cum[f["path"]] = f
        yield snap, cum


def _files_of(m: dict[str, Any], snapshot: int | None) -> list[dict[str, Any]]:
    sid = m["current"] if snapshot is None else snapshot
    for snap, cum in _walk_file_sets(m):
        if snap["id"] == sid:
            return [cum[k] for k in sorted(cum)]
    raise KeyError(
        f"snapshot {sid} not found (have {[x['id'] for x in m['snapshots']]})"
    )


def table_files(root: str, snapshot: int | None = None) -> list[dict[str, Any]]:
    """File entries (path, rows, bytes, stats) of a snapshot."""
    return _files_of(_read_manifest(root), snapshot)


# ---------------------------------------------------------------------------
# Data-file staging + stats harvest
# ---------------------------------------------------------------------------


def _harvest_stats(path: str) -> tuple[int, dict[str, list[Any]]]:
    """(rows, {column: [min, max]}) from the parquet footer via our own
    parser. Bounds merge across row groups; a column missing either bound
    in ANY row group gets no entry (pruning must stay conservative).
    Binary payload columns produce byte bounds — json-unfriendly — and
    DECIMAL/timestamp/date logical types surface UNSCALED physical ints
    (a DECIMAL(15,2) file holding 2.00-90.00 reports [200, 9000]) which
    would make _overlaps compare against user-scale predicate values and
    mis-prune — so only plainly-comparable leaves (untyped numerics and
    UTF8 strings) keep bounds; everything else stays statless, which
    pruning treats as always-overlapping (conservative)."""
    from vectorflow_spark.sources.parquetmini import (
        footer_meta_rows,
        read_file_meta,
        schema_leaves,
    )

    meta = read_file_meta(path)
    rows = sum(rg["num_rows"] for rg in meta["row_groups"])
    plain: set[str] = set()
    for lf in schema_leaves(meta):
        is_utf8 = lf.converted_type == 0 or (
            isinstance(lf.logical, dict) and "string" in lf.logical
        )
        if (lf.logical is None and lf.converted_type is None) or is_utf8:
            plain.add(lf.path)
    bounds: dict[str, list[Any]] = {}
    dropped: set[str] = set()
    for r in footer_meta_rows(path, meta):
        col = r["path_in_schema"]
        mn, mx = r["stats_min"], r["stats_max"]
        if (
            col in dropped
            or col not in plain
            or mn is None
            or mx is None
            or not isinstance(mn, (int, float, str))
            or not isinstance(mx, (int, float, str))
            or isinstance(mn, bool)
        ):
            bounds.pop(col, None)
            dropped.add(col)
            continue
        if col not in bounds:
            bounds[col] = [mn, mx]
        else:
            bounds[col][0] = min(bounds[col][0], mn)
            bounds[col][1] = max(bounds[col][1], mx)
    return rows, bounds


def _stage_dataframe(df: DataFrame, root: str, sid: int) -> list[dict[str, Any]]:
    """Write ``df`` as parquet into a staging dir, move the part files to
    data/ under collision-free names, harvest per-file stats. Files enter
    the table ONLY via the subsequent manifest commit — a crash here
    leaves unreferenced files that any later writer may GC, never a
    corrupt table."""
    staging = os.path.join(root, f".staged-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir, exist_ok=True)
    entries: list[dict[str, Any]] = []
    n = 0
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        dst = os.path.join(data_dir, f"s{sid:05d}-{n:05d}-{uuid.uuid4().hex[:8]}.parquet")
        os.replace(os.path.join(staging, name), dst)
        rows, stats = _harvest_stats(dst)
        entries.append(
            {
                "path": os.path.relpath(dst, root),
                "rows": rows,
                "bytes": os.path.getsize(dst),
                "stats": stats,
            }
        )
        n += 1
    shutil.rmtree(staging, ignore_errors=True)
    return entries


# ---------------------------------------------------------------------------
# Operations (each = stage files, then one atomic manifest commit)
# ---------------------------------------------------------------------------


def table_create(df: DataFrame, root: str, txn: str | None = None) -> int:
    """Create a table at ``root`` from ``df``; returns snapshot id 1.
    ``txn`` records an idempotency token in the create snapshot — the
    streaming sink's batch 0 needs it, or a replayed first batch would
    re-append its own rows (the create carried no token to match)."""
    os.makedirs(root, exist_ok=True)
    if os.path.exists(_manifest_path(root)):
        raise FileExistsError(f"table already exists at {root}")
    files = _stage_dataframe(df, root, 1)
    snap: dict[str, Any] = {"id": 1, "parent": None, "operation": "create", "files": files}
    if txn is not None:
        snap["txn"] = txn
    _commit(
        root,
        {"format_version": 1, "current": 1, "snapshots": [snap]},
        expected_parent=None,
    )
    return 1


def _next(root: str) -> tuple[dict[str, Any], dict[str, Any], list, int]:
    m = _read_manifest(root)
    base = _resolve(root, None)
    return m, base, _files_of(m, None), m["current"] + 1


def _snap(
    sid: int,
    base: dict[str, Any],
    operation: str,
    added: list,
    removed: list[str],
    **extra: Any,
) -> dict[str, Any]:
    """New DELTA snapshot record: ``added`` file entries + ``removed``
    paths relative to the parent (full lists live only in create /
    retention-base records). Schema evolution (added_columns) is TABLE
    state, not per-snapshot state — every snapshot inherits it from its
    parent (an append after an add_column must not lose the column;
    regression-tested)."""
    rec: dict[str, Any] = {
        "id": sid,
        "parent": base["id"],
        "operation": operation,
        "added": added,
        "removed": sorted(removed),
    }
    inherited = base.get("added_columns")
    if inherited:
        rec["added_columns"] = dict(inherited)
    rec.update(extra)
    return rec


def table_append(df: DataFrame, root: str) -> int:
    """Append rows in a new snapshot (base files carried forward)."""
    m, base, _, sid = _next(root)
    m["snapshots"].append(_snap(sid, base, "append", _stage_dataframe(df, root, sid), []))
    m["current"] = sid
    _commit(root, m, expected_parent=base["id"])
    return sid


def _overlaps(stats: dict[str, list[Any]], pred: tuple[str, str, Any]) -> bool:
    """Could a file with ``stats`` contain rows matching ``pred``?
    Conservative: unknown column/stats -> True."""
    col, op, val = pred
    b = stats.get(col)
    if b is None:
        return True
    lo, hi = b
    if op == "=":
        return lo <= val <= hi
    if op == "<":
        return lo < val
    if op == "<=":
        return lo <= val
    if op == ">":
        return hi > val
    if op == ">=":
        return hi >= val
    if op == "between":
        vlo, vhi = val
        return not (hi < vlo or lo > vhi)
    raise ValueError(f"unsupported predicate op {op!r}")


def plan_files(
    root: str,
    predicates: list[tuple[str, str, Any]] | None = None,
    snapshot: int | None = None,
    _m: dict[str, Any] | None = None,
) -> tuple[list[dict[str, Any]], int]:
    """Manifest-side scan planning: (surviving file entries, pruned
    count). A file survives only if EVERY predicate may match its
    bounds. ``_m`` reuses an already-parsed manifest."""
    files = _files_of(_m if _m is not None else _read_manifest(root), snapshot)
    if not predicates:
        return files, 0
    keep = [
        f for f in files if all(_overlaps(f["stats"], p) for p in predicates)
    ]
    return keep, len(files) - len(keep)


def table_read(
    spark: SparkSession,
    root: str,
    snapshot: int | None = None,
    predicates: list[tuple[str, str, Any]] | None = None,
) -> DataFrame:
    """Read a snapshot (default: current), manifest-pruned by
    ``predicates``. NOTE: predicates only PRUNE FILES — they are bounds
    filters, not row filters; apply the exact row filter on the returned
    frame (files may contain non-matching rows). An empty survivor set
    returns an empty frame with the table's schema (taken from any file
    of the snapshot)."""
    m = _read_manifest(root)  # parsed once: planning + schema fallback
    keep, _ = plan_files(root, predicates, snapshot, _m=m)
    all_files = _files_of(m, snapshot)
    if not all_files:
        raise ValueError("empty table snapshot with no schema source")
    if not keep:
        any_file = os.path.join(root, all_files[0]["path"])
        return spark.read.parquet(any_file).limit(0)
    return spark.read.parquet(*[os.path.join(root, f["path"]) for f in keep])


def table_delete_where(
    spark: SparkSession,
    root: str,
    condition: str,
    predicates: list[tuple[str, str, Any]] | None = None,
) -> int:
    """Copy-on-write delete: rows matching the SQL ``condition`` leave
    the table in a new snapshot. Only files whose stats overlap
    ``predicates`` (derived from the condition by the caller; defaults
    to all files) are rewritten — every other file is carried forward
    BY REFERENCE, the property that makes a delete of one day's rows
    from a year-sized table touch 1/365th of it. Rewritten files that
    end empty are dropped."""
    m, base, base_files, sid = _next(root)
    touch, _ = plan_files(root, predicates, _m=m)
    touch_paths = {f["path"] for f in touch}
    new_entries: list[dict[str, Any]] = []
    if touch:
        src = spark.read.parquet(*[os.path.join(root, f["path"]) for f in touch])
        remaining = src.filter(f"NOT ({condition})")
        new_entries = _stage_dataframe(remaining, root, sid)
        new_entries = [e for e in new_entries if e["rows"] > 0]
    m["snapshots"].append(
        _snap(sid, base, "delete", new_entries, list(touch_paths), condition=condition)
    )
    m["current"] = sid
    _commit(root, m, expected_parent=base["id"])
    return sid


def table_compact(spark: SparkSession, root: str, target_bytes: int) -> int:
    """Bin-pack small files into ~target-sized ones in a new snapshot
    with identical rows. Greedy first-fit over the manifest ordering:
    files >= target carry forward untouched; runs of small files whose
    cumulative size reaches the target rewrite as ONE file each. The
    streaming-ingest answer: a thousand 1 MB micro-batch files become
    a handful of scan-efficient ones, atomically, without blocking
    readers (they keep their resolved snapshot)."""
    m, base, base_files, sid = _next(root)
    small = [f for f in base_files if f["bytes"] < target_bytes]
    groups: list[list[dict[str, Any]]] = []
    cur: list[dict[str, Any]] = []
    size = 0
    for f in small:
        cur.append(f)
        size += f["bytes"]
        if size >= target_bytes:
            groups.append(cur)
            cur, size = [], 0
    if cur:
        groups.append(cur)
    new_entries: list[dict[str, Any]] = []
    removed: list[str] = []
    for g in groups:
        if len(g) == 1:
            continue  # a lone small file stays as-is
        src = spark.read.parquet(*[os.path.join(root, f["path"]) for f in g])
        new_entries.extend(_stage_dataframe(src.coalesce(1), root, sid))
        removed.extend(f["path"] for f in g)
    m["snapshots"].append(_snap(sid, base, "compact", new_entries, removed))
    m["current"] = sid
    _commit(root, m, expected_parent=base["id"])
    return sid


def table_merge(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key_col: str,
) -> int:
    """Copy-on-write MERGE (upsert by key): rows of ``updates`` replace
    same-key rows and append new keys, in one new snapshot. Only files
    whose key bounds overlap the update key range are rewritten (matched
    rows dropped there); every other file carries forward by reference.
    The update set is assumed snapshot-sized relative to the table — the
    CDC-ingest shape — so the anti-join inside the rewrite runs with the
    update keys broadcast."""
    from pyspark.sql import functions as F

    m, base, base_files, sid = _next(root)
    bounds = updates.agg(
        F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
    ).collect()[0]
    if bounds.lo is None:
        raise ValueError("empty update set")
    touch, _ = plan_files(root, [(key_col, "between", (bounds.lo, bounds.hi))], _m=m)
    touch_paths = {f["path"] for f in touch}
    keys = updates.select(key_col).distinct()
    parts = [updates]
    if touch:
        src = spark.read.parquet(*[os.path.join(root, f["path"]) for f in touch])
        parts.append(src.join(F.broadcast(keys), key_col, "left_anti"))
    merged = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    new_entries = [e for e in _stage_dataframe(merged, root, sid) if e["rows"] > 0]
    m["snapshots"].append(
        _snap(sid, base, "merge", new_entries, list(touch_paths), key=key_col)
    )
    m["current"] = sid
    _commit(root, m, expected_parent=base["id"])
    return sid


def committed_txns(root: str) -> set[str]:
    """Transaction ids already committed into the table (streaming
    exactly-once bookkeeping)."""
    return {
        s["txn"] for s in _read_manifest(root)["snapshots"] if s.get("txn") is not None
    }


def table_append_txn(df: DataFrame, root: str, txn: str) -> int | None:
    """Append with an idempotency token: if a snapshot carrying ``txn``
    is already committed, do NOTHING and return None — the replayed
    micro-batch of an at-least-once stream cannot double its rows. This
    is the Delta/Iceberg streaming-sink pattern (txn version in the
    commit), done here by recording the token in the snapshot record;
    the check and the commit race safely because the manifest CAS
    (expected_parent) forces the loser to re-read, at which point the
    token is visible."""
    if os.path.exists(_manifest_path(root)) and txn in committed_txns(root):
        return None
    m, base, _, sid = _next(root)
    m["snapshots"].append(
        _snap(sid, base, "append", _stage_dataframe(df, root, sid), [], txn=txn)
    )
    m["current"] = sid
    _commit(root, m, expected_parent=base["id"])
    return sid


def streaming_table_sink(
    stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    compact_every: int = 0,
    target_bytes: int = 128 * 1024 * 1024,
):
    """Exactly-once streaming ingestion into a vf_table: each micro-batch
    appends one snapshot keyed by its batch id (table_append_txn), so
    at-least-once replay after a crash is absorbed by the idempotency
    token instead of double-writing. With ``compact_every`` > 0, every
    N-th batch also bin-packs the accumulated micro-batch files — the
    maintenance loop that keeps a streaming table scan-efficient without
    ever blocking readers (they hold their resolved snapshots)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        token = f"stream-batch-{batch_id}"
        if not os.path.exists(_manifest_path(root)):
            table_create(batch_df, root, txn=token)
            return
        sid = table_append_txn(batch_df, root, token)
        if sid is not None and compact_every and batch_id > 0 and batch_id % compact_every == 0:
            table_compact(spark, root, target_bytes)

    return (
        stream.writeStream.foreachBatch(write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def table_cluster(
    spark: SparkSession,
    root: str,
    cluster_by: list[str],
    n_files: int,
    bits: int = 16,
) -> int:
    """Clustering rewrite: re-sort the CURRENT snapshot's rows by the
    Z-order interleave of ``cluster_by`` (operators/layout.zvalue) into
    ``n_files`` range-partitioned files. Z-ordering makes every listed
    column's per-file min/max range narrow simultaneously, so manifest
    pruning (plan_files) discards files for predicates on ANY clustered
    column — the reason Delta/Iceberg OPTIMIZE ZORDER exists. One full
    rewrite of the snapshot (the maintenance job a table pays rarely,
    after ingest order has scattered its keys); readers keep their
    resolved snapshots throughout."""
    from vectorflow_spark.operators.layout import zvalue

    m, base, base_files, sid = _next(root)
    if not base_files:
        raise ValueError("cannot cluster an empty snapshot")
    src = spark.read.parquet(*[os.path.join(root, f["path"]) for f in base_files])
    ordered = (
        src.withColumn("_z", zvalue(cluster_by, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    new_entries = [e for e in _stage_dataframe(ordered, root, sid) if e["rows"] > 0]
    m["snapshots"].append(
        _snap(
            sid,
            base,
            "cluster",
            new_entries,
            [f["path"] for f in base_files],
            cluster_by=list(cluster_by),
        )
    )
    m["current"] = sid
    _commit(root, m, expected_parent=base["id"])
    return sid


def table_expire_snapshots(root: str, keep: int) -> tuple[list[int], int]:
    """Retention: drop all but the newest ``keep`` snapshots from the
    manifest and DELETE data files no surviving snapshot references —
    the vacuum that bounds a long-lived table's storage at the cost of
    deep time travel. Returns (expired snapshot ids, files removed).
    The manifest commit lands BEFORE any file is unlinked: a crash
    between the two leaves unreferenced files (re-vacuumable), never a
    manifest pointing at missing data. Also GCs orphaned files in
    data/ that no snapshot ever referenced (crashed stagings)."""
    m = _read_manifest(root)
    snaps = sorted(m["snapshots"], key=lambda s: s["id"])
    if keep < 1:
        raise ValueError("keep must be >= 1")
    kept, expired = snaps[-keep:], snaps[:-keep]
    # reconstruct every kept snapshot's file set BEFORE truncation, then
    # materialize the new base as a full list (its delta chain is gone)
    sets = {snap["id"]: dict(cum) for snap, cum in _walk_file_sets(m)}
    live = {p for snap in kept for p in sets[snap["id"]]}
    if expired:
        base = kept[0]
        base_files = [sets[base["id"]][k] for k in sorted(sets[base["id"]])]
        base.pop("added", None)
        base.pop("removed", None)
        base["files"] = base_files
    m["snapshots"] = kept
    _commit(root, m, expected_parent=m["current"])
    removed = 0
    current = m["current"]
    data_dir = os.path.join(root, "data")
    if os.path.isdir(data_dir):
        for name in os.listdir(data_dir):
            rel = os.path.join("data", name)
            if rel in live:
                continue
            # files carry their snapshot id in the name (s{sid:05d}-...);
            # an in-flight writer stages under current+1 BEFORE its
            # manifest commit — unlinking those would let its commit land
            # pointing at deleted data. Only GC files from snapshot ids
            # at or below current: committed-and-expired or crashed
            # stagings whose id has since been reused/passed.
            try:
                sid = int(name.split("-", 1)[0].lstrip("s"))
            except ValueError:
                continue
            if sid > current:
                continue
            os.unlink(os.path.join(data_dir, name))
            removed += 1
    return [s["id"] for s in expired], removed


def table_add_column(root: str, name: str, sql_type: str) -> int:
    """Metadata-only schema evolution: record a new nullable column in a
    new snapshot — NO data file is touched (the Iceberg add-column
    semantics: existing rows read the column as NULL, files written
    before the change never rewrite). The read path honors the recorded
    evolution by schema-merging old files with the backfilled null
    column; type widening/renames are out of scope (they need column
    ids, which this single-json manifest deliberately omits)."""
    m, base, _, sid = _next(root)
    cols = dict(base.get("added_columns") or {})
    if name in cols:
        raise ValueError(f"column {name!r} already added")
    cols[name] = sql_type
    m["snapshots"].append(
        _snap(sid, base, "add_column", [], [], added_columns=cols)
    )
    m["current"] = sid
    _commit(root, m, expected_parent=base["id"])
    return sid


def table_read_evolved(
    spark: SparkSession, root: str, snapshot: int | None = None
) -> DataFrame:
    """Read a snapshot under its recorded schema evolution: files written
    before an add_column surface the new column as typed NULLs, files
    written after carry their values — one mergeSchema read plus typed
    null backfill for columns absent everywhere."""
    from pyspark.sql import functions as F

    m = _read_manifest(root)
    snap = _resolve(root, snapshot)
    files = _files_of(m, snapshot)
    if not files:
        raise ValueError("empty table snapshot")
    df = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(root, f["path"]) for f in files]
    )
    for name, sql_type in (snap.get("added_columns") or {}).items():
        if name not in df.columns:
            df = df.withColumn(name, F.lit(None).cast(sql_type))
    return df


def table_changes(
    spark: SparkSession, root: str, from_snapshot: int, to_snapshot: int | None = None
) -> DataFrame:
    """Incremental read: rows ADDED between two snapshots — the files
    present in ``to`` but not in ``from`` — the change feed a downstream
    incremental pipeline tails instead of re-reading the table.

    Exact for append-shaped history (create/append/merge inserts land in
    new files). A rewrite operation (delete/compact/cluster/merge-update)
    between the snapshots copies PRE-EXISTING rows into new files, where
    a file-level diff would re-emit them as adds — silently wrong for a
    consumer — so any such snapshot in the range raises instead
    (row-level change tracking needs per-row lineage this format does
    not carry; Delta's CDF writes explicit change files for the same
    reason)."""
    m = _read_manifest(root)
    to_id = m["current"] if to_snapshot is None else to_snapshot
    if to_id < from_snapshot:
        raise ValueError(f"to_snapshot {to_id} < from_snapshot {from_snapshot}")
    rewriting = [
        s["id"]
        for s in m["snapshots"]
        if from_snapshot < s["id"] <= to_id
        # add_column is metadata-only (files identical to parent) — it
        # must not poison the range the way a real rewrite does
        and s["operation"] not in ("append", "create", "add_column")
    ]
    if rewriting:
        raise ValueError(
            f"snapshots {rewriting} rewrite files; file-level diff would "
            "re-emit pre-existing rows as adds — not a valid change feed"
        )
    old_set = {f["path"] for f in _files_of(m, from_snapshot)}
    to_files = _files_of(m, to_id)
    new_files = [f for f in to_files if f["path"] not in old_set]
    if not new_files:
        return spark.read.parquet(os.path.join(root, to_files[0]["path"])).limit(0)
    return spark.read.parquet(*[os.path.join(root, f["path"]) for f in new_files])
