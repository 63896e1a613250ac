"""Sinks (operators U1-U6).

Canonical sink schema (reference README.md:201-207, built at
src/worker/vector_uploader.py:55-62 / :88-98 / :146-151):

    id: string, source_data: string, source_document: string,
    embeddings: array<float>

All external writers follow one pattern: ``foreachPartition`` with a
partition-local client and a 128-row upsert buffer (PINECONE_BATCH_SIZE,
reference src/worker/config.py:3, reused for Qdrant/Weaviate). Writes are
idempotent because ids are deterministic (K1) — Spark's at-least-once task
retry composes with upsert-by-id to give effectively-once (U6; the streaming
variant relies on the same property).

Vector-DB client libraries are not installed in the build environment; each
writer import-gates its client and raises a clear error when missing. The
parquet sink is the real, always-available path (and what tests/bench use).

Backend coverage: ALL TEN values of the reference's ``VectorDBType`` enum
(src/shared/vector_db_type.py:3-13) have writers here — the reference itself
implements only Pinecone/Qdrant/Weaviate (src/worker/vector_uploader.py);
milvus/deeplake/vespa/pgvector/redis/lancedb/mongodb are enum-only there, so
those seven extend parity. All follow the keyed-idempotent-upsert shape
except Deep Lake, whose store is append-only (contract documented on
``write_deeplake``).

Every external writer takes an optional ``client_factory`` — a picklable
zero-arg callable built ON THE EXECUTOR (called once per partition). The
default constructs the real client (import-gated); tests inject a fake that
records upsert payloads to a spool directory, which is how the 128-slicing,
payload field names, and idempotency contracts are asserted without any
network or client package (tests/test_sink_contracts.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectorflow_spark.config import VECTOR_UPSERT_BATCH_SIZE, PipelineConfig


def to_vector_records(
    chunks: DataFrame,
    id_col: str = "chunk_id",
    text_col: str = "text",
    doc_col: str = "source",
    vector_col: str = "vector",
    dedupe: bool = False,
    metadata: dict[str, Any] | None = None,
) -> DataFrame:
    """U4: project the canonical upsert payload.

    ``dedupe=True`` adds a dropDuplicates on id (partial-aggregated shuffle,
    salt-free — ids are uniform hashes). Default is OFF: it would shuffle
    the fattest data in the pipeline (text + embeddings) right before the
    sink, and keyed upserts are already idempotent per id (U6 / reference
    README.md:210) — duplicates converge at the store. Turn it on only for
    non-keyed sinks (plain parquet append) where duplicate rows persist.

    ``metadata`` makes the sink schema DYNAMICALLY CONFIGURABLE (reference
    roadmap README.md:294): a mapping of payload-field-name -> source
    column name (str) or Column expression, carried as a string-valued
    ``metadata`` map column that every dict-payload writer (Qdrant point
    payload, Pinecone metadata, Weaviate data_object, webhook/Mongo/Vespa
    documents) merges into its per-record payload. Values are cast to
    string (the lowest common denominator across the ten backends); the
    four canonical fields are reserved and always win on key collision so
    a schema config can never corrupt the idempotency key."""
    cols = [
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("source_data"),
        F.col(doc_col).alias("source_document"),
        F.col(vector_col).alias("embeddings"),
    ]
    if metadata:
        reserved = {"id", "source_data", "source_document", "embeddings"}
        bad = reserved & set(metadata)
        if bad:
            raise ValueError(f"metadata schema may not redefine canonical fields: {sorted(bad)}")
        pairs: list = []
        for name, src in sorted(metadata.items()):
            expr = F.col(src) if isinstance(src, str) else src
            pairs.extend((F.lit(name), expr.cast("string")))
        cols.append(F.create_map(*pairs).alias("metadata"))
    out = chunks.select(*cols)
    return out.dropDuplicates(["id"]) if dedupe else out


def _payload_extras(row: Any) -> dict:
    """Configured-schema extras for a record row: the ``metadata`` map
    column when present (to_vector_records(metadata=...)), else empty.
    Callers merge extras FIRST so canonical fields win collisions."""
    extras = getattr(row, "metadata", None)
    return dict(extras) if extras else {}


def _buffered(partition: Iterator, flush: Callable[[list], None], batch_size: int) -> None:
    buf: list = []
    for row in partition:
        buf.append(row)
        if len(buf) >= batch_size:
            flush(buf)
            buf = []
    if buf:
        flush(buf)


def write_parquet(records: DataFrame, path: str, mode: str = "overwrite") -> None:
    records.write.mode(mode).parquet(path)


def write_qdrant(
    records: DataFrame,
    collection: str,
    url: str = "http://localhost:6333",
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    client_factory: Callable[[], Any] | None = None,
) -> None:
    """U2: Qdrant upsert via PointStruct batches (reference
    vector_uploader.py:100-129; gRPC preferred there, same here). With an
    injected ``client_factory`` the points are plain dicts of the same
    field names (id/vector/payload) — PointStruct is exactly that shape."""

    def per_partition(partition: Iterator) -> None:
        if client_factory is None:
            try:
                from qdrant_client import QdrantClient
                from qdrant_client.models import PointStruct
            except ImportError as e:  # pragma: no cover
                raise RuntimeError("qdrant-client is not installed; use the parquet sink") from e

            client = QdrantClient(url=url, prefer_grpc=True)

            def make_point(**kw):
                return PointStruct(**kw)
        else:
            client = client_factory()

            def make_point(**kw):
                return kw

        def flush(rows: list) -> None:
            points = [
                make_point(
                    id=r.id,
                    vector=list(r.embeddings),
                    payload={
                        **_payload_extras(r),
                        "source_data": r.source_data,
                        "source_document": r.source_document,
                    },
                )
                for r in rows
            ]
            client.upsert(collection_name=collection, points=points)

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def write_pinecone(
    records: DataFrame,
    index_name: str,
    api_key_env: str = "VECTOR_DB_KEY",
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    client_factory: Callable[[], Any] | None = None,
) -> None:
    """U1: Pinecone upsert in 128-slices with metadata payload (reference
    vector_uploader.py:55-86). ``client_factory`` must return an object
    with ``Index(name)`` -> ``upsert(vectors=[(id, vec, meta), ...])``."""

    def per_partition(partition: Iterator) -> None:
        import os

        if client_factory is None:
            try:
                from pinecone import Pinecone
            except ImportError as e:  # pragma: no cover
                raise RuntimeError("pinecone client is not installed; use the parquet sink") from e

            pc = Pinecone(api_key=os.environ[api_key_env])
        else:
            pc = client_factory()
        index = pc.Index(index_name)

        def flush(rows: list) -> None:
            index.upsert(
                vectors=[
                    (
                        r.id,
                        list(r.embeddings),
                        {
                            **_payload_extras(r),
                            "source_text": r.source_data,
                            "source_document": r.source_document,
                        },
                    )
                    for r in rows
                ]
            )

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def write_weaviate(
    records: DataFrame,
    class_name: str,
    url: str = "http://localhost:8080",
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    client_factory: Callable[[], Any] | None = None,
) -> None:
    """U3: Weaviate batch upsert. The reference writes the property key
    'vectoflow_id' (typo preserved in its code at vector_uploader.py:149);
    we write the documented 'vectorflow_id' and note the difference.
    ``client_factory`` must return an object whose ``batch(batch_size=...,
    dynamic=...)`` is a context manager exposing ``add_data_object``."""

    def per_partition(partition: Iterator) -> None:
        if client_factory is None:
            try:
                import weaviate
            except ImportError as e:  # pragma: no cover
                raise RuntimeError("weaviate-client is not installed; use the parquet sink") from e

            client = weaviate.Client(url=url)
        else:
            client = client_factory()

        def flush(rows: list) -> None:
            with client.batch(batch_size=batch_size, dynamic=True) as batch:
                for r in rows:
                    batch.add_data_object(
                        data_object={
                            **_payload_extras(r),
                            "source_data": r.source_data,
                            "vectorflow_id": r.id,
                            "source_document": r.source_document,
                        },
                        class_name=class_name,
                        vector=list(r.embeddings),
                    )

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def write_pgvector(
    records: DataFrame,
    table: str,
    dsn: str = "postgresql://localhost:5432/vectors",
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    client_factory: Callable[[], Any] | None = None,
) -> None:
    """pgvector upsert — the first VectorDBType the reference enumerates
    but never implements (reference src/shared/vector_db_type.py:8;
    src/worker/vector_uploader.py ships only Pinecone/Qdrant/Weaviate),
    and the backend real users reach for first. Same pattern as U1-U3:
    ``foreachPartition``, partition-local connection, ``batch_size``-row
    buffered multi-row INSERTs, idempotent via the deterministic uuid5
    id (K1) composed with ``ON CONFLICT (id) DO UPDATE`` — Spark's
    at-least-once task retry converges to effectively-once (U6).

    Expected table (dim = embedding width)::

        CREATE EXTENSION IF NOT EXISTS vector;
        CREATE TABLE <table> (
            id uuid PRIMARY KEY,
            embedding vector(<dim>) NOT NULL,
            source_data text,
            source_document text
        );

    Values travel as bind parameters (never interpolated); the embedding
    crosses as pgvector's text literal ``[x,y,...]`` cast with
    ``::vector``, which works on every driver without registering the
    pgvector type adapter. ``client_factory`` must return a DB-API
    connection (``cursor()``/``commit()``/``close()``); the default
    import-gates psycopg (3.x) then psycopg2. One commit per flushed
    batch keeps retry windows small; replays are absorbed by the
    conflict clause."""
    import re

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?", table):
        raise ValueError(f"invalid pgvector table identifier: {table!r}")

    def per_partition(partition: Iterator) -> None:
        if client_factory is None:
            try:  # pragma: no cover - no postgres driver in this env
                import psycopg

                conn = psycopg.connect(dsn)
            except ImportError:
                try:
                    import psycopg2

                    conn = psycopg2.connect(dsn)
                except ImportError as e:
                    raise RuntimeError(
                        "no postgres driver (psycopg/psycopg2) is installed; "
                        "use the parquet sink"
                    ) from e
        else:
            conn = client_factory()
        upsert = (
            f"INSERT INTO {table} (id, embedding, source_data, source_document) "
            "VALUES {placeholders} "
            "ON CONFLICT (id) DO UPDATE SET "
            "embedding = EXCLUDED.embedding, "
            "source_data = EXCLUDED.source_data, "
            "source_document = EXCLUDED.source_document"
        )

        def flush(rows: list) -> None:
            params: list = []
            for r in rows:
                vec = "[" + ",".join(repr(float(x)) for x in r.embeddings) + "]"
                params.extend((r.id, vec, r.source_data, r.source_document))
            sql = upsert.format(
                placeholders=",".join(["(%s, %s::vector, %s, %s)"] * len(rows))
            )
            cur = conn.cursor()
            try:
                cur.execute(sql, params)
                conn.commit()
            finally:
                cur.close()

        try:
            _buffered(partition, flush, batch_size)
        finally:
            conn.close()

    records.foreachPartition(per_partition)


def write_milvus(
    records: DataFrame,
    collection: str,
    uri: str = "http://localhost:19530",
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    client_factory: Callable[[], Any] | None = None,
) -> None:
    """Milvus upsert (reference enum src/shared/vector_db_type.py:5,
    never implemented there). ``MilvusClient.upsert(collection_name,
    data=[{id, vector, source_data, source_document}, ...])`` — keyed on
    the deterministic uuid5 id, so task retries converge (U6).
    ``client_factory`` must return an object with that ``upsert``."""

    def per_partition(partition: Iterator) -> None:
        if client_factory is None:
            try:  # pragma: no cover - client not installed in this env
                from pymilvus import MilvusClient
            except ImportError as e:
                raise RuntimeError("pymilvus is not installed; use the parquet sink") from e
            client = MilvusClient(uri=uri)
        else:
            client = client_factory()

        def flush(rows: list) -> None:
            client.upsert(
                collection_name=collection,
                data=[
                    {
                        **_payload_extras(r),
                        "id": r.id,
                        "vector": list(r.embeddings),
                        "source_data": r.source_data,
                        "source_document": r.source_document,
                    }
                    for r in rows
                ],
            )

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def write_redis(
    records: DataFrame,
    key_prefix: str = "vec",
    url: str = "redis://localhost:6379",
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    client_factory: Callable[[], Any] | None = None,
) -> None:
    """Redis (RediSearch vector index shape): one HSET per record at
    ``{key_prefix}:{id}`` with the embedding as a little-endian float32
    blob — the layout RediSearch's HNSW/FLAT vector fields index — plus
    the text payload fields; batched through a pipeline, one round trip
    per flush. HSET full-overwrite on the deterministic key is the
    idempotent upsert. ``client_factory`` must return an object whose
    ``pipeline()`` supports ``hset(name, mapping=...)`` + ``execute()``."""

    def per_partition(partition: Iterator) -> None:
        import struct as _struct

        if client_factory is None:
            try:  # pragma: no cover - client not installed in this env
                import redis as redis_lib
            except ImportError as e:
                raise RuntimeError("redis client is not installed; use the parquet sink") from e
            client = redis_lib.Redis.from_url(url)
        else:
            client = client_factory()

        def flush(rows: list) -> None:
            pipe = client.pipeline(transaction=False)
            for r in rows:
                vec = r.embeddings
                pipe.hset(
                    f"{key_prefix}:{r.id}",
                    mapping={
                        **_payload_extras(r),
                        "embedding": _struct.pack(f"<{len(vec)}f", *vec),
                        "source_data": r.source_data,
                        "source_document": r.source_document,
                    },
                )
            pipe.execute()

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def write_lancedb(
    records: DataFrame,
    table: str,
    uri: str = "/tmp/lancedb",
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    client_factory: Callable[[], Any] | None = None,
) -> None:
    """LanceDB merge-insert ("upsert" in their docs): match on ``id``,
    update matched rows, insert the rest — idempotent on the uuid5 key.
    ``client_factory`` must return a table-like object exposing the
    documented ``merge_insert(on).when_matched_update_all()
    .when_not_matched_insert_all().execute(rows)`` chain."""

    def per_partition(partition: Iterator) -> None:
        if client_factory is None:
            try:  # pragma: no cover - client not installed in this env
                import lancedb
            except ImportError as e:
                raise RuntimeError("lancedb is not installed; use the parquet sink") from e
            tbl = lancedb.connect(uri).open_table(table)
        else:
            tbl = client_factory()

        def flush(rows: list) -> None:
            (
                tbl.merge_insert("id")
                .when_matched_update_all()
                .when_not_matched_insert_all()
                .execute(
                    [
                        {
                            **_payload_extras(r),
                            "id": r.id,
                            "vector": list(r.embeddings),
                            "source_data": r.source_data,
                            "source_document": r.source_document,
                        }
                        for r in rows
                    ]
                )
            )

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def write_mongodb(
    records: DataFrame,
    collection: str,
    database: str = "vectors",
    uri: str = "mongodb://localhost:27017",
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    client_factory: Callable[[], Any] | None = None,
) -> None:
    """MongoDB (Atlas Vector Search document shape): unordered
    ``bulk_write`` of ``ReplaceOne(..., upsert=True)`` keyed on ``_id``
    (the uuid5 id), one round trip per flush — replays replace with
    identical documents (U6). With an injected ``client_factory`` the
    operations are plain dicts of the same fields."""

    def per_partition(partition: Iterator) -> None:
        if client_factory is None:
            try:  # pragma: no cover - client not installed in this env
                from pymongo import MongoClient, ReplaceOne
            except ImportError as e:
                raise RuntimeError("pymongo is not installed; use the parquet sink") from e
            coll = MongoClient(uri)[database][collection]

            def make_op(flt, doc):
                return ReplaceOne(flt, doc, upsert=True)
        else:
            coll = client_factory()

            def make_op(flt, doc):
                return {"filter": flt, "replacement": doc, "upsert": True}

        def flush(rows: list) -> None:
            coll.bulk_write(
                [
                    make_op(
                        {"_id": r.id},
                        {
                            **_payload_extras(r),
                            "_id": r.id,
                            "embedding": list(r.embeddings),
                            "source_data": r.source_data,
                            "source_document": r.source_document,
                        },
                    )
                    for r in rows
                ],
                ordered=False,
            )

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def write_vespa(
    records: DataFrame,
    doc_type: str,
    namespace: str = "vectorflow",
    endpoint: str = "http://localhost:8080",
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    session_factory: Callable[[], Any] | None = None,
) -> None:
    """Vespa Document V1 API: one idempotent PUT per document at
    ``/document/v1/{namespace}/{doc_type}/docid/{id}`` with the tensor
    field as the values list — PUT replaces, so retries converge. HTTP
    rides an injectable session (the webhook-sink pattern);
    ``session_factory`` must return an object with ``put(url, json=...)``
    returning a response with ``raise_for_status``."""

    def per_partition(partition: Iterator) -> None:
        if session_factory is None:
            import requests  # pragma: no cover - exercised via injection

            session = requests.Session()
        else:
            session = session_factory()

        def flush(rows: list) -> None:
            for r in rows:
                resp = session.put(
                    f"{endpoint}/document/v1/{namespace}/{doc_type}/docid/{r.id}",
                    json={
                        "fields": {
                            **_payload_extras(r),
                            "embedding": {"values": list(r.embeddings)},
                            "source_data": r.source_data,
                            "source_document": r.source_document,
                        }
                    },
                    timeout=30,
                )
                resp.raise_for_status()

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def write_deeplake(
    records: DataFrame,
    dataset_path: str = "hub://org/vectors",
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    client_factory: Callable[[], Any] | None = None,
) -> None:
    """Deep Lake vector store: batched ``add(text=..., embedding=...,
    id=..., metadata=...)`` calls (the deeplake VectorStore API). Deep
    Lake appends rather than keying on id, so EXACTLY-once here needs
    the id column: replays under task retry may duplicate rows and the
    documented dedup is a downstream ``dropDuplicates('id')`` or the
    store's own id-based search — recorded as this sink's contract
    (weaker than U6's keyed upsert; the reference never implemented any
    semantics for its DEEPLAKE enum value to match). ``client_factory``
    must return an object with ``add(**columns)``."""

    def per_partition(partition: Iterator) -> None:
        if client_factory is None:
            try:  # pragma: no cover - client not installed in this env
                from deeplake.core.vectorstore import VectorStore
            except ImportError as e:
                raise RuntimeError("deeplake is not installed; use the parquet sink") from e
            store = VectorStore(path=dataset_path)
        else:
            store = client_factory()

        def flush(rows: list) -> None:
            store.add(
                id=[r.id for r in rows],
                text=[r.source_data for r in rows],
                embedding=[list(r.embeddings) for r in rows],
                metadata=[
                    {**_payload_extras(r), "source_document": r.source_document} for r in rows
                ],
            )

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def write_webhook(records: DataFrame, url: str, webhook_key: str = "", batch_size: int = VECTOR_UPSERT_BATCH_SIZE) -> None:
    """U5: POST chunks+vectors to a user webhook (reference
    send_embeddings_to_webhook, src/shared/utils.py:15-32)."""

    def per_partition(partition: Iterator) -> None:
        import requests

        def flush(rows: list) -> None:
            payload = {
                "Embeddings": [
                    {
                        **_payload_extras(r),
                        "chunk_id": r.id,
                        "text": r.source_data,
                        "vector": list(r.embeddings),
                        "source_document": r.source_document,
                    }
                    for r in rows
                ],
            }
            resp = requests.post(
                url,
                json=payload,
                headers={"X-Embeddings-Webhook-Key": webhook_key, "Content-Type": "application/json"},
                timeout=30,
            )
            resp.raise_for_status()

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def write_metadata_store(
    records: DataFrame,
    callback: Callable[[list[dict]], None],
    batch_size: int = VECTOR_UPSERT_BATCH_SIZE,
    include_stats: bool = True,
) -> None:
    """Object-metadata callback sink (reference roadmap README.md:293:
    "Support callbacks for writing object metadata to a separate store"):
    stream per-object metadata — NEVER vectors or text bodies — to a
    user-supplied callback in ``batch_size`` slices, one partition at a
    time. The callback receives ``[{id, source_document, n_chars, dim,
    **configured metadata}, ...]`` and typically POSTs to a catalog /
    metadata DB beside the vector store.

    Run it as a SECOND action after the vector write, on the same cached
    ``records`` DataFrame — the metadata row is ~100 bytes where the
    vector row is KBs, so the extra pass is catalog-priced, and keeping
    it a separate action means a metadata-store outage never fails the
    vector upsert (and vice versa). Idempotent for keyed metadata stores
    by the same uuid5-id argument as U6; the callback must tolerate
    replays. The callback is executed ON EXECUTORS (it must be picklable
    and create its own connections lazily, like ``client_factory``)."""

    def per_partition(partition: Iterator) -> None:
        def flush(rows: list) -> None:
            batch = []
            for r in rows:
                meta = {
                    **_payload_extras(r),
                    "id": r.id,
                    "source_document": r.source_document,
                }
                if include_stats:
                    meta["n_chars"] = len(r.source_data) if r.source_data is not None else 0
                    meta["dim"] = len(r.embeddings) if r.embeddings is not None else 0
                batch.append(meta)
            callback(batch)

        _buffered(partition, flush, batch_size)

    records.foreachPartition(per_partition)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-files maintenance: rewrite a parquet dataset into
    ceil(total_bytes / target) files (~128 MB default — the HDFS/S3 sweet
    spot where scan tasks amortize open/seek cost). Streaming foreachBatch
    sinks and per-micro-batch appends accumulate thousands of KB-sized
    files; at 100 TB that is metadata-bound listing and task-per-tiny-file
    scheduling. ``sort_cols`` sorts within partitions on the way through
    (run-length + min/max-pruning locality for the columns queries filter
    on). Returns the new file count.

    Swap is write-to-staging + atomic-ish directory rename (Spark cannot
    overwrite a path it is reading). On object stores, prefer writing a
    new versioned prefix and flipping a pointer; this helper implements
    the filesystem form."""
    import math
    import shutil
    import urllib.parse

    df = spark.read.parquet(path)
    files = df.inputFiles()
    total = 0
    for uri in files:
        p = urllib.parse.urlparse(uri).path
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    n_out = max(1, math.ceil(total / target_file_bytes))
    out = df.repartition(n_out)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    staging = path.rstrip("/") + ".compact.tmp"
    out.write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    return n_out


def write_vectors(records: DataFrame, cfg: PipelineConfig) -> None:
    """U4 dispatch: strategy map keyed on cfg.sink."""
    opts = cfg.sink_options
    if cfg.sink == "parquet":
        write_parquet(records, opts["path"], opts.get("mode", "overwrite"))
    elif cfg.sink == "qdrant":
        write_qdrant(records, opts["collection"], opts.get("url", "http://localhost:6333"), cfg.upsert_batch_size)
    elif cfg.sink == "pinecone":
        write_pinecone(records, opts["index_name"], opts.get("api_key_env", "VECTOR_DB_KEY"), cfg.upsert_batch_size)
    elif cfg.sink == "weaviate":
        write_weaviate(records, opts["class_name"], opts.get("url", "http://localhost:8080"), cfg.upsert_batch_size)
    elif cfg.sink == "pgvector":
        write_pgvector(
            records,
            opts["table"],
            opts.get("dsn", "postgresql://localhost:5432/vectors"),
            cfg.upsert_batch_size,
        )
    elif cfg.sink == "milvus":
        write_milvus(
            records, opts["collection"], opts.get("uri", "http://localhost:19530"),
            cfg.upsert_batch_size,
        )
    elif cfg.sink == "redis":
        write_redis(
            records, opts.get("key_prefix", "vec"),
            opts.get("url", "redis://localhost:6379"), cfg.upsert_batch_size,
        )
    elif cfg.sink == "lancedb":
        write_lancedb(
            records, opts["table"], opts.get("uri", "/tmp/lancedb"),
            cfg.upsert_batch_size,
        )
    elif cfg.sink == "mongodb":
        write_mongodb(
            records, opts["collection"], opts.get("database", "vectors"),
            opts.get("uri", "mongodb://localhost:27017"), cfg.upsert_batch_size,
        )
    elif cfg.sink == "vespa":
        write_vespa(
            records, opts["doc_type"], opts.get("namespace", "vectorflow"),
            opts.get("endpoint", "http://localhost:8080"), cfg.upsert_batch_size,
        )
    elif cfg.sink == "deeplake":
        write_deeplake(
            records, opts.get("dataset_path", "hub://org/vectors"),
            cfg.upsert_batch_size,
        )
    elif cfg.sink == "webhook":
        write_webhook(records, opts["url"], opts.get("webhook_key", ""), cfg.upsert_batch_size)
    else:
        raise ValueError(f"unknown sink: {cfg.sink}")


# ---------------------------------------------------------------------------
# Versioned vector store (reference roadmap X4 "vector version control",
# reference README.md:290-299 — no code exists there; SURVEY.md §2.11).
# ---------------------------------------------------------------------------


MANIFEST_NAME = "_MANIFEST"


def _read_manifest(root: str) -> dict | None:
    """The committed store state, or None for legacy/empty stores."""
    import json

    try:
        with open(os.path.join(root, MANIFEST_NAME)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _commit_manifest(root: str, versions: set[int]) -> None:
    """Atomically replace the manifest (write-temp + rename-commit). The
    manifest is the ONLY source of truth for which versions exist; a
    version directory not listed here is uncommitted debris. On a real
    object store this maps to put-object of a single small key (readers
    see old-or-new manifest, never a partial listing), which is what
    makes the store safe without S3 listing consistency."""
    import json

    payload = {"versions": sorted(versions), "latest": max(versions) if versions else 0}
    tmp = os.path.join(root, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(root, MANIFEST_NAME))


def list_versions(root: str, prefix: str = "v") -> list[int]:
    """Committed versions, ascending. Reads the manifest; falls back to a
    directory glob only for legacy stores that predate it (local-FS only
    — the glob path is what the manifest exists to replace)."""
    m = _read_manifest(root)
    if m is not None:
        return sorted(int(v) for v in m["versions"])
    import glob
    import re

    return sorted(
        int(mt.group(1))
        for d in glob.glob(os.path.join(root, f"{prefix}=*"))
        if (mt := re.search(rf"{prefix}=(\d+)$", d))
    )


def versioned_write(df: DataFrame, root: str) -> int:
    """Write the next immutable version of a dataset and commit it to the
    manifest.

    Layout: ``root/v=N/`` parquet directories plus one ``_MANIFEST`` JSON
    file (``{"versions": [...], "latest": N}``) replaced atomically by
    rename-commit. Writers never mutate an existing version (object-store
    friendly: no read-modify-write of data files); readers either follow
    the manifest's latest or pin a version, which is what makes
    embedding-model upgrades auditable and instantly revertible —
    re-embedding writes v=N+1 while serving keeps reading v=N until the
    manifest flips. Returns the version written.

    Crash-safe without listing consistency: a writer that dies after the
    parquet write but before the manifest commit leaves an orphan
    directory that NO reader can observe (readers only trust the
    manifest); the next write self-heals by overwriting that orphan
    path. Old versions are retained for time travel; ``vacuum_versions``
    is the retention pass.

    Concurrency: two writers racing from the same manifest compute the
    same N+1, so the data is written to a private staging directory
    first; after the (slow) write we re-read the manifest and REFUSE if
    someone committed our version (or a later one) meanwhile — the loser
    deletes its staging and raises, never having touched the committed
    path. The clobber window shrinks from the whole parquet write to one
    directory rename. (Last-writer-wins on the manifest itself is still
    possible on a filesystem without compare-and-swap; full multi-writer
    safety needs a CAS'd manifest a la Delta/Iceberg.)"""
    import shutil
    import tempfile

    versions = set(list_versions(root))
    version = (max(versions) if versions else 0) + 1
    os.makedirs(root, exist_ok=True)
    staging = tempfile.mkdtemp(dir=root, prefix=".staging-")
    try:
        df.write.mode("overwrite").parquet(staging)
        committed_now = set(list_versions(root))
        if any(v >= version for v in committed_now):
            raise RuntimeError(
                f"concurrent writer committed version >= {version} under {root} "
                "while this write was in flight; refusing to commit over it — "
                "re-run to write the next free version"
            )
        target = os.path.join(root, f"v={version}")
        # target, if present, is an uncommitted orphan (just re-verified)
        shutil.rmtree(target, ignore_errors=True)
        os.replace(staging, target)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    _commit_manifest(root, committed_now | {version})
    return version


def read_latest_version(root: str) -> int:
    """Latest committed version; 0 when the store is empty. Reads the
    manifest, falling back to the legacy ``_LATEST`` pointer file for
    stores written before the manifest existed."""
    m = _read_manifest(root)
    if m is not None:
        return int(m["latest"])
    try:
        with open(os.path.join(root, "_LATEST")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return 0


def read_versioned(spark, root: str, version: int | None = None) -> DataFrame:
    """Read the latest committed version (default) or pin ``version`` for
    time travel. Raises if the store is empty or the pinned version is
    absent/uncommitted — an orphan directory from a crashed write is NOT
    readable, by design."""
    v = version if version is not None else read_latest_version(root)
    if v <= 0:
        raise ValueError(f"no versions written under {root}")
    m = _read_manifest(root)
    if m is not None and v not in set(m["versions"]):
        raise ValueError(f"version {v} is not committed under {root}")
    return spark.read.parquet(f"{root}/v={v}")


def versioned_merge(
    spark,
    root: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> int:
    """Delta-style MERGE INTO on the plain-parquet versioned store: read
    the latest committed version, apply ``operators.diff.merge_upsert``
    (matched -> update/delete, not-matched -> insert), write the result
    as version N+1 and commit the manifest. Returns the new version.

    The write is copy-on-write at VERSION granularity — simple, atomic
    via the manifest, and time travel falls out for free. The cost is
    rewriting the full snapshot per merge; for update streams frequent
    enough that this matters, ``streaming/pipeline.streaming_scd2``
    amortizes exactly this plan per micro-batch, and a real lakehouse
    format (Delta/Iceberg) would add file-level copy-on-write beneath the
    same merge plan. An EMPTY store (no versions yet) treats the updates
    as the initial snapshot (surviving rows only)."""
    from vectorflow_spark.operators.diff import merge_upsert

    latest = read_latest_version(root)
    if latest <= 0:
        survivors = updates
        if delete_col is not None:
            survivors = updates.filter(
                ~F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
            )
        base_cols = [c for c in updates.columns if c != delete_col]
        return versioned_write(survivors.select(*base_cols), root)
    current = read_versioned(spark, root, latest)
    merged = merge_upsert(current, updates, key_cols, delete_col=delete_col)
    return versioned_write(merged, root)


def vacuum_versions(root: str, keep_last: int = 2, prefix: str = "v") -> list[int]:
    """Delete version directories older than the newest ``keep_last``,
    never the latest — the retention half of the versioned store.
    Returns the versions removed. The manifest is committed FIRST (drop
    the versions, rename-commit) and the directories deleted after, so a
    crash mid-vacuum leaves unreferenced debris, never a manifest entry
    pointing at missing data; a concurrent reader following the manifest
    cannot observe a half-deleted version. Callers are responsible for
    having repointed any pinned time-travel readers first."""
    import shutil

    if keep_last <= 0:
        # versions[-0:] would silently keep EVERYTHING — the opposite of
        # the caller's likely intent — and keep_last=0 would also delete
        # the pointer target; both are bugs at the call site, so refuse.
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    latest = read_latest_version(root)
    versions = list_versions(root, prefix=prefix)
    keep = set(versions[-keep_last:]) | {latest}
    removed = [v for v in versions if v not in keep]
    # Validate BEFORE the manifest commit: a prefix mismatch (e.g. a
    # streaming_scd2 store laid out as version=N vacuumed with the default
    # "v") would otherwise drop manifest entries while deleting nothing,
    # leaving unreadable-but-present data on disk.
    paths = {v: os.path.join(root, f"{prefix}={v}") for v in removed}
    missing = [p for p in paths.values() if not os.path.isdir(p)]
    if missing:
        raise ValueError(
            f"vacuum_versions(prefix={prefix!r}): version directories not found: "
            f"{missing}; wrong prefix for this store's layout?"
        )
    _commit_manifest(root, keep)
    for p in paths.values():
        shutil.rmtree(p)
    return removed
