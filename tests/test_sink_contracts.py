"""U1-U3 sink contract tests with injected fake clients — no network, no
client packages.

Each fake client records every flush it receives as one JSON file in a
spool directory (executors are separate processes, so in-memory recording
would be invisible to the test; the spool is the observable channel). The
fakes are defined INSIDE factory functions so cloudpickle ships them by
value to the workers (a module-level class in an unimportable test module
would pickle by reference and fail there).

Asserted per writer:
  * 128-slicing: 300 rows in one partition arrive as flushes of
    [128, 128, 44] — the reference's PINECONE_BATCH_SIZE contract
    (src/worker/config.py:3) applied to every store;
  * payload field names exactly match the documented shape
    (src/worker/vector_uploader.py:55-62 / :88-98 / :146-151), including
    our deliberate 'vectorflow_id' vs the reference's 'vectoflow_id' typo;
  * idempotency: a re-run upserts the SAME ids with the SAME payloads, so
    a keyed store converges to one copy (U6).
"""

import json
import pathlib

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.sinks.writers import (
    to_vector_records,
    write_pinecone,
    write_qdrant,
    write_weaviate,
)


def _flushes(spool: str) -> list:
    return [json.loads(p.read_text()) for p in sorted(pathlib.Path(spool).iterdir())]


def make_fake_qdrant_factory(spool: str):
    def factory():
        import json as j
        import pathlib as pl
        import uuid as u

        class FakeQdrant:
            def upsert(self, collection_name, points):
                (pl.Path(spool) / f"{u.uuid4().hex}.json").write_text(
                    j.dumps({"collection": collection_name, "points": points})
                )

        return FakeQdrant()

    return factory


def make_fake_pinecone_factory(spool: str):
    def factory():
        import json as j
        import pathlib as pl
        import uuid as u

        class FakeIndex:
            def __init__(self, name):
                self.name = name

            def upsert(self, vectors):
                (pl.Path(spool) / f"{u.uuid4().hex}.json").write_text(
                    j.dumps(
                        {
                            "index": self.name,
                            "vectors": [[i, list(v), m] for i, v, m in vectors],
                        }
                    )
                )

        class FakePinecone:
            def Index(self, name):
                return FakeIndex(name)

        return FakePinecone()

    return factory


def make_fake_weaviate_factory(spool: str):
    def factory():
        import json as j
        import pathlib as pl
        import uuid as u

        class FakeBatch:
            def __init__(self, batch_size):
                self.batch_size, self.objs = batch_size, []

            def __enter__(self):
                return self

            def __exit__(self, *a):
                (pl.Path(spool) / f"{u.uuid4().hex}.json").write_text(
                    j.dumps({"batch_size": self.batch_size, "objects": self.objs})
                )
                return False

            def add_data_object(self, data_object, class_name, vector):
                self.objs.append(
                    {
                        "data_object": data_object,
                        "class_name": class_name,
                        "vector": list(vector),
                    }
                )

        class FakeWeaviate:
            def batch(self, batch_size, dynamic):
                return FakeBatch(batch_size)

        return FakeWeaviate()

    return factory


@pytest.fixture(scope="module")
def records(spark):
    chunks = spark.range(300).select(
        F.col("id").cast("string").alias("chunk_id"),
        F.concat(F.lit("chunk text "), F.col("id")).alias("text"),
        F.concat(F.lit("doc"), (F.col("id") % 5).cast("string"), F.lit(".txt")).alias("source"),
        F.array(F.lit(0.25), (F.col("id") % 10).cast("float") / 10).alias("vector"),
    )
    # single partition so the 128-row buffer actually slices: [128, 128, 44]
    return to_vector_records(chunks).repartition(1)


class TestCompaction:
    def test_small_files_compact_and_data_survives(self, spark, tmp_path):
        from vectorflow_spark.sinks.writers import compact_parquet

        path = str(tmp_path / "frag")
        spark.range(10_000).repartition(32).write.parquet(path)
        before = spark.read.parquet(path)
        assert len(before.inputFiles()) >= 32
        total_before = before.groupBy().sum("id").first()[0]

        n_out = compact_parquet(spark, path, target_file_bytes=1 << 30, sort_cols=["id"])
        after = spark.read.parquet(path)
        assert n_out == 1 and len(after.inputFiles()) == 1
        assert after.count() == 10_000
        assert after.groupBy().sum("id").first()[0] == total_before


class TestQdrantContract:
    def test_slicing_fields_idempotency(self, records, tmp_path):
        spool = str(tmp_path)
        write_qdrant(records, "chunks", client_factory=make_fake_qdrant_factory(spool))
        flushes = _flushes(spool)
        assert sorted(len(f["points"]) for f in flushes) == [44, 128, 128]
        assert all(f["collection"] == "chunks" for f in flushes)
        points = [p for f in flushes for p in f["points"]]
        assert len(points) == 300
        for p in points[:3]:
            assert set(p) == {"id", "vector", "payload"}
            assert set(p["payload"]) == {"source_data", "source_document"}

        # idempotent re-run: the same ids upsert the same payloads, so a
        # keyed store converges to exactly one copy per id
        write_qdrant(records, "chunks", client_factory=make_fake_qdrant_factory(spool))
        store = {}
        for f in _flushes(spool):
            for p in f.get("points", []):
                if p["id"] in store:
                    assert store[p["id"]] == p  # re-upsert is byte-identical
                store[p["id"]] = p
        assert len(store) == 300


class TestPineconeContract:
    def test_slicing_and_metadata_fields(self, records, tmp_path):
        spool = str(tmp_path)
        write_pinecone(records, "idx", client_factory=make_fake_pinecone_factory(spool))
        flushes = _flushes(spool)
        assert sorted(len(f["vectors"]) for f in flushes) == [44, 128, 128]
        assert all(f["index"] == "idx" for f in flushes)
        vid, vec, meta = flushes[0]["vectors"][0]
        assert isinstance(vid, str) and isinstance(vec, list)
        # reference vector_uploader.py:55-86 metadata keys
        assert set(meta) == {"source_text", "source_document"}


class TestWeaviateContract:
    def test_slicing_and_property_names(self, records, tmp_path):
        spool = str(tmp_path)
        write_weaviate(records, "Chunk", client_factory=make_fake_weaviate_factory(spool))
        flushes = _flushes(spool)
        assert sorted(len(f["objects"]) for f in flushes) == [44, 128, 128]
        obj = flushes[0]["objects"][0]
        assert obj["class_name"] == "Chunk"
        # documented divergence: 'vectorflow_id', not the reference's
        # 'vectoflow_id' typo (vector_uploader.py:149)
        assert set(obj["data_object"]) == {"source_data", "vectorflow_id", "source_document"}
        assert len(obj["vector"]) == 2


def make_fake_pg_factory(spool: str):
    def factory():
        import json as j
        import pathlib as pl
        import uuid as u

        class FakeCursor:
            def __init__(self, conn):
                self.conn = conn

            def execute(self, sql, params):
                self.conn.pending.append({"sql": sql, "params": list(params)})

            def close(self):
                pass

        class FakePgConn:
            def __init__(self):
                self.pending, self.closed = [], False

            def cursor(self):
                return FakeCursor(self)

            def commit(self):
                # only COMMITTED batches reach the spool: asserts the
                # one-commit-per-flush contract
                for stmt in self.pending:
                    (pl.Path(spool) / f"{u.uuid4().hex}.json").write_text(j.dumps(stmt))
                self.pending = []

            def close(self):
                self.closed = True

        return FakePgConn()

    return factory


class TestPgvectorContract:
    def test_slicing_upsert_shape_and_idempotency(self, records, tmp_path):
        from vectorflow_spark.sinks.writers import write_pgvector

        spool = str(tmp_path)
        write_pgvector(records, "chunks", client_factory=make_fake_pg_factory(spool))
        flushes = _flushes(spool)
        # 4 bind params per row: [128, 128, 44]
        assert sorted(len(f["params"]) // 4 for f in flushes) == [44, 128, 128]
        for f in flushes:
            n = len(f["params"]) // 4
            sql = f["sql"]
            assert sql.startswith(
                "INSERT INTO chunks (id, embedding, source_data, source_document) VALUES "
            )
            # idempotent upsert on the deterministic uuid5 key (U6)
            assert (
                "ON CONFLICT (id) DO UPDATE SET embedding = EXCLUDED.embedding, "
                "source_data = EXCLUDED.source_data, "
                "source_document = EXCLUDED.source_document" in sql
            )
            # one parameterized row-tuple per buffered row; values are
            # NEVER interpolated into the SQL text
            assert sql.count("(%s, %s::vector, %s, %s)") == n
            assert "chunk text" not in sql
            # embedding travels as the pgvector text literal
            for i in range(n):
                vec = f["params"][i * 4 + 1]
                assert vec.startswith("[") and vec.endswith("]")
                assert len(vec[1:-1].split(",")) == 2

        # idempotent re-run converges: same ids -> same full param tuples
        write_pgvector(records, "chunks", client_factory=make_fake_pg_factory(spool))
        store = {}
        for f in _flushes(spool):
            p = f["params"]
            for i in range(len(p) // 4):
                row = tuple(p[i * 4 : i * 4 + 4])
                if row[0] in store:
                    assert store[row[0]] == row
                store[row[0]] = row
        assert len(store) == 300

    def test_table_identifier_validated(self, records):
        from vectorflow_spark.sinks.writers import write_pgvector

        with pytest.raises(ValueError, match="table identifier"):
            write_pgvector(records, "chunks; DROP TABLE users")
        with pytest.raises(ValueError, match="table identifier"):
            write_pgvector(records, 'pub"lic.chunks')
        # schema-qualified names are fine (validated, not executed)
        import re

        assert re.fullmatch(
            r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?", "public.chunks"
        )

    def test_dispatch_routes_pgvector(self, records, tmp_path, monkeypatch):
        from vectorflow_spark import config as cfgmod
        from vectorflow_spark.sinks import writers

        seen = {}
        monkeypatch.setattr(
            writers, "write_pgvector",
            lambda recs, table, dsn, batch: seen.update(table=table, dsn=dsn, batch=batch),
        )
        cfg = cfgmod.PipelineConfig(
            sink="pgvector",
            sink_options={"table": "chunks", "dsn": "postgresql://h/db"},
        )
        writers.write_vectors(records, cfg)
        assert seen == {"table": "chunks", "dsn": "postgresql://h/db", "batch": cfg.upsert_batch_size}


def _spooling(spool: str, make):
    """Build a picklable factory whose fake records each flush to the spool."""
    def factory():
        import json as j
        import pathlib as pl
        import uuid as u

        def record(payload):
            (pl.Path(spool) / f"{u.uuid4().hex}.json").write_text(j.dumps(payload))

        return make(record)

    return factory


def make_fake_milvus_factory(spool: str):
    def make(record):
        class FakeMilvus:
            def upsert(self, collection_name, data):
                record({"collection": collection_name, "data": data})

        return FakeMilvus()

    return _spooling(spool, make)


def make_fake_redis_factory(spool: str):
    def make(record):
        class FakePipe:
            def __init__(self):
                self.cmds = []

            def hset(self, name, mapping):
                self.cmds.append({"name": name, "mapping": {
                    k: (v.hex() if isinstance(v, (bytes, bytearray)) else v)
                    for k, v in mapping.items()}})

            def execute(self):
                record({"cmds": self.cmds})

        class FakeRedis:
            def pipeline(self, transaction):
                assert transaction is False
                return FakePipe()

        return FakeRedis()

    return _spooling(spool, make)


def make_fake_lancedb_factory(spool: str):
    def make(record):
        class FakeMerge:
            def __init__(self, on):
                self.on, self.matched, self.unmatched = on, False, False

            def when_matched_update_all(self):
                self.matched = True
                return self

            def when_not_matched_insert_all(self):
                self.unmatched = True
                return self

            def execute(self, rows):
                record({"on": self.on, "matched": self.matched,
                        "unmatched": self.unmatched, "rows": rows})

        class FakeTable:
            def merge_insert(self, on):
                return FakeMerge(on)

        return FakeTable()

    return _spooling(spool, make)


def make_fake_mongo_factory(spool: str):
    def make(record):
        class FakeColl:
            def bulk_write(self, ops, ordered):
                record({"ordered": ordered, "ops": ops})

        return FakeColl()

    return _spooling(spool, make)


def make_fake_vespa_factory(spool: str):
    def make(record):
        class FakeResp:
            def raise_for_status(self):
                pass

        class FakeSession:
            def put(self, url, json, timeout):
                record({"url": url, "json": json})
                return FakeResp()

        return FakeSession()

    return _spooling(spool, make)


def make_fake_deeplake_factory(spool: str):
    def make(record):
        class FakeStore:
            def add(self, **cols):
                record(cols)

        return FakeStore()

    return _spooling(spool, make)


class TestMilvusContract:
    def test_slicing_fields_idempotency(self, records, tmp_path):
        from vectorflow_spark.sinks.writers import write_milvus

        spool = str(tmp_path)
        write_milvus(records, "chunks", client_factory=make_fake_milvus_factory(spool))
        flushes = _flushes(spool)
        assert sorted(len(f["data"]) for f in flushes) == [44, 128, 128]
        assert all(f["collection"] == "chunks" for f in flushes)
        rows = [r for f in flushes for r in f["data"]]
        assert len(rows) == 300
        assert set(rows[0]) == {"id", "vector", "source_data", "source_document"}
        write_milvus(records, "chunks", client_factory=make_fake_milvus_factory(spool))
        store = {}
        for f in _flushes(spool):
            for r in f.get("data", []):
                if r["id"] in store:
                    assert store[r["id"]] == r
                store[r["id"]] = r
        assert len(store) == 300


class TestRedisContract:
    def test_keys_blob_and_pipeline_batching(self, records, tmp_path):
        from vectorflow_spark.sinks.writers import write_redis

        spool = str(tmp_path)
        write_redis(records, "vec", client_factory=make_fake_redis_factory(spool))
        flushes = _flushes(spool)
        assert sorted(len(f["cmds"]) for f in flushes) == [44, 128, 128]
        cmd = flushes[0]["cmds"][0]
        assert cmd["name"].startswith("vec:")
        assert set(cmd["mapping"]) == {"embedding", "source_data", "source_document"}
        # float32 LE blob: 2-dim vector -> 8 bytes -> 16 hex chars
        assert len(cmd["mapping"]["embedding"]) == 16
        import struct

        v0 = struct.unpack("<2f", bytes.fromhex(cmd["mapping"]["embedding"]))
        assert v0[0] == 0.25


class TestLancedbContract:
    def test_merge_insert_chain_and_slicing(self, records, tmp_path):
        from vectorflow_spark.sinks.writers import write_lancedb

        spool = str(tmp_path)
        write_lancedb(records, "chunks", client_factory=make_fake_lancedb_factory(spool))
        flushes = _flushes(spool)
        assert sorted(len(f["rows"]) for f in flushes) == [44, 128, 128]
        for f in flushes:
            assert f["on"] == "id" and f["matched"] and f["unmatched"]
            assert set(f["rows"][0]) == {"id", "vector", "source_data", "source_document"}


class TestMongodbContract:
    def test_unordered_replaceone_upserts(self, records, tmp_path):
        from vectorflow_spark.sinks.writers import write_mongodb

        spool = str(tmp_path)
        write_mongodb(records, "chunks", client_factory=make_fake_mongo_factory(spool))
        flushes = _flushes(spool)
        assert sorted(len(f["ops"]) for f in flushes) == [44, 128, 128]
        op = flushes[0]["ops"][0]
        assert flushes[0]["ordered"] is False
        assert op["upsert"] is True
        assert op["filter"]["_id"] == op["replacement"]["_id"]
        assert set(op["replacement"]) == {"_id", "embedding", "source_data", "source_document"}


class TestVespaContract:
    def test_put_per_doc_idempotent_url(self, records, tmp_path):
        from vectorflow_spark.sinks.writers import write_vespa

        spool = str(tmp_path)
        write_vespa(records, "chunk", session_factory=make_fake_vespa_factory(spool))
        puts = _flushes(spool)
        assert len(puts) == 300
        p = puts[0]
        assert "/document/v1/vectorflow/chunk/docid/" in p["url"]
        assert set(p["json"]["fields"]) == {"embedding", "source_data", "source_document"}
        assert p["json"]["fields"]["embedding"]["values"][0] == 0.25
        # the docid path component IS the record id (PUT replaces ->
        # idempotent), so the 300 records address 300 distinct URLs
        assert len({q["url"] for q in puts}) == 300


class TestDeeplakeContract:
    def test_columnar_add_slicing(self, records, tmp_path):
        from vectorflow_spark.sinks.writers import write_deeplake

        spool = str(tmp_path)
        write_deeplake(records, client_factory=make_fake_deeplake_factory(spool))
        flushes = _flushes(spool)
        assert sorted(len(f["id"]) for f in flushes) == [44, 128, 128]
        f = flushes[0]
        assert set(f) == {"id", "text", "embedding", "metadata"}
        assert len(f["id"]) == len(f["embedding"]) == len(f["metadata"])
        assert set(f["metadata"][0]) == {"source_document"}
