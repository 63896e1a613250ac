"""Optional LIVE integration for the U1/U3/pgvector sink wire paths
(Pinecone, Weaviate, pgvector), completing the pattern
tests/test_live_qdrant.py sets for U2: offline contract tests pin
slicing/fields/idempotency through injected fakes; these drive the REAL
clients against reachable services and skip cleanly when either piece is
absent (the reference runs these stores live —
src/worker/vector_uploader.py:55-163 — so the day this sandbox allows
network services, the wire paths turn green instead of untested).

Weaviate:  docker run -p 8080:8080 semitechnologies/weaviate
           pip install weaviate-client
Pinecone:  export PINECONE_API_KEY=...  PINECONE_INDEX=<existing index>
           pip install pinecone
pgvector:  docker run -p 5432:5432 -e POSTGRES_PASSWORD=pw pgvector/pgvector:pg16
           pip install psycopg  # then export PGVECTOR_DSN if non-default
"""

from __future__ import annotations

import os
import urllib.request

import pytest
from pyspark.sql import functions as F

WEAVIATE_URL = os.environ.get("WEAVIATE_URL", "http://localhost:8080")
PGVECTOR_DSN = os.environ.get(
    "PGVECTOR_DSN", "postgresql://postgres:pw@localhost:5432/postgres"
)


def _pgvector_reachable() -> bool:
    try:
        import psycopg
    except ImportError:
        try:
            import psycopg2 as psycopg  # noqa: F401
        except ImportError:
            return False
    try:
        conn = psycopg.connect(PGVECTOR_DSN, connect_timeout=2)
    except Exception:
        return False
    try:
        with conn.cursor() as cur:
            cur.execute("CREATE EXTENSION IF NOT EXISTS vector")
        conn.commit()
        return True
    except Exception:
        return False
    finally:
        conn.close()


def _weaviate_reachable() -> bool:
    try:
        import weaviate  # noqa: F401
    except ImportError:
        return False
    try:
        with urllib.request.urlopen(WEAVIATE_URL + "/v1/.well-known/ready", timeout=2) as r:
            return r.status == 200
    except Exception:
        return False


def _pinecone_ready() -> bool:
    if not (os.environ.get("PINECONE_API_KEY") and os.environ.get("PINECONE_INDEX")):
        return False
    try:
        import pinecone  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.fixture()
def records(spark):
    from vectorflow_spark.sinks.writers import to_vector_records

    chunks = spark.range(0, 130).select(
        F.concat(F.lit("chunk "), F.col("id")).alias("text"),
        F.lit("live.txt").alias("source"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)), lambda i: (i + F.col("id")).cast("float") / 10.0
        ).alias("vector"),
    )
    return to_vector_records(chunks).repartition(2)


@pytest.mark.skipif(
    not _weaviate_reachable(),
    reason="no live Weaviate: install weaviate-client and run "
    "`docker run -p 8080:8080 semitechnologies/weaviate`",
)
def test_live_weaviate_upsert_and_idempotency(spark, records):
    import weaviate

    from vectorflow_spark.sinks.writers import write_weaviate

    class_name = "VfLiveSmoke"
    client = weaviate.Client(url=WEAVIATE_URL)
    if client.schema.exists(class_name):
        client.schema.delete_class(class_name)
    client.schema.create_class(
        {
            "class": class_name,
            "vectorizer": "none",
            "properties": [
                {"name": "source_data", "dataType": ["text"]},
                {"name": "vectorflow_id", "dataType": ["text"]},
                {"name": "source_document", "dataType": ["text"]},
            ],
        }
    )
    try:
        write_weaviate(records, class_name, url=WEAVIATE_URL)
        n = records.count()

        def count() -> int:
            agg = client.query.aggregate(class_name).with_meta_count().do()
            return agg["data"]["Aggregate"][class_name][0]["meta"]["count"]

        assert count() == n
        # NOTE the documented asymmetry vs the keyed stores: weaviate's
        # add_data_object mints a fresh uuid per call, so a replay
        # DUPLICATES objects unless ids are supplied — the engine's
        # dedup-by-vectorflow_id happens at read time (the reference has
        # the same behavior, vector_uploader.py:146-151)
        write_weaviate(records, class_name, url=WEAVIATE_URL)
        assert count() == 2 * n
        got = (
            client.query.get(class_name, ["source_document", "vectorflow_id"])
            .with_limit(3)
            .do()["data"]["Get"][class_name]
        )
        assert all(o["source_document"] == "live.txt" for o in got)
    finally:
        client.schema.delete_class(class_name)


@pytest.mark.skipif(
    not _pgvector_reachable(),
    reason="no live pgvector: install psycopg and run "
    "`docker run -p 5432:5432 -e POSTGRES_PASSWORD=pw pgvector/pgvector:pg16` "
    "(override PGVECTOR_DSN if non-default)",
)
def test_live_pgvector_upsert_and_idempotency(spark, records):
    """The U4 pgvector wire path (writers.write_pgvector) against a real
    postgres+pgvector: batched multi-row upserts, uuid5-id idempotency
    (replay converges in place, U6), and the ::vector text-literal cast
    round-tripping the embedding."""
    import psycopg

    from vectorflow_spark.sinks.writers import write_pgvector

    table = "vf_live_smoke"
    conn = psycopg.connect(PGVECTOR_DSN)
    with conn.cursor() as cur:
        cur.execute(f"DROP TABLE IF EXISTS {table}")
        cur.execute(
            f"CREATE TABLE {table} (id uuid PRIMARY KEY, embedding vector(8) "
            "NOT NULL, source_data text, source_document text)"
        )
    conn.commit()
    try:
        write_pgvector(records, table, dsn=PGVECTOR_DSN)
        n = records.count()
        with conn.cursor() as cur:
            cur.execute(f"SELECT count(*) FROM {table}")
            assert cur.fetchone()[0] == n
        # idempotent replay: same uuid5 ids ON CONFLICT DO UPDATE in place
        write_pgvector(records, table, dsn=PGVECTOR_DSN)
        with conn.cursor() as cur:
            cur.execute(f"SELECT count(*) FROM {table}")
            assert cur.fetchone()[0] == n
            cur.execute(
                f"SELECT embedding::text, source_document FROM {table} LIMIT 3"
            )
            for emb_text, src in cur.fetchall():
                assert src == "live.txt"
                vals = [float(x) for x in emb_text.strip("[]").split(",")]
                assert len(vals) == 8
    finally:
        with conn.cursor() as cur:
            cur.execute(f"DROP TABLE IF EXISTS {table}")
        conn.commit()
        conn.close()


@pytest.mark.skipif(
    not _pinecone_ready(),
    reason="no live Pinecone: set PINECONE_API_KEY + PINECONE_INDEX and "
    "install the pinecone package",
)
def test_live_pinecone_upsert_and_idempotency(spark, records, monkeypatch):
    from pinecone import Pinecone

    from vectorflow_spark.sinks.writers import write_pinecone

    monkeypatch.setenv("VECTOR_DB_KEY", os.environ["PINECONE_API_KEY"])
    index_name = os.environ["PINECONE_INDEX"]
    write_pinecone(records, index_name)
    pc = Pinecone(api_key=os.environ["PINECONE_API_KEY"])
    index = pc.Index(index_name)
    ids = [r.id for r in records.select("id").limit(3).collect()]
    got = index.fetch(ids=ids)
    assert set(got.vectors) == set(ids)
    # idempotent replay: same uuid5 ids re-upsert in place (U6)
    write_pinecone(records, index_name)
    got = index.fetch(ids=ids)
    assert set(got.vectors) == set(ids)
    for v in got.vectors.values():
        assert v.metadata["source_document"] == "live.txt"
