"""Optional LIVE Qdrant integration for the U2 sink wire path.

The offline contract tests (test_sink_contracts.py) pin slicing, field
names and idempotency through an injected fake; this module drives the
REAL qdrant-client against a real server — the reference's own
docker-compose topology (reference docker-compose.yml:34-41 runs a
`qdrant/qdrant` service next to the workers) — and skips cleanly when
either the client package or the server is absent, which keeps the wire
path honest the day this sandbox allows network services without turning
CI red today.

Run it with:  docker run -p 6333:6333 qdrant/qdrant
              pip install qdrant-client
              QDRANT_URL=http://localhost:6333 pytest tests/test_live_qdrant.py
"""

from __future__ import annotations

import os
import urllib.request

import pytest
from pyspark.sql import functions as F

QDRANT_URL = os.environ.get("QDRANT_URL", "http://localhost:6333")


def _qdrant_reachable() -> bool:
    try:
        import qdrant_client  # noqa: F401
    except ImportError:
        return False
    try:
        with urllib.request.urlopen(QDRANT_URL + "/collections", timeout=2) as r:
            return r.status == 200
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _qdrant_reachable(),
    reason="no live Qdrant: install qdrant-client and start the reference's "
    "docker-compose qdrant service (or `docker run -p 6333:6333 qdrant/qdrant`)",
)


@pytest.fixture()
def records(spark):
    from vectorflow_spark.sinks.writers import to_vector_records

    chunks = spark.range(0, 150).select(
        F.concat(F.lit("chunk text "), F.col("id")).alias("text"),
        F.lit("live.txt").alias("source"),
        F.transform(F.sequence(F.lit(1), F.lit(8)), lambda i: (i + F.col("id")).cast("float") / 10.0).alias(
            "vector"
        ),
    )
    return to_vector_records(chunks).repartition(2)


def test_live_upsert_roundtrip_and_idempotency(spark, records):
    from qdrant_client import QdrantClient
    from qdrant_client.models import Distance, VectorParams

    from vectorflow_spark.sinks.writers import write_qdrant

    collection = "vf_live_smoke"
    dim = len(records.select("embeddings").first()[0])
    admin = QdrantClient(url=QDRANT_URL)
    if admin.collection_exists(collection):
        admin.delete_collection(collection)
    admin.create_collection(collection, vectors_config=VectorParams(size=dim, distance=Distance.COSINE))
    try:
        write_qdrant(records, collection, url=QDRANT_URL)
        n = records.count()
        assert admin.count(collection, exact=True).count == n
        # U6 idempotency over the REAL wire: a replayed write upserts the
        # same uuid5 ids, so the collection converges to one copy per id
        write_qdrant(records, collection, url=QDRANT_URL)
        assert admin.count(collection, exact=True).count == n
        pts, _ = admin.scroll(collection, limit=3, with_payload=True)
        for p in pts:
            assert set(p.payload) == {"source_data", "source_document"}
            assert p.payload["source_document"] == "live.txt"
    finally:
        admin.delete_collection(collection)
