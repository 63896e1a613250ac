"""Roadmap sink features: dynamically configurable payload schemas
(to_vector_records(metadata=...) merged by every dict-payload writer) and
the object-metadata callback sink (write_metadata_store). Fake clients
spool flushes to disk — the executor-visible channel, same idiom as
tests/test_sink_contracts.py."""

import json
import pathlib

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.sinks.writers import (
    to_vector_records,
    write_metadata_store,
    write_qdrant,
    write_weaviate,
)


def _flushes(spool: str) -> list:
    return [json.loads(p.read_text()) for p in sorted(pathlib.Path(spool).iterdir())]


def _chunks(spark, n: int = 5):
    return spark.range(n).select(
        F.concat(F.lit("id-"), F.col("id")).alias("chunk_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.lit("doc.txt").alias("source"),
        F.array(F.lit(0.1), F.lit(0.2)).alias("vector"),
        (F.col("id") % 3).alias("page"),
        F.lit("en").alias("lang"),
    )


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


def make_fake_weaviate_factory(spool: str):
    def factory():
        import json as j
        import pathlib as pl
        import uuid as u

        class FakeBatch:
            def __init__(self):
                self.objects = []

            def __enter__(self):
                return self

            def __exit__(self, *a):
                (pl.Path(spool) / f"{u.uuid4().hex}.json").write_text(j.dumps(self.objects))

            def add_data_object(self, data_object, class_name, vector):
                self.objects.append(
                    {"data_object": data_object, "class_name": class_name, "vector": vector}
                )

        class FakeWeaviate:
            def batch(self, batch_size, dynamic):
                return FakeBatch()

        return FakeWeaviate()

    return factory


def test_metadata_schema_reserved_fields_refused(spark):
    with pytest.raises(ValueError, match="canonical"):
        to_vector_records(_chunks(spark), metadata={"id": "page"})


def test_configured_schema_lands_in_qdrant_payload(spark, tmp_path):
    spool = str(tmp_path)
    recs = to_vector_records(
        _chunks(spark),
        metadata={"page": "page", "lang": "lang", "upper": F.upper(F.col("lang"))},
    ).coalesce(1)
    write_qdrant(recs, "c", client_factory=make_fake_qdrant_factory(spool))
    (flush,) = _flushes(spool)
    by_id = {p["id"]: p["payload"] for p in flush["points"]}
    assert by_id["id-3"] == {
        "page": "0",  # configured values cross as strings
        "lang": "en",
        "upper": "EN",
        "source_data": "text-3",
        "source_document": "doc.txt",
    }


def test_configured_schema_cannot_shadow_canonical_payload_keys(spark, tmp_path):
    # a metadata field named like a payload core key loses the collision
    spool = str(tmp_path)
    recs = to_vector_records(
        _chunks(spark), metadata={"note": F.lit("x")}
    ).withColumn(  # simulate a hostile/legacy map carrying a core key
        "metadata", F.map_concat("metadata", F.create_map(F.lit("source_data"), F.lit("EVIL")))
    )
    write_qdrant(recs.coalesce(1), "c", client_factory=make_fake_qdrant_factory(spool))
    (flush,) = _flushes(spool)
    assert all(p["payload"]["source_data"].startswith("text-") for p in flush["points"])


def test_configured_schema_lands_in_weaviate_data_object(spark, tmp_path):
    spool = str(tmp_path)
    recs = to_vector_records(_chunks(spark), metadata={"page": "page"}).coalesce(1)
    write_weaviate(recs, "Chunk", client_factory=make_fake_weaviate_factory(spool))
    (flush,) = _flushes(spool)
    objs = {o["data_object"]["vectorflow_id"]: o["data_object"] for o in flush}
    assert objs["id-1"]["page"] == "1" and objs["id-1"]["source_data"] == "text-1"


def test_writers_without_schema_config_unchanged(spark, tmp_path):
    spool = str(tmp_path)
    recs = to_vector_records(_chunks(spark)).coalesce(1)
    assert "metadata" not in recs.columns
    write_qdrant(recs, "c", client_factory=make_fake_qdrant_factory(spool))
    (flush,) = _flushes(spool)
    assert set(flush["points"][0]["payload"]) == {"source_data", "source_document"}


def make_spooling_callback(spool: str):
    def callback(batch):
        import json as j
        import pathlib as pl
        import uuid as u

        (pl.Path(spool) / f"{u.uuid4().hex}.json").write_text(j.dumps(batch))

    return callback


def test_metadata_store_callback_batches_and_fields(spark, tmp_path):
    spool = str(tmp_path)
    recs = to_vector_records(_chunks(spark, n=300), metadata={"lang": "lang"}).coalesce(1)
    write_metadata_store(recs, make_spooling_callback(spool), batch_size=128)
    flushes = _flushes(spool)
    assert sorted(len(b) for b in flushes) == [44, 128, 128]
    rows = {m["id"]: m for b in flushes for m in b}
    m = rows["id-7"]
    assert m == {
        "lang": "en",
        "id": "id-7",
        "source_document": "doc.txt",
        "n_chars": len("text-7"),
        "dim": 2,
    }
    # never ships vectors or text bodies
    assert not any("embeddings" in m or "source_data" in m for b in flushes for m in b)


def test_metadata_store_without_stats(spark, tmp_path):
    spool = str(tmp_path)
    recs = to_vector_records(_chunks(spark, n=3)).coalesce(1)
    write_metadata_store(recs, make_spooling_callback(spool), include_stats=False)
    (flush,) = _flushes(spool)
    assert set(flush[0]) == {"id", "source_document"}


def test_smart_metadata_edges(spark):
    from vectorflow_spark.operators.textstats import smart_metadata

    rows = spark.createDataFrame(
        [
            (1, "  Title   line \nbody http://a.b x@y.io 2024-01-02 and 2025-03-04", "a.PDF"),
            (2, "\n \n", "noext"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in smart_metadata(rows, source_col="source").collect()}
    r1 = out[1]
    assert r1.title == "Title line"
    assert r1.ext == "pdf"
    assert (r1.n_urls, r1.n_emails, r1.n_dates) == (1, 1, 2)
    assert r1.first_date == "2024-01-02"
    assert r1.reading_time_s == r1.n_words * 60 // 238
    r2 = out[2]  # all-blank text: NULL title, no crash under ANSI mode
    assert r2.title is None and r2.first_date is None and r2.ext == ""


def test_smart_metadata_empty_text_has_zero_words(spark):
    from vectorflow_spark.operators.textstats import smart_metadata

    rows = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "two words")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in smart_metadata(rows).collect()}
    assert out[1].n_words == 0 and out[1].reading_time_s == 0
    assert out[2].n_words == 0
    assert out[3].n_words == 2
