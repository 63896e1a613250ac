"""JSONL corpus ingest + plain-SQL entry point tests."""

import json

from vectorflow_spark.sources.readers import read_jsonl_documents
from vectorflow_spark.sql import register_tables


class TestJsonlSource:
    def test_normalizes_to_documents_shape(self, spark, tmp_path):
        p = tmp_path / "corpus"
        p.mkdir()
        with open(p / "shard-000.jsonl", "w") as f:
            for i in range(4):
                f.write(json.dumps({"text": f"doc number {i}", "meta": {"k": i}}) + "\n")
        docs = read_jsonl_documents(spark, str(p), schema="text string, meta struct<k:long>")
        rows = docs.collect()
        assert set(docs.columns) == {"doc_id", "text", "source"}
        assert len(rows) == 4
        assert all(r.source == "shard-000.jsonl" for r in rows)
        # synthesized ids are deterministic across re-reads and positive
        again = {r.text: r.doc_id for r in read_jsonl_documents(
            spark, str(p), schema="text string, meta struct<k:long>").collect()}
        assert all(again[r.text] == r.doc_id and r.doc_id >= 0 for r in rows)

    def test_explicit_id_field(self, spark, tmp_path):
        p = tmp_path / "c2"
        p.mkdir()
        with open(p / "a.jsonl", "w") as f:
            f.write(json.dumps({"id": 7, "text": "x"}) + "\n")
        r = read_jsonl_documents(
            spark, str(p), id_field="id", schema="id long, text string"
        ).first()
        assert r.doc_id == 7


class TestSqlEntryPoint:
    def test_register_and_query(self, spark, sf_dir):
        names = register_tables(spark, sf_dir)
        assert "documents" in names and "lineitem" in names
        n = spark.sql("SELECT count(*) AS n FROM documents WHERE length(text) > 0").first().n
        assert n > 0
        joined = spark.sql(
            """
            SELECT d.lang, count(*) AS n
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
            GROUP BY d.lang ORDER BY n DESC
            """
        ).collect()
        assert len(joined) >= 1

    def test_views_prune_and_push(self, spark, sf_dir):
        register_tables(spark, sf_dir)
        plan = (
            spark.sql("SELECT doc_id FROM documents WHERE doc_id = 5")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [" in plan and "EqualTo(doc_id,5)" in plan
        assert "text" not in plan.split("ReadSchema:")[-1]
