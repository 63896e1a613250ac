"""L1-L6 chunk-enhancement stage (operators/enhancer.py)."""

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.operators.enhancer import (
    deterministic_completion,
    document_context,
    enhance_chunks,
    fit_to_token_budget,
    generate_questions,
    summarize_documents,
)


def test_fit_to_token_budget_char_heuristic():
    text = "x" * 1000
    assert fit_to_token_budget(text, 100) == "x" * 300  # 1:3 token:char
    assert fit_to_token_budget("short", 100) == "short"


def test_deterministic_completion_is_stable_and_extractive():
    prompt = "alpha alpha alpha bravo bravo charlie delta echo foxtrot"
    a, b = deterministic_completion(prompt), deterministic_completion(prompt)
    assert a == b
    assert a.split(", ")[0] == "alpha"  # most frequent term first
    assert len(a.split(", ")) <= 5


def test_generate_questions_shape():
    qs = generate_questions("search legal contracts for indemnity clauses")
    assert 0 < len(qs) <= 3
    assert all(q.endswith("?") for q in qs)


@pytest.fixture(scope="module")
def chunks(spark):
    rows = [
        (1, "machine learning models learn patterns patterns patterns"),
        (1, "training data quality matters matters"),
        (2, "cooking pasta requires boiling water water water water"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_document_context_adds_array_column(spark, chunks):
    out = document_context(chunks)
    assert dict(out.dtypes)["context"] == "array<string>"
    rows = out.collect()
    assert all(len(r["context"]) >= 1 for r in rows)


def test_summaries_per_document(spark, chunks):
    docs = chunks.groupBy("doc_id").agg(F.concat_ws("\n", F.collect_list("text")).alias("text"))
    out = {r["doc_id"]: r["summary"] for r in summarize_documents(docs).collect()}
    assert set(out) == {1, 2}
    assert "pattern" in out[1] or "patterns" in out[1]
    assert "water" in out[2]


def test_enhance_chunks_concat_and_summary_rows(spark, chunks):
    out = enhance_chunks(chunks).collect()
    originals = [r for r in out if r["chunk_tag"] is None]
    summaries = [r for r in out if r["chunk_tag"] == "summary"]
    # every input chunk survives, plus one summary row per document
    assert len(originals) == 3
    assert len(summaries) == 2
    # L4's literal concat: enhanced = text + ", " + items
    for r in originals:
        assert r["enhanced_text"].startswith(r["text"])
        assert ", " in r["enhanced_text"]
    # doc-level context reached chunks of the same document
    doc1 = [r for r in originals if r["doc_id"] == 1]
    assert any("pattern" in r["enhanced_text"] for r in doc1)


def test_enhance_broadcasts_context_dimension(spark, chunks):
    plan = enhance_chunks(chunks)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
