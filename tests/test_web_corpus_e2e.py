"""The full web-corpus story, end to end, on real container bytes:

    .warc.gz segments -> read_warc -> HTML strip -> documents
    -> URL-canonical dedup -> quality/language curation
    -> exact content dedup -> chunk -> embed -> sink records

Every stage is a production operator (no test doubles); the point of
this test is that the stages COMPOSE — schemas line up, dedup keys carry
through, and the final sink records have deterministic uuid5 ids, so
re-running the whole pipeline is upsert-idempotent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.sources.warcmini import build_warc, read_warc


PAGES = [
    # (url, html body) — includes a url-variant duplicate (tracking param)
    # and a content duplicate under a different url
    ("https://www.site.example/article", "<p>the quick brown fox jumps over the lazy dog and runs away</p>"),
    ("https://site.example/article?utm_source=tw", "<p>the quick brown fox jumps over the lazy dog and runs away</p>"),
    ("https://site.example/copy", "<p>the quick brown fox jumps over the lazy dog and runs away</p>"),
    ("https://other.example/unique", "<p>a completely different page about the spark engine and its shuffle behavior</p>"),
    ("https://other.example/noise", "<p>111 222 333 !!! ??? ### 999 $$$ 888 %% 00 ++ 44 ^^</p>"),
]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("webcorpus")
    recs = [(u, body.encode(), "text/html") for u, body in PAGES]
    (d / "crawl-00000.warc.gz").write_bytes(build_warc(recs[:3]))
    (d / "crawl-00001.warc.gz").write_bytes(build_warc(recs[3:]))
    return str(d)


def test_packaged_warc_pipeline_entry(spark, warc_dir):
    """run_pipeline_from_warc: the one-call crawl-to-vectors path must
    reproduce the composed steps — url-deduped docs in, sink records out
    with the canonical schema and idempotent ids."""
    from vectorflow_spark.config import PipelineConfig
    from vectorflow_spark.pipeline import run_pipeline_from_warc

    cfg = PipelineConfig(embeddings_type="deterministic", embedding_dim=8, chunk_size=64, chunk_overlap=0)
    out = run_pipeline_from_warc(spark, warc_dir, cfg)
    rows = out.collect()
    assert set(out.columns) == {"id", "source_data", "source_document", "embeddings"}
    assert len(rows) > 0
    assert all(len(r.embeddings) == 8 for r in rows)
    # url-dedup: the www/tracking variant must not contribute records
    assert len({r.source_document for r in rows}) == 4
    # deterministic ids: re-running yields the identical id set
    again = {r.id for r in run_pipeline_from_warc(spark, warc_dir, cfg).collect()}
    assert again == {r.id for r in rows}


def test_warc_to_sink_records(spark, warc_dir):
    from vectorflow_spark.config import ChunkStrategy, PipelineConfig
    from vectorflow_spark.operators.dedup import drop_exact_duplicates
    from vectorflow_spark.operators.textstats import quality_score
    from vectorflow_spark.operators.urls import canonical_url_expr
    from vectorflow_spark.pipeline import run_pipeline
    from vectorflow_spark.sources.readers import strip_html_expr

    # 1. WARC -> text documents
    rows = read_warc(spark, warc_dir).filter(F.col("warc_type") == "response")
    docs = rows.select(
        F.col("url"),
        canonical_url_expr(F.col("url")).alias("canonical_url"),
        strip_html_expr(
            F.expr("CASE WHEN is_valid_utf8(body) THEN decode(body, 'UTF-8') END")
        ).alias("text"),
    )
    assert docs.count() == 5

    # 2. URL-canonical dedup: the www/tracking variant collapses (keep min url)
    url_deduped = (
        docs.withColumn("_rn", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("canonical_url").orderBy("url")))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    assert url_deduped.count() == 4  # article + copy + unique + noise

    # 3. quality curation drops the symbol-noise page
    curated = quality_score(url_deduped).filter(F.col("quality_score") > 0.2)
    kept_urls = {r.canonical_url for r in curated.select("canonical_url").collect()}
    assert "https://other.example/noise" not in kept_urls
    assert len(kept_urls) == 3

    # 4. exact content dedup: /copy has identical text to /article
    unique_docs = drop_exact_duplicates(curated.select("canonical_url", "text"))
    assert unique_docs.count() == 2

    # 5. chunk -> embed -> sink records through the flagship pipeline
    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.EXACT_BY_CHARACTERS,
        chunk_size=32,
        chunk_overlap=8,
        embeddings_type="deterministic",
        embedding_dim=16,
    )
    pipeline_in = unique_docs.select(
        F.col("canonical_url").alias("source"), F.col("text")
    )
    records = run_pipeline(pipeline_in, cfg)
    got = records.collect()
    assert len(got) > 0
    assert set(records.columns) == {"id", "source_data", "source_document", "embeddings"}
    assert all(len(r.embeddings) == 16 for r in got)

    # 6. idempotency: the whole pipeline re-run yields the SAME ids
    again = {r.id for r in run_pipeline(pipeline_in, cfg).collect()}
    assert again == {r.id for r in got}
