"""KMV distinct/intersection sketch: estimator accuracy, exact small-group
fallback, and partitioning invariance of the two-level bottom-k build."""

import pyspark.sql.functions as F
import pytest

from vectorflow_spark.operators.sketches import (
    KMV_K,
    kmv_distinct_estimate,
    kmv_intersection_estimate,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # group A: keys 0..4999; group B: keys 3000..9999 -> |A∩B| = 2000,
    # |A|=5000, |B|=7000, |A∪B|=10000
    a = spark.range(0, 5000).select(F.lit("A").alias("g"), F.col("id").alias("k"))
    b = spark.range(3000, 10000).select(F.lit("B").alias("g"), F.col("id").alias("k"))
    return a.union(b)


def test_kmv_distinct_accuracy(spark, keyed):
    est = {r.g: r.est_distinct for r in kmv_distinct_estimate(keyed, "g", "k").collect()}
    # ~1/sqrt(128) ≈ 8.8% std error; allow 4 sigma
    assert abs(est["A"] - 5000) / 5000 < 0.36
    assert abs(est["B"] - 7000) / 7000 < 0.36


def test_kmv_small_group_is_exact(spark):
    df = spark.range(0, 60).select(F.lit("S").alias("g"), F.col("id").alias("k"))
    [row] = kmv_distinct_estimate(df, "g", "k").collect()
    assert row.est_distinct == 60.0  # sketch never filled -> exact count


def test_kmv_intersection_accuracy(spark, keyed):
    [row] = kmv_intersection_estimate(keyed, "g", "k").collect()
    assert (row.grp_a, row.grp_b) == ("A", "B")
    # intersection estimate compounds union + ratio error; allow wide band
    assert 500 < row.est_common < 4000


def test_kmv_disjoint_groups(spark):
    a = spark.range(0, 3000).select(F.lit("A").alias("g"), F.col("id").alias("k"))
    b = spark.range(100000, 103000).select(F.lit("B").alias("g"), F.col("id").alias("k"))
    [row] = kmv_intersection_estimate(a.union(b), "g", "k").collect()
    assert row.est_common == 0.0


def test_kmv_sketch_partitioning_invariant(spark, keyed):
    """Bottom-k of per-partition bottom-ks == global bottom-k: the sketch
    must not depend on how the input is partitioned."""
    one = {r.grp: r.hs for r in kmv_sketch(keyed.coalesce(1), "g", "k").collect()}
    many = {r.grp: r.hs for r in kmv_sketch(keyed.repartition(17), "g", "k").collect()}
    assert one == many
    assert all(len(v) == KMV_K and v == sorted(v) for v in one.values())


def test_bigram_perplexity_ranks_repetition_low(spark):
    from vectorflow_spark.operators.textstats import bigram_perplexity

    # disjoint vocabularies so the corpus-fit model doesn't couple the docs:
    # doc 1 cycles deterministically (every history has ONE successor);
    # doc 2 branches (history 'a' has 8 equally likely successors)
    branching = (" ".join(f"a s{i}" for i in range(8)) + " ") * 4
    docs = spark.createDataFrame(
        [
            (1, "p q r " * 20),
            (2, branching),
            (3, "x"),  # single token -> excluded (no bigrams)
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in bigram_perplexity(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].ppl < rows[2].ppl
    assert rows[1].n_bigrams == 59 and rows[2].n_bigrams == 63
    assert rows[1].ppl >= 1.0  # perplexity is bounded below by 1


def test_kmv_sketch_length_is_min_k_distinct(spark):
    from vectorflow_spark.operators.sketches import kmv_sketch

    df = (
        spark.range(0, 127).select(F.lit("under").alias("g"), F.col("id").alias("k"))
        .union(spark.range(0, 128).select(F.lit("exact").alias("g"), F.col("id").alias("k")))
        .union(spark.range(0, 129).select(F.lit("over").alias("g"), F.col("id").alias("k")))
    )
    sizes = {r.grp: len(r.hs) for r in kmv_sketch(df, "g", "k").collect()}
    assert sizes == {"under": 127, "exact": 128, "over": 128}
