"""HyperLogLog and log2-histogram quantile sketches (estimator accuracy,
merge algebra, branch selection, partitioning invariance) plus the
TF-IDF cosine pair operator's exactness contracts."""

import math

import pyspark.sql.functions as F
import pytest

from vectorflow_spark.operators.sketches import (
    HLL_M,
    hll_distinct_estimate,
    hll_registers,
    histogram_quantiles,
    log2_histogram,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # group A: 5000 distinct, group B: 900 distinct — both above the
    # 2.5m = 160 linear-counting cutoff, so the raw branch is exercised
    a = spark.range(0, 5000).select(F.lit("A").alias("g"), F.col("id").alias("k"))
    b = spark.range(0, 900).select(F.lit("B").alias("g"), F.col("id").alias("k"))
    return a.union(b)


def test_hll_accuracy(spark, keyed):
    est = {r.g: r.est_distinct for r in hll_distinct_estimate(keyed, "g", "k").collect()}
    # std error 1.04/sqrt(64) ≈ 13%; allow 3 sigma
    assert abs(est["A"] - 5000) / 5000 < 0.39
    assert abs(est["B"] - 900) / 900 < 0.39


def test_hll_duplicates_do_not_move_registers(spark, keyed):
    # 10x-duplicated input hashes to the same (j, rho) pairs -> identical sketch
    dup = keyed.withColumn("_r", F.explode(F.array(*[F.lit(i) for i in range(10)]))).drop("_r")
    base = sorted(map(tuple, hll_distinct_estimate(keyed, "g", "k").collect()))
    dup_e = sorted(map(tuple, hll_distinct_estimate(dup, "g", "k").collect()))
    assert base == dup_e


def test_hll_register_merge_is_max(spark):
    # sketch(A ∪ B) == max-merge(sketch(A), sketch(B)) register-for-register
    a = spark.range(0, 3000).select(F.lit("G").alias("g"), F.col("id").alias("k"))
    b = spark.range(2000, 6000).select(F.lit("G").alias("g"), F.col("id").alias("k"))
    whole = {(r.j): r.m_j for r in hll_registers(a.union(b), "g", "k").collect()}
    ra = {(r.j): r.m_j for r in hll_registers(a, "g", "k").collect()}
    rb = {(r.j): r.m_j for r in hll_registers(b, "g", "k").collect()}
    merged = {j: max(ra.get(j, 0), rb.get(j, 0)) for j in set(ra) | set(rb)}
    assert whole == merged


def test_hll_linear_counting_branch(spark):
    # 20 distinct keys: raw estimate <= 160 with empty registers -> the
    # m*ln(m/V) branch; tolerance check (the oracle gates never take it)
    df = spark.range(0, 20).select(F.lit("S").alias("g"), F.col("id").alias("k"))
    [row] = hll_distinct_estimate(df, "g", "k").collect()
    assert abs(row.est_distinct - 20) < 8


def test_hll_partitioning_invariance(spark, keyed):
    one = sorted(map(tuple, hll_distinct_estimate(keyed.coalesce(1), "g", "k").collect()))
    many = sorted(map(tuple, hll_distinct_estimate(keyed.repartition(13), "g", "k").collect()))
    assert one == many


def test_hll_gate_stays_in_raw_branch(spark, sf_dir):
    # the oracle gate's groups must sit above the 2.5m cutoff at the
    # driver sfs so the cross-engine ln() never has to be bit-matched
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    true = {
        r.l_returnflag: r.d
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("d"))
        .collect()
    }
    assert min(true.values()) > 2.5 * HLL_M


def test_log2_histogram_buckets(spark):
    df = spark.createDataFrame(
        [("g", 0.25), ("g", 0.0), ("g", 1.0), ("g", 1.99), ("g", 2.0), ("g", 7.5), ("g", 1024.0)],
        "g string, v double",
    )
    got = {(r.b): r.cnt for r in log2_histogram(df, "g", "v").collect()}
    # [0,1): 0.25, 0.0 | [1,2): 1.0, 1.99 | [2,4): 2.0 | [4,8): 7.5 | [1024,2048): 1024
    assert got == {0: 2, 1: 2, 2: 1, 3: 1, 11: 1}


def test_hist_quantiles_bracket_truth(spark):
    import random

    rnd = random.Random(7)
    vals = [("g", rnd.uniform(1.0, 100000.0)) for _ in range(4000)]
    df = spark.createDataFrame(vals, "g string, v double")
    got = {r.q: r.est for r in histogram_quantiles(df, "g", "v").collect()}
    xs = sorted(v for _, v in vals)
    for q in (50, 90, 99):
        true = xs[math.ceil(q / 100 * len(xs)) - 1]
        # estimate must land in the true quantile's own log2 bucket
        lo = 2 ** math.floor(math.log2(true))
        assert lo <= got[q] <= 2 * lo
    assert got[50] <= got[90] <= got[99]


def test_hist_quantiles_partitioning_invariance(spark):
    df = spark.range(1, 3001).select(
        F.lit("g").alias("g"), (F.col("id") * 7 % 997 + 1).cast("double").alias("v")
    )
    one = sorted(map(tuple, histogram_quantiles(df.coalesce(1), "g", "v").collect()))
    many = sorted(map(tuple, histogram_quantiles(df.repartition(11), "g", "v").collect()))
    assert one == many


# --- tfidf_cosine_pairs (operators/textstats.py) ---


def test_tfidf_cosine_exact_fractional(spark):
    """Hand corpus with partial overlap: verify the cosine against an
    independent float computation of the same df-capped vector space."""
    import math

    from vectorflow_spark.operators.textstats import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta delta"),
            (3, "epsilon zeta eta"),
        ],
        "doc_id long, text string",
    )
    got = {(r.a, r.b): r.cos_sim for r in tfidf_cosine_pairs(docs, 0.0, 100).collect()}
    n = 3
    def idf(dfc):
        return math.log((1 + n) / (1.0 + dfc)) + 1
    # doc1/doc2 share alpha+beta (df=2); each also holds one df=1 term
    w2 = round(1 * idf(2), 9)
    w1 = round(1 * idf(1), 9)
    dot = w2 * w2 + w2 * w2
    norm = math.sqrt(w2 * w2 + w2 * w2 + w1 * w1)
    assert got.keys() == {(1, 2)}  # doc3 shares no term
    assert abs(got[(1, 2)] - dot / (norm * norm)) < 1e-8
    assert 0.0 < got[(1, 2)] < 1.0


def test_tfidf_cosine_identical_docs_score_one(spark):
    from vectorflow_spark.operators.textstats import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "foo bar foo baz"), (2, "foo bar foo baz"), (3, "unrelated words here")],
        "doc_id long, text string",
    )
    got = {(r.a, r.b): r.cos_sim for r in tfidf_cosine_pairs(docs, 0.9, 100).collect()}
    assert got == {(1, 2): 1.0}


def test_tfidf_cosine_df_cap_drops_common_terms(spark):
    from vectorflow_spark.operators.textstats import tfidf_cosine_pairs

    # 'the' appears in all 4 docs; cap=3 removes it, leaving no shared terms
    docs = spark.createDataFrame(
        [(i, f"the unique{i} token{i}") for i in range(4)],
        "doc_id long, text string",
    )
    assert tfidf_cosine_pairs(docs, 0.0, 3).count() == 0
    # cap high enough to keep 'the': every pair appears
    assert tfidf_cosine_pairs(docs, 0.0, 100).count() == 6


def test_tfidf_cosine_partitioning_invariance(spark):
    from vectorflow_spark.operators.textstats import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(i, f"shared words plus unique{i % 3} extra{i % 5}") for i in range(30)],
        "doc_id long, text string",
    )
    one = sorted(map(tuple, tfidf_cosine_pairs(docs.coalesce(1), 0.0, 100).collect()))
    many = sorted(map(tuple, tfidf_cosine_pairs(docs.repartition(7), 0.0, 100).collect()))
    assert one == many and len(one) > 0
