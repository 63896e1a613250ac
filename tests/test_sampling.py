"""weighted_sample_per_stratum (operators/sampling.py): weighting bias,
exact-k, determinism, and zero-weight exclusion."""

import pyspark.sql.functions as F

from vectorflow_spark.operators.sampling import weighted_sample_per_stratum


def _corpus(spark, n_strata=40, per_class=50):
    # each stratum: per_class heavy rows (w=10) + per_class light rows (w=1)
    rows = spark.range(0, n_strata * per_class * 2)
    return rows.select(
        (F.col("id") % n_strata).cast("string").alias("s"),
        F.col("id").alias("rid"),
        F.when((F.col("id") / n_strata).cast("long") % 2 == 0, 10).otherwise(1).alias("w"),
    )


def test_weighted_bias_toward_heavy_rows(spark):
    df = _corpus(spark)
    out = weighted_sample_per_stratum(df, "s", "rid", "w", k=20, w_scale=1.0)
    n = out.count()
    heavy = out.filter(F.col("weight") == 10).count()
    assert n == 40 * 20
    # E-S with 10:1 weights on a 50/50 pool: heavy share far above 0.5
    assert heavy / n > 0.7


def test_exact_k_and_rank_contract(spark):
    df = _corpus(spark, n_strata=5)
    out = weighted_sample_per_stratum(df, "s", "rid", "w", k=7, w_scale=1.0)
    per = {r.stratum: r.c for r in out.groupBy("stratum").agg(F.count("*").alias("c")).collect()}
    assert per == {str(i): 7 for i in range(5)}
    assert out.agg(F.max("rn")).collect()[0][0] == 7


def test_small_stratum_returns_all_rows(spark):
    df = spark.createDataFrame([("a", 1, 5), ("a", 2, 5)], "s string, rid long, w long")
    assert weighted_sample_per_stratum(df, "s", "rid", "w", k=10, w_scale=1.0).count() == 2


def test_zero_weight_rows_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 0), ("a", 3, -1)], "s string, rid long, w long"
    )
    got = [r.id for r in weighted_sample_per_stratum(df, "s", "rid", "w", k=10, w_scale=1.0).collect()]
    assert got == [1]


def test_partitioning_and_run_invariance(spark):
    df = _corpus(spark, n_strata=8)
    one = sorted(map(tuple, weighted_sample_per_stratum(df.coalesce(1), "s", "rid", "w", 9, 1.0).collect()))
    many = sorted(map(tuple, weighted_sample_per_stratum(df.repartition(13), "s", "rid", "w", 9, 1.0).collect()))
    again = sorted(map(tuple, weighted_sample_per_stratum(df.repartition(13), "s", "rid", "w", 9, 1.0).collect()))
    assert one == many == again
