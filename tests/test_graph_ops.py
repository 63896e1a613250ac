"""pagerank_quantized (operators/graph.py) invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorflow_spark.operators.graph import pagerank_quantized

M = 10**12


def _edges(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, ["src", "dst"])


def test_ring_is_uniform(spark):
    # undirected 5-ring: perfect symmetry -> identical rank, exactly
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)])
    r = pagerank_quantized(e, iterations=3).collect()
    vals = {row.r for row in r}
    assert len(r) == 5 and len(vals) == 1


def test_star_center_dominates(spark):
    e = _edges(spark, [(0, i) for i in range(1, 9)])
    r = {row.v: row.r for row in pagerank_quantized(e, iterations=3).collect()}
    assert r[0] > max(r[i] for i in range(1, 9)) * 3
    leaf_vals = {r[i] for i in range(1, 9)}
    assert len(leaf_vals) == 1  # leaves are symmetric


def test_mass_bounded_and_deterministic(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)])
    r1 = sorted(pagerank_quantized(e, iterations=3).collect())
    r2 = sorted(pagerank_quantized(e, iterations=3).collect())
    assert r1 == r2
    total = sum(row.r for row in r1)
    # integral DIV only truncates: mass never exceeds M, leaks a little
    assert total <= M
    assert total > M * 0.9
