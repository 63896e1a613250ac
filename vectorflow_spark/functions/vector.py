"""Vector math over ``array<float>`` columns as built-in SQL expressions.

The reference provisions vector similarity only as a documented endpoint
(``/images/search`` top-K, reference README.md:319-345 — SURVEY.md §2.11 X2);
here it is a first-class expression library. Everything below compiles to
Catalyst ``aggregate``/``zip_with`` higher-order functions: JVM-side, no
Python round-trip, usable inside whole-stage codegen and streaming.

Determinism note: accumulation is sequential left-to-right in DOUBLE, so the
result is bit-stable for a given array (unlike a shuffled SUM over rows) —
this is what lets the DuckDB oracle match cosine scores exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _ident(name: str) -> str:
    """Backtick-quote a column name for SQL text."""
    return "`" + name.replace("`", "``") + "`"


# SQL-text twins of the fold builders below. Building a higher-order
# function through the Python DSL costs ~15-20 ms of py4j round-trips
# per lambda (UnresolvedNamedLambdaVariable plumbing); parsing the whole
# fold as ONE expression is a single round-trip (~0.5 ms) — the same
# economics as similarity._const_vec (r11). The parsed tree is the same
# ArrayAggregate/ZipWith with the same double casts and fold order, so
# results are bit-identical; only the lambda variable NAMES in the plan
# string differ (x vs x_0), which refreezes plan fingerprints but not
# results.
def dot_sql(a_sql: str, b_sql: str) -> str:
    """SQL text of ``dot`` over two array-typed SQL expressions."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def l2_norm_sql(a_sql: str) -> str:
    """SQL text of ``l2_norm`` over an array-typed SQL expression."""
    return (
        f"sqrt(aggregate({a_sql}, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(dot_sql(_ident(a), _ident(b)))
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(l2_norm_sql(_ident(a)))
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    denom = na * nb
    return F.when(denom != 0.0, d / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def int8_scale(a: Column | str) -> Column:
    """Per-vector symmetric int8 quantization scale: max|x| / 127. Zero
    for the all-zero vector (quantize_int8 maps it to zeros)."""
    return (
        F.array_max(F.transform(_c(a), lambda x: F.abs(x.cast("double")))) / F.lit(127.0)
    )


def quantize_int8(a: Column | str, scale: Column) -> Column:
    """Symmetric scalar quantization to int8 range: q = floor(x/scale + .5)
    (explicit half-up — engine round() tie rules differ, floor does not),
    clamped by construction to [-127, 127]. 4x smaller vectors for ANN
    shortlists; pair with the float rerank for the final order."""
    return F.transform(
        _c(a),
        lambda x: F.when(scale != 0.0, F.floor(x.cast("double") / scale + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("int"),
    )


def dequantize_max_err(a: Column | str, q: Column, scale: Column) -> Column:
    """Max absolute reconstruction error of the quantized vector — the
    audit metric for choosing int8 vs float at the shortlist stage."""
    return F.array_max(
        F.zip_with(q, _c(a), lambda qi, x: F.abs(qi.cast("double") * scale - x.cast("double")))
    )


# ---------------------------------------------------------------------------
# A note on "unrolling" these folds (measured, Spark 4.1, round 2):
#
# It is tempting to replace aggregate/zip_with with chained per-element
# arithmetic (element_at(a, i) * lit(c_i) + ...) so the math sits inside
# WholeStageCodegen. Every variant of that LOSES on this engine:
#
#   * narrow literal-operand unrolls (one 64-dim dot + norm per row) ran
#     ~3x SLOWER than the HOF fold (0.3s -> 1.0s on brute-force top-k at
#     sf0.1): each element_at pays bounds/null checks and the generated
#     term chain beats the HOF's tight primitive-array loop nowhere;
#   * column-column unrolls (join-side pair scoring) were 2-3x slower for
#     the same reason, doubled;
#   * wide constructs (16 centroids x 64 dims, PQ codebooks) overflow
#     janino's 64 KB method limit — WSCG cannot split a single output
#     expression — and the ENTIRE stage falls back to interpreted
#     execution, 3-6x slower (q_pq_encode: 5s -> 28s);
#   * fusing zip_with+aggregate into one aggregate-over-index-sequence
#     halves lambda invocations but element_at per access cancels it.
#
# Conclusion: the sequential HOF fold IS the fast JVM form for
# array<float> math here. Keep it, and keep constant operands as literal
# arrays (driver-side norms folded to literals stay worthwhile).
# ---------------------------------------------------------------------------
