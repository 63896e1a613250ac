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


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
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
# Unrolled (codegen'd) variants for literal operands.
#
# Catalyst evaluates higher-order functions (aggregate/zip_with/transform)
# by interpreting the lambda per element — they sit OUTSIDE whole-stage
# codegen. For the ANN hot paths (PQ encode: m*ksub distances/row, IVF
# assign: C cosines/row) that interpretation dominates the stage. When one
# operand is a driver-side literal (codebooks, centroids, hyperplanes, the
# query vector) the fold can be unrolled into plain chained arithmetic over
# element_at calls: identical left-to-right IEEE-double accumulation order
# (acc starts at 0.0, exactly like the fold), so results are BIT-IDENTICAL
# to the aggregate() form and to the DuckDB list_sum oracle — but the whole
# expression now lives inside WholeStageCodegen.
#
# SIZE BUDGET (measured, Spark 4.1): whole-stage codegen CANNOT split one
# output expression across methods (its inputs are local variables, not the
# input row), so a stage whose unrolled expressions exceed ~500 arithmetic
# terms overflows janino's 64 KB method limit and the ENTIRE stage falls
# back to interpreted execution — 3-6x SLOWER than the HOF form it replaced
# (q_pq_encode went 5 s -> 28 s that way). Use these helpers only where the
# per-stage total stays small: one dot/norm per row or per join pair
# (~64-200 terms). Multi-codeword constructs (PQ codebooks, IVF centroid
# arrays, LSH plane banks, projection matrices) must keep the aggregate()
# fold form.
# ---------------------------------------------------------------------------


def dot_const(a: Column | str, vals: list[float], offset: int = 0) -> Column:
    """``sum_i a[offset+i] * vals[i]`` with left-to-right double
    accumulation — unrolled twin of ``dot(a, array(vals))``."""
    av = _c(a)
    acc: Column = F.lit(0.0)
    for i, v in enumerate(vals):
        acc = acc + F.element_at(av, offset + i + 1).cast("double") * F.lit(float(v))
    return acc


def sqdist_const(a: Column | str, vals: list[float], offset: int = 0) -> Column:
    """Squared L2 between ``a[offset:offset+len(vals)]`` and a literal
    vector — unrolled twin of the zip_with+aggregate form used by PQ."""
    av = _c(a)
    acc: Column = F.lit(0.0)
    for i, v in enumerate(vals):
        d = F.element_at(av, offset + i + 1).cast("double") - F.lit(float(v))
        acc = acc + d * d
    return acc


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Column-column dot with the element loop unrolled for a known
    dimension — same left-to-right double accumulation as ``dot``.

    MEASURED CAVEAT: unlike the literal-operand unrolls (whose constants
    inline into the generated code), BOTH sides here pay an element_at
    bounds/null check per term, and at dim 64 that loses to the HOF
    iterator (~2-3x slower on the kNN/near-dup pair stages). Kept for
    callers with small dims or pre-validated non-null fixed-width arrays;
    the default call sites use the HOF ``dot``."""
    av, bv = _c(a), _c(b)
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.element_at(av, i + 1).cast("double") * F.element_at(bv, i + 1).cast(
            "double"
        )
    return acc


def l2_norm_unrolled(a: Column | str, dim: int) -> Column:
    """``l2_norm`` with the element loop unrolled for a known dimension —
    same accumulation order, codegen'd. Falls back to the HOF form only
    when the width is genuinely dynamic (callers pass the known dim)."""
    av = _c(a)
    acc: Column = F.lit(0.0)
    for i in range(dim):
        x = F.element_at(av, i + 1).cast("double")
        acc = acc + x * x
    return F.sqrt(acc)
