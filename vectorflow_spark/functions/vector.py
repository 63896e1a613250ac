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
