"""Plain-SQL entry point: register every corpus table as a temp view so a
user can drive the whole engine with ``spark.sql`` — the same surface the
DuckDB oracles use, which is also what makes ad-hoc parity checks trivial.

Views are lazy metadata (no scan happens at registration); predicate
pushdown and column pruning behave exactly as with the DataFrame API
because a view IS its logical plan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> list[str]:
    """Create one temp view per parquet table under ``sf_dir``; returns the
    names registered. Missing files are skipped (small sf dirs may omit
    tables) so the helper works on any driver-generated scale factor."""
    registered: list[str] = []
    for name in tables:
        try:
            spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
            registered.append(name)
        except Exception:
            continue
    return registered
