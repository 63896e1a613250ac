"""Loaders for the driver's synthetic tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, name: str, base: str | None = None) -> DataFrame:
    return spark.read.parquet(f"{base or sf_dir()}/{name}.parquet")


def register_views(spark: SparkSession, base: str | None = None) -> None:
    for t in TABLES:
        load_table(spark, t, base).createOrReplaceTempView(t)
