"""The Python DataSource WRITER surface for the tar/warc sinks
(Spark 4 writer API): job-level commit/abort semantics the hand-rolled
per-task rename in the convenience sinks cannot give — nothing is
visible before the driver commit, and failed jobs leave no orphan temp
files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _tar_rows(spark, n=40, n_shards=4):
    return spark.range(0, n).select(
        F.concat(
            F.lit("shard-"), F.lpad((F.col("id") % n_shards).cast("string"), 5, "0"), F.lit(".tar")
        ).alias("shard"),
        F.concat(F.lpad(F.col("id").cast("string"), 6, "0"), F.lit(".txt")).alias("member"),
        F.encode(F.concat(F.lit("payload "), F.col("id")), "utf-8").alias("data"),
        F.lpad(F.col("id").cast("string"), 6, "0").alias("seq"),
    )


class TestTarWriter:
    def test_roundtrip_and_index(self, spark, tmp_path):
        from vectorflow_spark.sources import tarsource
        from vectorflow_spark.sources.wds import read_tar

        tarsource.register(spark)
        d = str(tmp_path)
        _tar_rows(spark).repartition(4, "shard").write.format("vf_tar").option(
            "index", "true"
        ).mode("append").save(d)
        names = sorted(os.listdir(d))
        assert [n for n in names if n.endswith(".tar")] == [
            f"shard-{i:05d}.tar" for i in range(4)
        ]
        assert len([n for n in names if n.endswith(".idx.json")]) == 4
        assert not [n for n in names if n.startswith(".uncommitted")]
        back = read_tar(spark, d)
        assert back.count() == 40
        assert back.rdd.getNumPartitions() == 4  # index splits per shard

    def test_byte_deterministic(self, spark, tmp_path):
        from vectorflow_spark.sources import tarsource

        tarsource.register(spark)
        a, b = tmp_path / "a", tmp_path / "b"
        for d in (a, b):
            _tar_rows(spark).repartition(4, "shard").write.format("vf_tar").mode(
                "append"
            ).save(str(d))
        for i in range(4):
            name = f"shard-{i:05d}.tar"
            assert (a / name).read_bytes() == (b / name).read_bytes()

    def test_abort_leaves_nothing(self, spark, tmp_path):
        """A failing task aborts the job: no shard published, no
        .uncommitted temp orphaned — the semantics the writer API adds
        over per-task renames."""
        from pyspark.sql.types import BinaryType
        from vectorflow_spark.sources import tarsource

        tarsource.register(spark)
        d = str(tmp_path / "out")

        @F.udf(BinaryType())
        def boom(i):
            if i % 40 == 39:
                raise RuntimeError("injected failure")
            return b"x"

        rows = _tar_rows(spark).withColumn("data", boom(F.col("seq").cast("bigint")))
        with pytest.raises(Exception, match="injected failure"):
            rows.repartition(4, "shard").write.format("vf_tar").mode("append").save(d)
        leftover = os.listdir(d) if os.path.isdir(d) else []
        assert leftover == []

    def test_same_shard_from_two_tasks_refused(self, spark, tmp_path):
        from vectorflow_spark.sources import tarsource

        tarsource.register(spark)
        d = str(tmp_path / "dup")
        # round-robin repartition scatters one shard across tasks
        with pytest.raises(Exception, match="repartition"):
            _tar_rows(spark).repartition(8).write.format("vf_tar").mode("append").save(d)
        assert [n for n in os.listdir(d) if not n.startswith(".")] == []


class TestWarcWriter:
    def test_roundtrip_cdx_and_lookup(self, spark, tmp_path):
        from vectorflow_spark.sources import warcsource
        from vectorflow_spark.sources.warcmini import read_warc

        warcsource.register(spark)
        d = str(tmp_path)
        rows = spark.range(0, 60).select(
            F.concat(
                F.lit("segment-"), F.lpad((F.col("id") % 3).cast("string"), 5, "0"), F.lit(".warc.gz")
            ).alias("segment"),
            F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
            F.encode(F.concat(F.lit("body "), F.col("id")), "utf-8").alias("body"),
        )
        rows.repartition(3, "segment").write.format("vf_warc").option("index", "true").mode(
            "append"
        ).save(d)
        back = read_warc(spark, d)
        assert back.filter(F.col("warc_type") == "response").count() == 60
        hit = back.filter(F.col("url") == "http://h/17").collect()
        assert [bytes(r.body) for r in hit] == [b"body 17"]

    def test_abort_leaves_nothing(self, spark, tmp_path):
        from pyspark.sql.types import BinaryType
        from vectorflow_spark.sources import warcsource

        warcsource.register(spark)
        d = str(tmp_path / "out")

        @F.udf(BinaryType())
        def boom(u):
            if u.endswith("/59"):
                raise RuntimeError("injected failure")
            return b"x"

        rows = spark.range(0, 60).select(
            F.lit("segment-00000.warc.gz").alias("segment"),
            F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
            F.col("id").cast("string").alias("_u"),
        ).select("segment", "url", boom(F.col("url")).alias("body"))
        with pytest.raises(Exception, match="injected failure"):
            rows.repartition(1, "segment").write.format("vf_warc").mode("append").save(d)
        assert (os.listdir(d) if os.path.isdir(d) else []) == []
