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


class TestStreamWriters:
    def test_tar_stream_batches_and_replay_idempotency(self, spark, tmp_path):
        """writeStream.format('vf_tar'): each micro-batch's shards land
        under batch-keyed names via the commit rename; re-running from a
        FRESH checkpoint over the same input rewrites batch 0's files
        byte-identically (replay idempotency by construction)."""
        import json

        from vectorflow_spark.sources import tarsource
        from vectorflow_spark.sources.wds import read_tar

        tarsource.register(spark)
        src = tmp_path / "in"
        out = tmp_path / "out"
        src.mkdir()
        with open(src / "f0.json", "w") as f:
            for i in range(20):
                f.write(json.dumps({"id": i}) + "\n")

        def start(ckpt):
            rows = (
                spark.readStream.schema("id long")
                .option("maxFilesPerTrigger", 1)
                .json(str(src))
                .selectExpr(
                    "concat('shard-', lpad(cast(id % 2 as string), 5, '0'), '.tar') as shard",
                    "concat(lpad(cast(id as string), 6, '0'), '.txt') as member",
                    "encode(concat('p ', id), 'utf-8') as data",
                    "lpad(cast(id as string), 6, '0') as seq",
                )
            )
            q = (
                rows.writeStream.format("vf_tar")
                .option("path", str(out))
                .option("checkpointLocation", str(tmp_path / ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        start("ckpt_a")
        names = sorted(p.name for p in out.iterdir())
        assert names == ["b000000000-shard-00000.tar", "b000000000-shard-00001.tar"]
        first = {n: (out / n).read_bytes() for n in names}
        back = read_tar(spark, str(out))
        assert back.count() == 20
        # replay: fresh checkpoint reprocesses the same file as batch 0
        # and must overwrite the SAME names with the SAME bytes
        start("ckpt_b")
        assert sorted(p.name for p in out.iterdir()) == names
        for n in names:
            assert (out / n).read_bytes() == first[n]

    def test_warc_stream_batch(self, spark, tmp_path):
        import json

        from vectorflow_spark.sources import warcsource
        from vectorflow_spark.sources.warcmini import read_warc

        warcsource.register(spark)
        src = tmp_path / "in"
        out = tmp_path / "out"
        src.mkdir()
        with open(src / "f0.json", "w") as f:
            for i in range(10):
                f.write(json.dumps({"id": i}) + "\n")
        rows = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .selectExpr(
                "'segment-00000.warc.gz' as segment",
                "concat('http://h/', id) as url",
                "encode(concat('body ', id), 'utf-8') as body",
            )
        )
        q = (
            rows.writeStream.format("vf_warc")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(p.name for p in out.iterdir()) == ["b000000000-segment-00000.warc.gz"]
        back = read_warc(spark, str(out))
        assert back.filter("warc_type = 'response'").count() == 10


class TestOverwriteAndJobScopedTemps:
    """r6 ADVICE closures: (a) mode('overwrite') retires ALL prior
    shards/sidecars instead of silently mixing stale and new output;
    (b) temp cleanup is job-scoped, so a concurrent writer's in-flight
    .uncommitted files survive another job's commit."""

    def test_tar_overwrite_retires_prior_output(self, spark, tmp_path):
        from vectorflow_spark.sources import tarsource

        tarsource.register(spark)
        d = str(tmp_path)
        _tar_rows(spark, n=40, n_shards=4).repartition(4, "shard").write.format(
            "vf_tar"
        ).option("index", "true").mode("append").save(d)
        assert len([n for n in os.listdir(d) if n.endswith(".tar")]) == 4
        # second job: DIFFERENT shard names, overwrite mode
        rows = _tar_rows(spark, n=20, n_shards=2).withColumn(
            "shard", F.concat(F.lit("new-"), F.col("shard"))
        )
        rows.repartition(2, "shard").write.format("vf_tar").option("index", "true").mode(
            "overwrite"
        ).save(d)
        names = sorted(os.listdir(d))
        assert [n for n in names if n.endswith(".tar")] == [
            "new-shard-00000.tar",
            "new-shard-00001.tar",
        ]
        # prior sidecars retired too — nothing stale mixed in
        assert [n for n in names if n.endswith(".idx.json")] == [
            "_new-shard-00000.tar.idx.json",
            "_new-shard-00001.tar.idx.json",
        ]

    def test_warc_overwrite_retires_prior_output(self, spark, tmp_path):
        from vectorflow_spark.sources import warcsource

        warcsource.register(spark)
        d = str(tmp_path)

        def rows(seg):
            return spark.range(0, 6).select(
                F.lit(seg).alias("segment"),
                F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
                F.encode(F.concat(F.lit("b"), F.col("id")), "utf-8").alias("body"),
            )

        rows("old.warc.gz").repartition(1, "segment").write.format("vf_warc").option(
            "index", "true"
        ).mode("append").save(d)
        rows("new.warc.gz").repartition(1, "segment").write.format("vf_warc").mode(
            "overwrite"
        ).save(d)
        names = sorted(os.listdir(d))
        assert "old.warc.gz" not in names and "_old.warc.gz.cdx.json" not in names
        assert "new.warc.gz" in names

    def test_foreign_job_temps_survive_commit(self, spark, tmp_path):
        from vectorflow_spark.sources import tarsource

        tarsource.register(spark)
        d = tmp_path
        d.mkdir(exist_ok=True)
        foreign = d / ".uncommitted-otherjob-deadbeef"
        foreign.write_bytes(b"another job's in-flight shard")
        _tar_rows(spark).repartition(4, "shard").write.format("vf_tar").mode(
            "append"
        ).save(str(d))
        names = os.listdir(str(d))
        assert ".uncommitted-otherjob-deadbeef" in names  # survived our commit
        own = [n for n in names if n.startswith(".uncommitted-") and "otherjob" not in n]
        assert own == []  # our temps all renamed or cleaned

    def test_overwrite_keeps_inflight_temps(self, spark, tmp_path):
        from vectorflow_spark.sources import warcsource

        warcsource.register(spark)
        d = tmp_path
        foreign = d / ".uncommitted-otherjob-cafe"
        foreign.write_bytes(b"x")
        spark.range(0, 3).select(
            F.lit("s.warc.gz").alias("segment"),
            F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
            F.encode(F.col("id").cast("string"), "utf-8").alias("body"),
        ).repartition(1, "segment").write.format("vf_warc").mode("overwrite").save(str(d))
        assert ".uncommitted-otherjob-cafe" in os.listdir(str(d))


class TestStaleTempGC:
    """r7 ADVICE: temps from a job that crashed before abort() ran used to
    accumulate forever (abort only removes its OWN job's temps). Any
    committing writer now sweeps .uncommitted-* files older than the
    stale threshold; fresh foreign temps (a live concurrent writer)
    still survive."""

    def _age(self, p, days=8):
        import time

        old = time.time() - days * 86400
        os.utime(p, (old, old))

    def test_tar_commit_sweeps_crash_orphans(self, spark, tmp_path):
        from vectorflow_spark.sources import tarsource

        tarsource.register(spark)
        d = tmp_path
        stale = d / ".uncommitted-crashedjob-feed"
        stale.write_bytes(b"orphan")
        self._age(stale)
        fresh = d / ".uncommitted-livejob-beef"
        fresh.write_bytes(b"in-flight")
        # a multi-DAY foreign job's temp is inside the conservative 7-day
        # contract window and must survive other writers' commits
        slow = d / ".uncommitted-slowbackfill-cafe"
        slow.write_bytes(b"long-held")
        self._age(slow, days=2)
        _tar_rows(spark).repartition(4, "shard").write.format("vf_tar").mode(
            "append"
        ).save(str(d))
        names = os.listdir(str(d))
        assert ".uncommitted-crashedjob-feed" not in names
        assert ".uncommitted-livejob-beef" in names
        assert ".uncommitted-slowbackfill-cafe" in names

    def test_stale_window_env_override(self, monkeypatch):
        from vectorflow_spark.sources import tarsource, warcsource

        monkeypatch.setenv("VFS_SINK_STALE_TEMP_SECONDS", "3600")
        assert tarsource._stale_temp_seconds() == 3600.0
        assert warcsource._stale_temp_seconds() == 3600.0
        monkeypatch.setenv("VFS_SINK_STALE_TEMP_SECONDS", "not-a-number")
        assert tarsource._stale_temp_seconds() == 7 * 24 * 3600.0
        monkeypatch.delenv("VFS_SINK_STALE_TEMP_SECONDS")
        assert warcsource._stale_temp_seconds() == 7 * 24 * 3600.0

    def test_warc_commit_sweeps_crash_orphans(self, spark, tmp_path):
        from vectorflow_spark.sources import warcsource

        warcsource.register(spark)
        d = tmp_path
        stale = d / ".uncommitted-crashedjob-f00d"
        stale.write_bytes(b"orphan")
        self._age(stale)
        spark.range(0, 3).select(
            F.lit("s.warc.gz").alias("segment"),
            F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
            F.encode(F.col("id").cast("string"), "utf-8").alias("body"),
        ).repartition(1, "segment").write.format("vf_warc").mode("append").save(str(d))
        assert ".uncommitted-crashedjob-f00d" not in os.listdir(str(d))
