"""WebDataset tar-shard ingestion (sources/tarsource.py + wds.py): the
standard container of large multimodal training corpora. Mirrors the
vf_warc test strategy: streaming memory contract, pushdown, corrupt
shards, opener backends, sink determinism — plus the sample-assembly
invariant (zero-shuffle adjacency grouping, correct across Arrow batch
boundaries)."""

from __future__ import annotations

import io
import tarfile

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.sources.wds import (
    read_tar,
    read_webdataset,
    webdataset_samples,
    write_webdataset,
)


def _docs(spark, n=60):
    return spark.range(0, n).select(
        F.concat(F.lit("s-"), F.lpad(F.col("id").cast("string"), 5, "0")).alias("key"),
        F.concat(F.lit("text "), F.col("id")).alias("txt"),
        F.to_json(F.struct(F.col("id").alias("n"))).alias("json"),
    )


class TestRoundtrip:
    def test_write_read_assemble(self, spark, tmp_path):
        d = str(tmp_path)
        m = write_webdataset(_docs(spark), d, "key", {"txt": "txt", "json": "json"}, n_shards=4)
        man = m.collect()
        assert sum(r.n_samples for r in man) == 60
        rows = read_tar(spark, d)
        assert rows.rdd.getNumPartitions() == 4  # one per shard
        assert rows.count() == 120
        samples = read_webdataset(spark, d).collect()
        assert len(samples) == 60 and all(r.n_parts == 2 for r in samples)
        got = {r.key: bytes(r.parts["txt"]).decode() for r in samples}
        assert got["s-00042"] == "text 42"

    def test_binary_parts_and_gzip_shards(self, spark, tmp_path):
        from vectorflow_spark.operators.multimodal import make_fake_image

        import pandas as pd
        from pyspark.sql.types import BinaryType

        gen = F.pandas_udf(
            lambda ids: pd.Series([make_fake_image(str(i)) for i in ids]), BinaryType()
        )
        df = spark.range(0, 20).select(
            F.concat(F.lit("img-"), F.col("id")).alias("key"),
            gen("id").alias("img"),
            F.concat(F.lit("caption "), F.col("id")).alias("txt"),
        )
        d = str(tmp_path)
        write_webdataset(
            df, d, "key", {"img": "fimg", "txt": "txt"}, n_shards=2, compress=True
        ).count()
        import os

        assert all(f.endswith(".tar.gz") for f in os.listdir(d) if not f.startswith("."))
        samples = read_webdataset(spark, d).collect()
        assert len(samples) == 20
        one = next(r for r in samples if r.key == "img-3")
        assert bytes(one.parts["fimg"]) == make_fake_image("3")  # byte-exact binary leg
        assert bytes(one.parts["txt"]) == b"caption 3"

    def test_rerun_is_byte_identical(self, spark, tmp_path):
        import hashlib
        import os

        d = str(tmp_path)
        write_webdataset(_docs(spark), d, "key", {"txt": "txt"}, n_shards=3).count()
        h1 = {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }
        write_webdataset(_docs(spark), d, "key", {"txt": "txt"}, n_shards=3).count()
        h2 = {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }
        assert h1 == h2 and len(h1) == 3


class TestAssembly:
    def test_carry_over_across_arrow_batches(self, spark, tmp_path):
        """Samples must never split at Arrow batch boundaries: one shard
        with 3000 two-member samples spans several 2048-row batches; the
        carry-over in webdataset_samples must reunite every pair."""
        d = str(tmp_path)
        write_webdataset(
            _docs(spark, n=3000), d, "key", {"txt": "txt", "json": "json"}, n_shards=1
        ).count()
        samples = read_webdataset(spark, d)
        counts = samples.groupBy("n_parts").count().collect()
        assert {(r.n_parts, r["count"]) for r in counts} == {(2, 3000)}

    def test_key_ext_split_rule(self):
        from vectorflow_spark.sources.tarsource import split_member_name

        assert split_member_name("0001.jpg") == ("0001", "jpg")
        assert split_member_name("a/b.c/0001.seg.json") == ("a/b.c/0001", "seg.json")
        assert split_member_name("no_ext") == ("no_ext", "")


class TestScanContracts:
    def test_shard_pushdown_prunes_partitions(self, spark, tmp_path):
        d = str(tmp_path)
        write_webdataset(_docs(spark), d, "key", {"txt": "txt"}, n_shards=4).count()
        df = read_tar(spark, d).filter(F.col("shard") == "shard-00002.tar")
        assert df.rdd.getNumPartitions() == 1
        assert {r.shard for r in df.collect()} == {"shard-00002.tar"}
        empty = read_tar(spark, d).filter(F.col("shard") == "nope.tar")
        assert empty.count() == 0

    def test_ext_pushdown_skips_members(self, spark, tmp_path):
        d = str(tmp_path)
        write_webdataset(_docs(spark), d, "key", {"txt": "txt", "json": "json"}, n_shards=2).count()
        rows = read_tar(spark, d).filter(F.col("ext") == "txt")
        got = rows.collect()
        assert len(got) == 60 and all(r.ext == "txt" for r in got)

    def test_empty_index_sidecars_yield_empty_scan_not_error(self, spark, tmp_path):
        """Index sidecars listing zero members leave partitions() with no
        range partitions; it must return the empty-scan sentinel instead
        of an empty list (PySpark would call read(None) and crash)."""
        import json

        d = str(tmp_path)
        write_webdataset(
            _docs(spark, n=4), d, "key", {"txt": "txt"}, n_shards=1, compress=False, index=True
        ).count()
        for side in tmp_path.glob("_*.idx.json"):
            side.write_text(json.dumps({"members": []}))
        assert read_tar(spark, d).count() == 0

    def test_corrupt_shard_yields_error_row(self, spark, tmp_path):
        d = str(tmp_path)
        write_webdataset(_docs(spark, n=10), d, "key", {"txt": "txt"}, n_shards=1).count()
        (tmp_path / "bad-00001.tar").write_bytes(b"not a tar at all" * 40)
        rows = read_tar(spark, d).collect()
        errs = [r for r in rows if r.ext == "error"]
        assert len(errs) == 1 and errs[0].shard == "bad-00001.tar"
        assert len([r for r in rows if r.ext == "txt"]) == 10
        with pytest.raises(Exception):
            read_tar(spark, d, on_corrupt="strict").collect()

    def test_streaming_memory_is_member_bounded(self, tmp_path):
        """Pipe-mode tar walk: peak outstanding bytes between yields stay
        ~one member + tar's block buffer, never the shard."""
        from vectorflow_spark.sources.tarsource import VfTarReader, _TarShardPartition

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for i in range(30):
                data = bytes([i % 251]) * 100_000
                info = tarfile.TarInfo(name=f"k{i:03d}.bin")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
        blob = buf.getvalue()
        p = tmp_path / "big-00000.tar"
        p.write_bytes(blob)
        high_water = 0
        outstanding = 0

        class MeterFS:
            def list_files(self, path, glob):
                return [str(p)]

            def open(self, path):
                f = open(p, "rb")

                class Meter:
                    def read(self, n=-1):
                        nonlocal outstanding, high_water
                        data = f.read(n)
                        outstanding += len(data)
                        high_water = max(high_water, outstanding)
                        return data

                    def close(self):
                        f.close()

                return Meter()

        r = VfTarReader({"path": str(tmp_path)})
        r._fs_cache = MeterFS()
        n = 0
        # _rows is the member-bounded contract; read() adds the bounded
        # Arrow batch buffer on top
        for _row in r._rows(_TarShardPartition(str(p))):
            outstanding = 0  # member handed off
            n += 1
        assert n == 30
        member_bound = 100_000 + (20 << 10)  # member + tar blocking slack
        assert high_water <= 2 * member_bound
        assert len(blob) > 10 * member_bound

    def test_mount_opener_end_to_end(self, spark, tmp_path):
        d = tmp_path / "bucket" / "wds"
        d.mkdir(parents=True)
        write_webdataset(_docs(spark, n=12), str(d), "key", {"txt": "txt"}, n_shards=2).count()
        samples = read_webdataset(
            spark, "s3://bucket/wds", io=f"mount:{tmp_path}"
        ).collect()
        assert len(samples) == 12

    def test_new_shards_stream_incrementally(self, spark, tmp_path):
        from vectorflow_spark.sources import tarsource

        tarsource.register(spark)
        src = tmp_path / "stream"
        src.mkdir()

        def drop(name, keys):
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tar:
                for k in keys:
                    data = f"d{k}".encode()
                    info = tarfile.TarInfo(name=f"{k}.txt")
                    info.size = len(data)
                    tar.addfile(info, io.BytesIO(data))
            (src / name).write_bytes(buf.getvalue())

        drop("shard-0.tar", ["a", "b"])
        batches = []

        def sink(df, _bid):
            batches.append({r.key for r in df.collect()})

        q = (
            spark.readStream.format("vf_tar")
            .load(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            drop("shard-1.tar", ["c"])
            q.processAllAvailable()
        finally:
            q.stop()
        seen = [b for b in batches if b]
        assert seen == [{"a", "b"}, {"c"}]


class TestIndexedSplittableScan:
    """The wids-style index sidecar: tar shards become SPLITTABLE —
    sample-aligned byte-range partitions with seek reads, so a few huge
    shards no longer cap parallelism and ext-pushdown skips members
    without streaming past them."""

    def test_range_partitions_match_streamed_scan(self, spark, tmp_path):
        d = str(tmp_path)
        write_webdataset(
            _docs(spark, n=200), d, "key", {"txt": "txt", "json": "json"},
            n_shards=2, index=True,
        ).count()
        import os

        assert sorted(f for f in os.listdir(d) if f.startswith("_")) == [
            "_shard-00000.tar.idx.json",
            "_shard-00001.tar.idx.json",
        ]
        idx = read_tar(spark, d, samples_per_task=25)
        assert idx.rdd.getNumPartitions() > 2  # split beyond shard count
        streamed = read_tar(spark, d, index="never")
        assert streamed.rdd.getNumPartitions() == 2
        a = sorted((r.shard, r.member, bytes(r.data)) for r in idx.collect())
        b = sorted((r.shard, r.member, bytes(r.data)) for r in streamed.collect())
        assert a == b and len(a) == 400

    def test_sample_alignment_at_tiny_tasks(self, spark, tmp_path):
        """samples_per_task=1: maximal splitting must still never cut a
        sample across partitions — assembly sees every pair whole."""
        d = str(tmp_path)
        write_webdataset(
            _docs(spark, n=40), d, "key", {"txt": "txt", "json": "json"},
            n_shards=1, index=True,
        ).count()
        rows = read_tar(spark, d, samples_per_task=1)
        assert rows.rdd.getNumPartitions() == 40  # one sample per partition
        samples = webdataset_samples(rows).collect()
        assert len(samples) == 40 and all(r.n_parts == 2 for r in samples)

    def test_ext_pushdown_on_indexed_scan(self, spark, tmp_path):
        d = str(tmp_path)
        write_webdataset(
            _docs(spark, n=30), d, "key", {"txt": "txt", "json": "json"},
            n_shards=1, index=True,
        ).count()
        got = read_tar(spark, d, samples_per_task=10).filter(F.col("ext") == "json").collect()
        assert len(got) == 30 and all(r.ext == "json" for r in got)

    def test_index_require_and_compress_guard(self, spark, tmp_path):
        d = str(tmp_path)
        write_webdataset(_docs(spark, n=10), d, "key", {"txt": "txt"}, n_shards=1).count()
        with pytest.raises(Exception, match="index sidecar"):
            read_tar(spark, d, index="require").collect()
        with pytest.raises(ValueError, match="seekable"):
            write_webdataset(
                _docs(spark, n=5), d, "key", {"txt": "txt"}, compress=True, index=True
            )

    def test_indexed_through_mount_opener(self, spark, tmp_path):
        d = tmp_path / "bucket" / "wds"
        d.mkdir(parents=True)
        write_webdataset(
            _docs(spark, n=30), str(d), "key", {"txt": "txt"}, n_shards=1, index=True
        ).count()
        rows = read_tar(
            spark, "s3://bucket/wds", io=f"mount:{tmp_path}", samples_per_task=10
        )
        assert rows.rdd.getNumPartitions() == 3
        assert rows.count() == 30


def test_samples_compose_with_text_operators(spark, tmp_path):
    """The point of the container: assembled samples feed the SAME text
    operators as any documents table — decode the txt leg and run the
    token counter over it."""
    d = str(tmp_path)
    write_webdataset(_docs(spark), d, "key", {"txt": "txt"}, n_shards=2).count()
    docs = read_webdataset(spark, d).select(
        F.col("key").alias("doc_id"),
        F.decode(F.element_at(F.col("parts"), "txt"), "UTF-8").alias("text"),
    )
    n = docs.select(F.size(F.split("text", " ")).alias("n_tokens")).agg(
        F.sum("n_tokens")
    ).first()[0]
    assert n == 60 * 2  # "text <i>"


class TestByteBalancedRangePartitions:
    """bytesPerTask: with skewed member sizes a pure sample count makes
    straggler tasks — a range chunk must close when EITHER the sample
    budget or the byte budget hits, still never cutting a sample."""

    def _skewed(self, spark, n=30):
        # every 10th sample carries a ~50 KB payload among ~20 B ones
        return spark.range(0, n).select(
            F.concat(F.lit("s-"), F.lpad(F.col("id").cast("string"), 5, "0")).alias("key"),
            F.when(F.col("id") % 10 == 0, F.expr("repeat('x', 50000)"))
            .otherwise(F.concat(F.lit("small "), F.col("id")))
            .alias("txt"),
            F.to_json(F.struct(F.col("id").alias("n"))).alias("json"),
        )

    def test_byte_budget_splits_skewed_shard(self, spark, tmp_path):
        d = str(tmp_path)
        write_webdataset(
            self._skewed(spark), d, "key", {"txt": "txt", "json": "json"},
            n_shards=1, index=True,
        ).count()
        # sample budget alone would keep all 30 samples in ONE partition
        by_count = read_tar(spark, d, samples_per_task=2048)
        assert by_count.rdd.getNumPartitions() == 1
        # a 40 KB byte budget (under one big member) forces a split at
        # the next sample boundary after every big sample
        by_bytes = read_tar(spark, d, samples_per_task=2048, bytes_per_task=40_000)
        assert by_bytes.rdd.getNumPartitions() == 4
        a = sorted((r.shard, r.member, bytes(r.data)) for r in by_count.collect())
        b = sorted((r.shard, r.member, bytes(r.data)) for r in by_bytes.collect())
        assert a == b and len(a) == 60

    def test_byte_split_is_sample_aligned(self, spark, tmp_path):
        d = str(tmp_path)
        write_webdataset(
            self._skewed(spark, n=20), d, "key", {"txt": "txt", "json": "json"},
            n_shards=1, index=True,
        ).count()
        rows = read_tar(spark, d, samples_per_task=2048, bytes_per_task=1)
        # 1-byte budget = maximal byte splitting = one sample per chunk,
        # and assembly must still see every pair whole
        assert rows.rdd.getNumPartitions() == 20
        samples = webdataset_samples(rows).collect()
        assert len(samples) == 20 and all(r.n_parts == 2 for r in samples)
