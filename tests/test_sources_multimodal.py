"""Extraction-source and multimodal-column tests."""

import struct

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.operators.multimodal import (
    audio_features,
    image_features,
    image_resize,
    make_fake_audio,
    make_fake_image,
    make_fake_video,
    decode_meta,
    synth_assets,
    video_frame_sample,
    with_asset_meta,
)
from vectorflow_spark.sources.readers import extract_documents, read_raw_files


class TestExtraction:
    @pytest.fixture(scope="class")
    def files(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("rawfiles")
        (d / "a.txt").write_text("plain text file\nwith two lines")
        (d / "b.md").write_text("# heading\n\nbody text")
        (d / "c.html").write_text("<html><script>var x=1;</script><body><h1>Title</h1><p>para text</p></body></html>")
        (d / "noext").write_text("sniffed as text because utf-8")
        (d / "bad.exe").write_bytes(bytes([0xFF, 0xFE, 0x00, 0x01]) * 10)
        return str(d)

    def test_read_and_extract(self, spark, files):
        raw = read_raw_files(spark, files)
        assert raw.count() == 5
        out = {r.source: r for r in extract_documents(raw).collect()}
        assert out["a.txt"].kind == "txt" and "two lines" in out["a.txt"].text
        assert out["b.md"].kind == "md" and out["b.md"].text.startswith("# heading")
        # html extraction strips script blocks and tags (unlike the
        # reference's repr() bug)
        assert out["c.html"].kind == "html"
        assert out["c.html"].text == "Title para text"
        assert "var x=1" not in out["c.html"].text
        # extensionless utf-8 file accepted via content sniff
        assert out["noext"].kind == "txt"
        # binary garbage rejected
        assert "bad.exe" not in out

    def test_stage_presigned_urls(self, spark, files, tmp_path):
        """S6: presigned-URL staging — file:// URLs stand in for S3
        presigned HTTPS (same urllib code path, no network)."""
        from vectorflow_spark.sources.readers import stage_presigned

        urls = [f"file://{files}/a.txt", f"file://{files}/b.md"]
        staged = stage_presigned(spark, urls, str(tmp_path / "staged"))
        out = {r.source.split("_", 1)[1]: r for r in extract_documents(staged).collect()}
        assert set(out) == {"a.txt", "b.md"}
        assert "two lines" in out["a.txt"].text

    def test_pipeline_from_files(self, spark, files):
        from vectorflow_spark.config import ChunkStrategy, PipelineConfig
        from vectorflow_spark.pipeline import run_pipeline

        docs = extract_documents(read_raw_files(spark, files))
        cfg = PipelineConfig(
            chunk_strategy=ChunkStrategy.SENTENCE_BY_CHARACTERS,
            chunk_size=64,
            chunk_overlap=16,
            embedding_dim=8,
        )
        out = run_pipeline(docs, cfg)
        assert out.count() > 0
        assert set(out.columns) == {"id", "source_data", "source_document", "embeddings"}


class TestFakeCodecs:
    def test_roundtrip_meta(self):
        img = make_fake_image("s", 10, 8, 3)
        assert decode_meta(img) == {"kind": "image", "width": 10, "height": 8, "channels": 3, "n_bytes": len(img)}
        aud = make_fake_audio("s", 16000, 100)
        assert decode_meta(aud)["sample_rate"] == 16000
        vid = make_fake_video("s", 4, 8, 6)
        assert decode_meta(vid)["n_frames"] == 4

    def test_unknown_codec_raises(self):
        # A magic no supported codec recognises -> refuse, don't guess.
        with pytest.raises(NotImplementedError):
            decode_meta(b"JPEGNOPE....")

    def test_malformed_png_raises_value_error(self):
        # Valid PNG magic but garbage chunk layout: the PNG parser owns this
        # and must fail loudly (malformed input != unsupported codec).
        with pytest.raises(ValueError):
            decode_meta(b"\x89PNG\r\n\x1a\n....")

    def test_truncated_bmp_meta_is_value_error(self):
        # BMP magic + too few bytes for the INFO header: contracted
        # ValueError, never a raw struct.error
        with pytest.raises(ValueError, match="truncated BMP"):
            decode_meta(b"BM" + b"\x00" * 20)

    def test_core_header_bmp_refused(self):
        # BITMAPCOREHEADER (hdr_size=12): decode_meta must refuse like
        # decode_bmp does, not read garbage at BITMAPINFOHEADER offsets.
        core = b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + b"\x00" * 24
        with pytest.raises(NotImplementedError):
            decode_meta(core)


class TestMultimodalPipeline:
    @pytest.fixture(scope="class")
    def assets(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
        return synth_assets(docs).cache()

    def test_meta_plumbing(self, assets):
        rows = with_asset_meta(assets).collect()
        assert len(rows) == 30
        for r in rows:
            assert r.meta.kind == r.kind
            assert r.meta.n_bytes == len(r.data)

    def test_image_resize_real_kernel(self, spark, assets):
        imgs = assets.filter(F.col("kind") == "image")
        out = image_resize(imgs, 4, 4).collect()
        for r in out:
            m = decode_meta(bytes(r.resized))
            assert (m["width"], m["height"]) == (4, 4)

    def test_image_features_deterministic(self, assets):
        imgs = assets.filter(F.col("kind") == "image")
        a = {r.asset_id: list(r.features) for r in image_features(imgs, dim=8).collect()}
        b = {r.asset_id: list(r.features) for r in image_features(imgs, dim=8).collect()}
        assert a == b
        assert all(len(v) == 8 for v in a.values())

    def test_video_frame_sample_fanout(self, assets):
        vids = assets.filter(F.col("kind") == "video")
        n_vids = vids.count()
        frames = video_frame_sample(vids, every_k=2).collect()
        assert len(frames) == n_vids * 4  # 8 frames, every 2nd
        m = decode_meta(bytes(frames[0].frame))
        assert m["kind"] == "image" and m["channels"] == 1

    def test_audio_features(self, assets):
        auds = assets.filter(F.col("kind") == "audio")
        out = audio_features(auds).collect()
        for r in out:
            assert 0.0 <= r.mean_amp <= 255.0
            assert r.peak_amp >= r.mean_amp


def test_image_dhash_exact_dup_groups(spark):
    from vectorflow_spark.operators.multimodal import image_dhash, make_fake_image
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    gen = F.pandas_udf(
        lambda ids: pd.Series([make_fake_image(str(int(i) % 5)) for i in ids]),
        BinaryType(),
    )
    assets = (
        spark.range(0, 50)
        .select(F.col("id").alias("asset_id"), gen("id").alias("data"))
    )
    hashed = image_dhash(assets)
    groups = hashed.groupBy("dhash").count().collect()
    # 5 distinct seeds -> at most 5 hash groups (dhash may collide but
    # identical pixels always hash identically), each holding 10 images
    assert sum(r["count"] for r in groups) == 50
    assert len(groups) <= 5
    assert all(r["count"] % 10 == 0 for r in groups)
    # deterministic: re-hash produces identical values
    again = {r.asset_id: r.dhash for r in image_dhash(assets).collect()}
    first = {r.asset_id: r.dhash for r in hashed.collect()}
    assert first == again


def test_image_dhash_exif_orientation_normalization(spark):
    """Camera-rotated duplicates: raw dHash misses the pair, the
    normalize_orientation path recovers it (operators/exifmini.py)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from vectorflow_spark.operators.multimodal import image_dhash

    def gen_one(i: int) -> bytes:
        from vectorflow_spark.operators.exifmini import (
            inverse_exif_orientation,
            tiff_add_exif,
        )
        from vectorflow_spark.operators.tiffmini import encode_tiff

        display = np.random.default_rng(7).integers(0, 256, (10, 14, 3), np.uint8)
        o = 1 + i % 8  # same display image, stored under all 8 orientations
        return tiff_add_exif(
            encode_tiff(inverse_exif_orientation(display, o)), orientation=o
        )

    gen = F.pandas_udf(
        lambda ids: pd.Series([gen_one(int(i)) for i in ids]), BinaryType()
    )
    assets = spark.range(0, 8).select(F.col("id").alias("asset_id"), gen("id").alias("data"))
    raw = image_dhash(assets).select("dhash").distinct().count()
    normalized = (
        image_dhash(assets, normalize_orientation=True)
        .select("dhash").distinct().count()
    )
    assert raw > 1  # rotated copies hash apart without normalization
    assert normalized == 1  # one duplicate group once orientation is applied


# --- S4 extractor-path parity: markdown_reader_expr vs a python twin -------


def _md_reader_twin(content: str) -> str:
    """Direct transcription of llama_hub MarkdownReader's published
    algorithm (the reference runs it at src/extract/extract.py:78-88)."""
    import re

    content = re.sub(r"\[(.*?)\]\((.*?)\)", r"\1", content)
    content = re.sub(r"!{1}\[\[(.*)\]\]", "", content)
    tups = []
    cur_h, cur_t = None, ""
    for line in content.split("\n"):
        if re.match(r"^#+\s", line):
            if cur_h is not None:
                if cur_t == "":
                    continue  # swallows the header line entirely
                tups.append((cur_h, cur_t))
            else:
                tups.append((cur_h, cur_t))
            cur_h, cur_t = line, ""
        else:
            cur_t += line + "\n"
    tups.append((cur_h, cur_t))
    tups = [
        (re.sub(r"#", "", k).strip() if k else k, re.sub(r"<.*?>", "", v))
        for k, v in tups
    ]
    return "\n".join(v if k is None else f"\n\n{k}\n{v}" for k, v in tups)


class TestMarkdownReaderParity:
    CASES = [
        "plain text\nno headers at all\n",
        "# A\ntext under a\n## B\n## C\nunder one of them\n",
        "# A\n## B\n## C\ntext\n## D\nmore",
        "lead text\n# A\n# B\n\n# C\ntail",
        "# only header",
        "",
        "x [link](http://a) y ![[img]] z <b>bold</b>\n# H <i>i</i> #x\nbody <tag>\n",
        "# A\n### Tail",
        "intro\n#### \nweird empty header title\n",
        "#nospace not a header\n# real\n",
    ]

    def test_fold_matches_twin_on_edge_cases(self, spark):
        from pyspark.sql import functions as F

        from vectorflow_spark.sources.readers import markdown_reader_expr

        df = spark.createDataFrame(list(enumerate(self.CASES)), "i int, md string")
        got = {r.i: r.o for r in df.select("i", markdown_reader_expr(F.col("md")).alias("o")).collect()}
        for i, c in enumerate(self.CASES):
            assert got[i] == _md_reader_twin(c), f"case {i}: {c!r}"

    def test_fold_matches_twin_on_random_docs(self, spark):
        import random

        from pyspark.sql import functions as F

        from vectorflow_spark.sources.readers import markdown_reader_expr

        rng = random.Random(42)
        pieces = [
            "# H{}", "## Sub {} x", "#### ", "text {}", "", "  ", "[a{}](http://x)",
            "![[im{}]]", "<b>t{}</b>", "#notaheader{}", "\tindent {}",
        ]
        docs = [
            "\n".join(rng.choice(pieces).format(rng.randrange(10)) for _ in range(rng.randrange(0, 20)))
            for _ in range(60)
        ]
        df = spark.createDataFrame(list(enumerate(docs)), "i int, md string")
        got = {r.i: r.o for r in df.select("i", markdown_reader_expr(F.col("md")).alias("o")).collect()}
        for i, c in enumerate(docs):
            assert got[i] == _md_reader_twin(c), f"doc {i}: {c!r}"

    def test_extract_documents_reader_mode(self, spark, tmp_path):
        import pathlib

        p = pathlib.Path(tmp_path)
        (p / "a.md").write_text("# Title\n## Gone\nbody [x](http://y)\n")
        (p / "b.txt").write_text("plain text")
        from vectorflow_spark.sources.readers import extract_documents

        raw = spark.read.format("binaryFile").load(str(p)).selectExpr(
            "path AS source", "content"
        )
        rows = {r.kind: r.text for r in extract_documents(raw, markdown_mode="reader").collect()}
        assert rows["txt"] == "plain text"
        assert rows["md"] == _md_reader_twin("# Title\n## Gone\nbody [x](http://y)\n")
        assert "## Gone" not in rows["md"] and "Title" in rows["md"]
