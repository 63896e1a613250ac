"""Sources / multimodal metadata / sessionization."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import _t, query


# ---------------------------------------------------------------------------
# Sources / multimodal / sessionization
# ---------------------------------------------------------------------------


@query(
    "q_html_strip",
    """
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(
               '<html><body><h1>T</h1><p>' || text || '</p></body></html>',
               '<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g')) AS stripped
    FROM documents
    """,
)
def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 (fixed semantics): tag-strip + whitespace-collapse of documents
    wrapped in synthetic HTML — the extraction path the reference's repr()
    bug should have been (SURVEY.md §7)."""
    from vectorflow_spark.sources.readers import strip_html_expr

    df = _t(spark, sf_dir, "documents", split=True)
    html = F.concat(F.lit("<html><body><h1>T</h1><p>"), F.col("text"), F.lit("</p></body></html>"))
    return df.select("doc_id", strip_html_expr(html).alias("stripped"))


@query(
    "q_binary_assets",
    """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind
    FROM documents
    """,
)
def q_binary_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal scan surface: text -> binary columns with per-kind
    dispatch (binary ops are JVM-side; octet_length must match DuckDB's
    utf-8 encode)."""
    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
    )


@query(
    "q_multimodal_meta",
    """
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 9 + 16*12*3
                     WHEN doc_id % 3 = 1 THEN 10 + 256
                     ELSE 10 + 8*8*6 END AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary pipeline round-trip: deterministic fake assets
    (image/audio/video codecs) -> Arrow -> pandas UDF header decode ->
    typed metadata. The oracle pins the exact byte sizes the codec layout
    implies — a full-plumbing integrity check, not just a row count."""
    from vectorflow_spark.operators.multimodal import synth_assets, with_asset_meta

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id")
    assets = with_asset_meta(synth_assets(docs))
    return assets.select(
        "asset_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@query(
    "q_mp3_meta",
    """
    SELECT doc_id AS asset_id,
           CAST(3 + doc_id % 5 AS INT) AS n_frames,
           CAST(CASE WHEN doc_id % 4 = 0 THEN 96 WHEN doc_id % 4 = 1 THEN 128
                     WHEN doc_id % 4 = 2 THEN 192 ELSE 320 END AS INT) AS bitrate_kbps,
           44100 AS sample_rate,
           CAST((3 + doc_id % 5) * 1152 AS BIGINT) AS n_samples,
           CAST((3 + doc_id % 5)
                * CAST(FLOOR(144000 * (CASE WHEN doc_id % 4 = 0 THEN 96
                                            WHEN doc_id % 4 = 1 THEN 128
                                            WHEN doc_id % 4 = 2 THEN 192
                                            ELSE 320 END) / 44100) AS BIGINT)
                + CASE WHEN doc_id % 3 = 0 THEN 10 + 17 + doc_id % 7 ELSE 0 END
                AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-audio-container classification WITHOUT decode: spec-shaped
    MP3 streams (operators/codecs.build_mp3 — true MPEG1 Layer III frame
    headers, zeroed payloads, every 3rd prefixed with an ID3v2 tag) are
    walked header-to-header by ``mp3_meta``, which hops via each frame's
    computed length for EXACT frame counts — the classify-before-decode
    step a 100 TB audio crawl needs while sample decode stays refused.
    The oracle re-derives every field from the public header arithmetic
    (frame_len = floor(144000*bitrate/rate), 1152 samples/frame, 10-byte
    ID3v2 header + syncsafe size), so a hash match pins the whole parser,
    tag skip included."""
    from vectorflow_spark.operators.codecs import build_mp3, mp3_meta

    import pandas as pd

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id")
    cols = ["asset_id", "n_frames", "bitrate_kbps", "sample_rate", "n_samples", "n_bytes"]

    def run(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                blob = build_mp3(
                    3 + i % 5, bitrate_kbps=(96, 128, 192, 320)[i % 4], seed=i
                )
                if i % 3 == 0:  # ID3v2.3 tag, syncsafe body size 17 + i%7
                    size = 17 + i % 7
                    blob = (
                        b"ID3\x03\x00\x00"
                        + bytes([0, 0, size >> 7, size & 0x7F])
                        + b"\x00" * size
                        + blob
                    )
                m = mp3_meta(blob)
                rows.append(
                    {
                        "asset_id": i,
                        "n_frames": m["n_frames"],
                        "bitrate_kbps": m["bitrate_kbps"],
                        "sample_rate": m["sample_rate"],
                        "n_samples": m["n_samples"],
                        "n_bytes": m["n_bytes"],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(
        run,
        "asset_id bigint, n_frames int, bitrate_kbps int, sample_rate int, "
        "n_samples bigint, n_bytes bigint",
    )


@query(
    "q_id3_meta",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '2.4.0' WHEN 1 THEN '2.3.0'
                ELSE '2.2.0' END AS id3_version,
           4 AS n_tag_frames,
           CAST(doc_id % 33 AS INT) AS padding,
           'Title ' || doc_id || ' ï' || (doc_id % 10) AS title,
           'Artist ' || (doc_id % 13) AS artist,
           CAST(1 + doc_id % 12 AS VARCHAR) AS track,
           CAST(doc_id % 21 AS INT) AS pic_type,
           'image/bmp' AS mime,
           CAST(9 + doc_id % 6 AS INT) AS pic_w,
           CAST(6 + doc_id % 4 AS INT) AS pic_h,
           CAST(8 + doc_id % 21 AS INT) AS mp3_frames,
           CAST((8 + doc_id % 21) * 1152 * 1000 // 44100 AS BIGINT) AS duration_ms,
           TRUE AS tag_skip_ok
    FROM documents WHERE doc_id % 7 = 4
    """,
)
def q_id3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID3v2 tag triage over MP3 crawl audio (operators/id3mini.py): per
    document a deterministic v2.2/v2.3/v2.4 tag (rotating all spec'd
    text encodings legal for the version — ISO-8859-1 everywhere,
    UTF-16 forms, UTF-8 in v2.4, UCS-2 in v2.2) with title/artist/track
    text frames (TT2/TP1/TRK in the v2.2 3-char layout, TIT2/TPE1/TRCK
    otherwise), an attached-picture album-art BMP (v2.2 PIC with its
    3-char image format, APIC elsewhere) and formula-sized padding
    fronts a spec-shaped MP3 (codecs.build_mp3); the gate parses the
    tag back (version, frame walk, padding, text decode in every
    encoding, picture extraction with pixel-exact BMP recovery via
    decoded dimensions) AND cross-checks
    the two independent tag-size implementations: id3v2_meta's parsed
    tag_size must equal the hop mp3_meta takes before finding the first
    audio frame (tag_skip_ok). The oracle re-derives every field from
    doc_id arithmetic. One Arrow-batched projection, no shuffle."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("id3_version", StringType()),
            StructField("n_tag_frames", IntegerType()),
            StructField("padding", IntegerType()),
            StructField("title", StringType()),
            StructField("artist", StringType()),
            StructField("track", StringType()),
            StructField("pic_type", IntegerType()),
            StructField("mime", StringType()),
            StructField("pic_w", IntegerType()),
            StructField("pic_h", IntegerType()),
            StructField("mp3_frames", IntegerType()),
            StructField("duration_ms", LongType()),
            StructField("tag_skip_ok", BooleanType()),
        ]
    )

    def run(batches):
        import numpy as np

        from vectorflow_spark.operators.codecs import (
            build_mp3,
            decode_image,
            encode_bmp,
            mp3_meta,
        )
        from vectorflow_spark.operators.id3mini import (
            apic_frame,
            build_id3v2,
            id3_pictures,
            id3_text,
            id3v2_meta,
            pic_frame_v22,
            text_frame,
            text_frame_v22,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                ver = (4, 3, 2)[i % 3]
                enc = (i // 3) % {4: 4, 3: 3, 2: 2}[ver]
                h, w = 6 + i % 4, 9 + i % 6
                art = encode_bmp(
                    np.random.default_rng(i * 131 + 7).integers(0, 256, (h, w, 3), np.uint8)
                )
                if ver == 2:
                    frames = [
                        text_frame_v22("TT2", f"Title {i} ï{i % 10}", enc),
                        text_frame_v22("TP1", f"Artist {i % 13}", 0),
                        text_frame_v22("TRK", str(1 + i % 12), 0),
                        pic_frame_v22(art, "BMP", picture_type=i % 21,
                                      description=f"c{i}", encoding=enc),
                    ]
                    t_title, t_artist, t_track = "TT2", "TP1", "TRK"
                else:
                    frames = [
                        text_frame("TIT2", f"Title {i} ï{i % 10}", enc),
                        text_frame("TPE1", f"Artist {i % 13}", 0),
                        text_frame("TRCK", str(1 + i % 12), 0),
                        apic_frame(art, picture_type=i % 21,
                                   description=f"c{i}", encoding=enc),
                    ]
                    t_title, t_artist, t_track = "TIT2", "TPE1", "TRCK"
                tag = build_id3v2(frames, version=ver, padding=i % 33)
                n_audio = 8 + i % 21
                blob = tag + build_mp3(n_audio, seed=i)
                m = id3v2_meta(blob)
                mm = mp3_meta(blob)  # hops the tag by its own arithmetic
                pics = id3_pictures(m)
                assert len(pics) == 1, f"doc {i}: {len(pics)} picture frames"
                px = decode_image(pics[0]["data"])
                rows.append(
                    (
                        i,
                        m["version"],
                        m["n_frames"],
                        m["padding"],
                        id3_text(m, t_title),
                        id3_text(m, t_artist),
                        id3_text(m, t_track),
                        pics[0]["picture_type"],
                        pics[0]["mime"],
                        px.shape[1],
                        px.shape[0],
                        mm["n_frames"],
                        mm["n_samples"] * 1000 // mm["sample_rate"],
                        m["tag_size"] == len(tag) and mm["n_frames"] == n_audio,
                    )
                )
            yield pd.DataFrame(rows, columns=out_schema.fieldNames())

    docs = (
        _t(spark, sf_dir, "documents", split=True)
        .filter(F.col("doc_id") % 7 == 4)
        .select("doc_id")
    )
    return docs.mapInPandas(run, out_schema)


@query(
    "q_gif_meta",
    """
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 4 = 0 THEN 'image' ELSE 'video' END AS kind,
           CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 2 + doc_id % 4 END AS INT) AS n_frames,
           CAST(8 + doc_id % 3 AS INT) AS width,
           CAST(6 + doc_id % 5 AS INT) AS height
    FROM documents
    """,
)
def q_gif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF classification through the typed-metadata pipeline: real GIF89a
    bytes (codecs.encode_gif — LZW-compressed grayscale frames, every 4th
    single-frame) parsed by decode_meta, which walks blocks WITHOUT LZW
    decode and calls single-frame GIFs images, animated ones videos. The
    oracle re-derives kind/frame-count/dimensions from the construction
    arithmetic, so a hash match pins the header walk, sub-block skipping
    and the image/video kind split. Pixel content is hash-seeded (not
    SQL-expressible), which is exactly why this query checks METADATA —
    the pixel path is pinned by q_video_neardup_pairs and unit tests."""
    from vectorflow_spark.operators.codecs import encode_gif
    from vectorflow_spark.operators.multimodal import decode_meta

    import hashlib

    import numpy as np
    import pandas as pd

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id")

    def run(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                nf = 1 if i % 4 == 0 else 2 + i % 4
                w, h = 8 + i % 3, 6 + i % 5
                seed = hashlib.sha256(f"gif{i}".encode()).digest()
                rng = np.random.default_rng(int.from_bytes(seed[:8], "big"))
                blob = encode_gif(rng.integers(0, 256, (nf, h, w), dtype=np.uint8))
                m = decode_meta(blob)
                rows.append(
                    {
                        "asset_id": i,
                        "kind": m["kind"],
                        "n_frames": m.get("n_frames") or 1,
                        "width": m["width"],
                        "height": m["height"],
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "n_frames", "width", "height"])

    return docs.mapInPandas(
        run, "asset_id bigint, kind string, n_frames int, width int, height int"
    )


@query(
    "q_dedup_survivors",
    """
    SELECT md5(text) AS digest, min(doc_id) AS keeper,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup survivor selection: one keeper (min doc id) per content
    digest — the row-level dedup operation itself, not just the histogram.
    One shuffle on the uniform digest key, min/count combine map-side."""
    df = _t(spark, sf_dir, "documents", split=True)
    return (
        df.select(F.md5("text").alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "q_stratified_sample",
    """
    WITH tagged AS (
        SELECT lang, doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 7))::BIGINT % 100 AS bucket
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN bucket < 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN bucket >= 80 AND bucket < 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(sum(CASE WHEN bucket >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
    FROM tagged GROUP BY lang
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split (80/10/10) via a content-hash
    bucket — the training-pipeline sampling primitive that is reproducible
    across engines, runs, and cluster sizes (unlike rand()-based sampling),
    counted per language stratum. Pure projection + one aggregation."""
    df = _t(spark, sf_dir, "documents")
    bucket = F.expr(
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '|split')), 1, 7), 16, 10) AS BIGINT) % 100"
    )
    return (
        df.select("lang", bucket.alias("bucket"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("bucket") < 80, 1).otherwise(0)).alias("n_train"),
            F.sum(F.when((F.col("bucket") >= 80) & (F.col("bucket") < 90), 1).otherwise(0)).alias("n_valid"),
            F.sum(F.when(F.col("bucket") >= 90, 1).otherwise(0)).alias("n_test"),
        )
    )


