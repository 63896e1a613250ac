"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: binary columns ride Arrow
batches into pandas UDFs, metadata is a typed struct column, features come
back as ``array<float>``, and every operator is a per-row map (no shuffle)
that scales by partitioning alone.

Container support (operators/codecs.py): REAL stdlib-decodable formats —
BMP images (uncompressed 24/32-bit), PNG (zlib IS the stdlib; sequential
+ Adam7), JPEG (baseline + progressive via operators/jpegmini.py), GIF
(LZW, palettes, interlace, animation compositing — single-frame GIFs are
images, animated GIFs are videos), WebP-lossless (VP8L via
operators/webpmini.py), baseline TIFF (strips/PackBits/TIFF-LZW/
predictor via operators/tiffmini.py), PCM WAV audio (8/16/24/32-bit incl. WAVE_FORMAT_EXTENSIBLE),
AIFF/AIFF-C and Sun AU containers + IMA-ADPCM WAV (operators/aiffmini.py), MJPEG
AVI video (RIFF + one JPEG per frame) and MP3 frame headers (metadata
only) — plus the deterministic FAKE codec family below; every kernel
(metadata, resize, dHash, frame sample, audio features) dispatches on
magic bytes and runs the same pixel/sample math for all. Formats that
genuinely need external libraries (MP4, non-MJPG AVI, lossy WebP, MP3
sample decode) raise ``NotImplementedError`` loudly — parse correctly
or refuse, never guess.

The FAKE codec family (seeded, reproducible test assets):

    FIMG | u16 width | u16 height | u8 channels | pixels (w*h*c bytes)
    FAUD | u32 sample_rate | u16 n_samples | samples (u8 each)
    FVID | u16 n_frames | u16 frame_w | u16 frame_h | frames (w*h bytes each)

The generators are seeded from an id, so asset bytes are reproducible across
runs/partitions — the multimodal analog of the E3 deterministic embedding.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectorflow_spark.operators import codecs

IMG_MAGIC, AUD_MAGIC, VID_MAGIC = b"FIMG", b"FAUD", b"FVID"

META_STRUCT = (
    "struct<kind: string, width: int, height: int, channels: int, "
    "sample_rate: int, n_samples: int, n_frames: int, n_bytes: bigint>"
)


def _seed_bytes(seed: str, n: int) -> bytes:
    out = b""
    block = 0
    while len(out) < n:
        out += hashlib.blake2b(f"{seed}|{block}".encode(), digest_size=64).digest()
        block += 1
    return out[:n]


def make_fake_image(seed: str, width: int = 16, height: int = 12, channels: int = 3) -> bytes:
    header = IMG_MAGIC + struct.pack("<HHB", width, height, channels)
    return header + _seed_bytes(seed, width * height * channels)


def make_fake_audio(seed: str, sample_rate: int = 8000, n_samples: int = 256) -> bytes:
    header = AUD_MAGIC + struct.pack("<IH", sample_rate, n_samples)
    return header + _seed_bytes(seed, n_samples)


def make_fake_video(seed: str, n_frames: int = 8, w: int = 8, h: int = 6) -> bytes:
    header = VID_MAGIC + struct.pack("<HHH", n_frames, w, h)
    return header + _seed_bytes(seed, n_frames * w * h)


def decode_meta(data: bytes) -> dict:
    """Parse container headers into typed metadata: FAKE family, BMP,
    PNG, JPEG, GIF (single-frame -> image, animated -> video), WebP
    (VP8L lossless + VP8 lossy keyframes), MJPEG AVI, MP3 frame headers,
    MP4/ISO-BMFF box headers (duration/tracks/codec fourcc — header
    fields only, samples stay compressed/untouched) and PCM WAV (stdlib
    wave). MP4/MP3 SAMPLE decode stays refused (external codecs); only
    their headers parse."""
    magic = data[:4]
    if magic == IMG_MAGIC:
        w, h, c = struct.unpack("<HHB", data[4:9])
        return {"kind": "image", "width": w, "height": h, "channels": c, "n_bytes": len(data)}
    if magic == AUD_MAGIC:
        sr, n = struct.unpack("<IH", data[4:10])
        return {"kind": "audio", "sample_rate": sr, "n_samples": n, "n_bytes": len(data)}
    if magic == VID_MAGIC:
        nf, w, h = struct.unpack("<HHH", data[4:10])
        return {"kind": "video", "n_frames": nf, "width": w, "height": h, "n_bytes": len(data)}
    if magic == codecs.GIF_MAGIC:
        m = codecs.gif_meta(bytes(data))
        if m["n_frames"] == 1:
            return {"kind": "image", "width": m["width"], "height": m["height"],
                    "channels": 3, "n_bytes": len(data)}
        return {"kind": "video", "n_frames": m["n_frames"], "width": m["width"],
                "height": m["height"], "n_bytes": len(data)}
    if codecs.looks_like_mp3(bytes(data[:4])):
        m = codecs.mp3_meta(bytes(data))
        return {
            "kind": "audio",
            "sample_rate": m["sample_rate"],
            "n_samples": m["n_samples"],
            "n_bytes": len(data),
        }
    if magic == b"OggS":
        from vectorflow_spark.operators.oggmini import ogg_meta

        m = ogg_meta(bytes(data))
        return {
            "kind": "audio",
            "sample_rate": m["sample_rate"],
            "n_samples": m["n_samples"],
            "n_bytes": len(data),
        }
    if magic == b"FORM" and bytes(data[8:12]) in (b"AIFF", b"AIFC"):
        from vectorflow_spark.operators.aiffmini import aiff_meta

        m = aiff_meta(bytes(data))
        return {
            "kind": "audio",
            "sample_rate": int(round(m["sample_rate"])),
            "n_samples": m["n_frames"],
            "n_bytes": len(data),
        }
    if magic == b".snd":
        from vectorflow_spark.operators.aiffmini import au_meta

        m = au_meta(bytes(data))
        return {
            "kind": "audio",
            "sample_rate": m["sample_rate"],
            "n_samples": m["n_frames"],
            "n_bytes": len(data),
        }
    if magic == b"fLaC":
        from vectorflow_spark.operators.flacmini import flac_meta

        m = flac_meta(bytes(data))
        return {
            "kind": "audio",
            "sample_rate": m["sample_rate"],
            "n_samples": m["n_samples"],
            "n_bytes": len(data),
        }
    if magic == codecs.RIFF_MAGIC and data[8:12] == codecs.AVI_FORM:
        m = codecs.avi_meta(bytes(data))
        return {
            "kind": "video",
            "n_frames": m["n_frames"],
            "width": m["width"],
            "height": m["height"],
            "n_bytes": len(data),
        }
    if data[:2] == codecs.BMP_MAGIC:
        # Mirror decode_bmp's guards: a BITMAPCOREHEADER or compressed BMP
        # would yield garbage at the BITMAPINFOHEADER offsets — refuse instead.
        if len(data) < 34:
            raise ValueError("truncated BMP header")
        (hdr_size,) = struct.unpack_from("<I", data, 14)
        if hdr_size < 40:
            raise NotImplementedError(f"BMP core-header size {hdr_size} not supported")
        w, h_raw = struct.unpack_from("<ii", data, 18)
        _planes, bpp = struct.unpack_from("<HH", data, 26)
        (compression,) = struct.unpack_from("<I", data, 30)
        ok = (compression == 0 and bpp in (1, 4, 24, 32)) or (bpp == 8 and compression in (0, 1))
        if not ok:
            # full decode_bmp parity: 16-bpp / exotic-compression BMPs must
            # refuse here too, not report channels=3 metadata the pixel
            # kernels then refuse to decode
            raise NotImplementedError(
                f"only uncompressed 24/32-bit and palette 8/4/1-bit BMP supported "
                f"(bpp={bpp}, compression={compression})"
            )
        return {"kind": "image", "width": w, "height": abs(h_raw), "channels": 3, "n_bytes": len(data)}
    if magic == codecs.RIFF_MAGIC and data[8:12] == b"WEBP":
        if bytes(data[12:16]) == b"VP8X" and len(data) > 20 and data[20] & 0x02:
            from vectorflow_spark.operators.webpmini import webp_anim_meta

            m = webp_anim_meta(bytes(data))
            return {"kind": "video", "n_frames": m["n_frames"], "width": m["width"],
                    "height": m["height"], "n_bytes": len(data)}
        from vectorflow_spark.operators.webpmini import webp_meta

        w, h, c = webp_meta(bytes(data))
        return {"kind": "image", "width": w, "height": h, "channels": c, "n_bytes": len(data)}
    if bytes(data[:4]) in (b"II*\x00", b"MM\x00*"):
        from vectorflow_spark.operators.tiffmini import tiff_meta

        w, h, c = tiff_meta(bytes(data))
        return {"kind": "image", "width": w, "height": h, "channels": c, "n_bytes": len(data)}
    if magic == codecs.RIFF_MAGIC:
        samples, rate = codecs.decode_wav(bytes(data))  # WAVE form (AVI matched above)
        return {"kind": "audio", "sample_rate": rate, "n_samples": len(samples), "n_bytes": len(data)}
    if data[:8] == codecs.PNG_MAGIC:
        w, h, c = codecs.png_meta(bytes(data))
        return {"kind": "image", "width": w, "height": h, "channels": c, "n_bytes": len(data)}
    if data[:3] == codecs.JPEG_MAGIC:
        from vectorflow_spark.operators.jpegmini import jpeg_meta

        w, h, c = jpeg_meta(bytes(data))
        return {"kind": "image", "width": w, "height": h, "channels": c, "n_bytes": len(data)}
    if len(data) >= 12 and bytes(data[4:8]) == b"ftyp":
        # MP4/ISO-BMFF: header-only box walk (operators/mp4mini.py) — the
        # q_mp3_meta pattern for video; SAMPLE decode still refuses in
        # codecs.decode_video (H.264/AAC need external libraries)
        from vectorflow_spark.operators.mp4mini import mp4_meta

        m = mp4_meta(bytes(data))
        if m["kind"] == "video":
            vid = next(t for t in m["tracks"] if t["kind"] == "video")
            return {
                "kind": "video",
                "n_frames": vid["n_samples"],
                "width": m["width"],
                "height": m["height"],
                "n_bytes": len(data),
            }
        aud = next((t for t in m["tracks"] if t["kind"] == "audio"), None)
        return {
            "kind": "audio",
            "sample_rate": aud["timescale"] if aud else None,
            "n_samples": aud["n_samples"] if aud else None,
            "n_bytes": len(data),
        }
    raise NotImplementedError(
        "codec decode supports the FAKE family, BMP, PNG, JPEG "
        "(baseline/progressive), GIF, WebP (lossless + lossy keyframes), "
        "baseline TIFF, PCM WAV, MP3 headers, MJPEG AVI and MP4/ISO-BMFF "
        "headers; MP4 SAMPLE decode requires external libraries not "
        "installed in this environment"
    )


def with_asset_meta(assets: DataFrame, data_col: str = "data") -> DataFrame:
    """Decode header -> typed metadata struct. mapInPandas so binary rides
    Arrow; one pass, no shuffle."""
    fields = [f.name for f in assets.schema.fields]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in assets.schema.fields)
    schema += f", meta {META_STRUCT}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[data_col]:
                m = dict.fromkeys(
                    ["kind", "width", "height", "channels", "sample_rate", "n_samples", "n_frames", "n_bytes"]
                )
                m.update(decode_meta(bytes(b)))
                metas.append(m)
            yield pdf[fields].assign(meta=metas)

    return assets.mapInPandas(run, schema=schema)


def image_resize(assets: DataFrame, out_w: int, out_h: int, data_col: str = "data") -> DataFrame:
    """Nearest-neighbor resize — a real pixel kernel (numpy over Arrow
    batches) over any decodable image container (FAKE, BMP or PNG); the result
    re-encodes in the SAME container family as the input."""
    fields = [f.name for f in assets.schema.fields]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in assets.schema.fields)
    schema += ", resized binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> bytes:
            data = bytes(b)
            px = codecs.decode_image(data)
            h, w = px.shape[:2]
            ys = (np.arange(out_h) * h // out_h).astype(int)
            xs = (np.arange(out_w) * w // out_w).astype(int)
            return codecs.encode_image_like(px[np.ix_(ys, xs)], data)

        for pdf in batches:
            yield pdf[fields].assign(resized=pdf[data_col].map(one))

    return assets.mapInPandas(run, schema=schema)


def image_features(assets: DataFrame, dim: int = 64, data_col: str = "data") -> DataFrame:
    """Feature-extract stub: deterministic embedding of the pixel bytes
    (stands in for a CNN/CLIP encoder; batch shape and schema are what a
    real model would use)."""
    from vectorflow_spark.embed.backends import deterministic_embedding

    fields = [f.name for f in assets.schema.fields]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in assets.schema.fields)
    schema += ", features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                deterministic_embedding(hashlib.sha1(bytes(b)).hexdigest(), dim)
                for b in pdf[data_col]
            ]
            yield pdf[fields].assign(features=pd.Series(feats, index=pdf.index, dtype=object))

    return assets.mapInPandas(run, schema=schema)


def video_frame_sample(assets: DataFrame, every_k: int = 2, data_col: str = "data") -> DataFrame:
    """Frame sampling: explode every k-th frame of a video (FAKE codec or
    real MJPEG AVI) to one image-coded row — the fan-out shape (1 video
    -> n frames) a real ffmpeg-backed sampler would have. Sampled frames
    are emitted as raw-pixel FAKE image blobs (what a decoder hands
    downstream), so every frame kernel composes regardless of the source
    container; other containers (MP4, non-MJPG AVI) refuse loudly."""
    fields = [f.name for f in assets.schema.fields]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in assets.schema.fields)
    schema += ", frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row[data_col])
                # decodes ONLY the sampled frames (AVI: per-chunk JPEG)
                for i, px in codecs.sample_video_frames(data, every_k):
                    h, w, c = px.shape
                    frame = IMG_MAGIC + struct.pack("<HHB", w, h, c) + px.tobytes()
                    rows.append({**{f: row[f] for f in fields}, "frame_idx": i, "frame": frame})
            yield pd.DataFrame(rows, columns=[*fields, "frame_idx", "frame"])

    return assets.mapInPandas(run, schema=schema)


def audio_features(assets: DataFrame, data_col: str = "data") -> DataFrame:
    """Audio feature stub: mean/std/peak over samples (real MFCCs need
    librosa — absent); same single-pass, no-shuffle shape."""
    fields = [f.name for f in assets.schema.fields]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in assets.schema.fields)
    schema += ", mean_amp double, std_amp double, peak_amp double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stats(b: bytes):
            samples, _rate = codecs.decode_audio(bytes(b))
            return float(samples.mean()), float(samples.std()), float(samples.max())

        for pdf in batches:
            s = pdf[data_col].map(stats)
            yield pdf[fields].assign(
                mean_amp=s.map(lambda t: t[0]),
                std_amp=s.map(lambda t: t[1]),
                peak_amp=s.map(lambda t: t[2]),
            )

    return assets.mapInPandas(run, schema=schema)


def video_neardup_pairs(
    assets: DataFrame,
    id_col: str = "asset_id",
    data_col: str = "data",
    every_k: int = 1,
    frame_hamming: int = 6,
    min_frames: int = 3,
) -> DataFrame:
    """Video near-duplicate pairs as a COMPOSITION of the existing
    distributed operators — no new Python kernel: explode frames
    (``video_frame_sample``), dHash each frame (``image_dhash`` — frames
    are image-coded rows), pair frames within ``frame_hamming`` bits via
    the generic Hamming-ball bander, then roll frame pairs up to video
    pairs requiring TEMPORAL ALIGNMENT (same frame index) on at least
    ``min_frames`` sampled frames. A re-encoded/lightly-edited video
    matches frame-for-frame; unrelated videos virtually never align on
    ``min_frames`` distinct indices inside the Hamming ball.

    Frame ids pack (video_id, frame_idx) into one BIGINT (idx < 4096) so
    the bander's id machinery applies unchanged; everything after the
    dHash kernel is engine-side (one band-key shuffle + one (a,b)
    aggregation). Scale: frames-per-video is a small constant (sampling
    stride), so the frame table is O(videos) and every stage inherits
    the bander's posting-list caps."""
    from vectorflow_spark.operators.dedup import hamming_candidate_pairs

    frames = video_frame_sample(assets.select(id_col, data_col), every_k=every_k)
    hashed = image_dhash(frames, data_col="frame")
    # bigint cast BEFORE the multiply (a 32-bit id column would wrap), and
    # the frame_idx < 4096 packing precondition enforced in-plan: FVID
    # allows up to 65535 frames, and a silently-wrapped fid would
    # misattribute frames across videos
    packed = hashed.select(
        (
            F.col(id_col).cast("bigint") * 4096
            + F.expr(
                "CASE WHEN frame_idx >= 4096 THEN "
                "raise_error('video_neardup_pairs: frame_idx >= 4096 breaks "
                "(video, frame) id packing — sample frames with a larger every_k') "
                "ELSE frame_idx END"
            )
        ).alias("fid"),
        "dhash",
    )
    pairs = hamming_candidate_pairs(
        packed, "fid", "dhash", bits=63, n_bands=7, max_hamming=frame_hamming
    )
    aligned = pairs.filter(
        (F.col("a") % 4096 == F.col("b") % 4096)  # same frame position
        & (F.expr("a div 4096") != F.expr("b div 4096"))
    )
    return (
        aligned.groupBy(
            F.expr("a div 4096").alias("video_a"),
            F.expr("b div 4096").alias("video_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_frames_matched"),
            F.max("hamming").alias("max_frame_hamming"),
        )
        .filter(F.col("n_frames_matched") >= min_frames)
    )


def audio_fingerprint(
    assets: DataFrame,
    data_col: str = "data",
    frame: int = 64,
    n_bands: int = 16,
) -> DataFrame:
    """Perceptual audio fingerprint — the Chromaprint/Shazam SHAPE with
    stdlib math: frame the PCM stream (``frame`` samples, half-overlap,
    Hann window), FFT each frame (numpy rfft), fold bins into ``n_bands``
    log-spaced band energies, take the sign of the band-energy DERIVATIVE
    along time per band (robust to gain and mild noise — only energy
    ORDER survives, the same trick dHash plays on pixels), then
    majority-vote the per-frame bit rows into ONE 63-bit clip
    fingerprint. Near-identical clips (re-encodes, light noise) agree on
    most frame bits, so the majority bits move only a few positions —
    feed ``afp`` straight into operators/dedup.hamming_candidate_pairs
    exactly like image dHash and SimHash; the container is irrelevant
    (FAKE or WAV decode to the same samples).

    One Arrow-batched pass, no shuffle; downstream pairing shuffles only
    on band keys. 63 bits = n_bands x the first 63/n_bands derivative
    positions, masked int64-safe like image_dhash."""
    fields = [f.name for f in assets.schema.fields]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in assets.schema.fields)
    schema += ", afp bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
        n_bins = frame // 2 + 1
        # log-spaced band edges over the rfft bins (skip DC); integer
        # collapse can merge low edges, so the effective band count is
        # len(edges)-1 <= n_bands — never an index past the last bin
        edges = np.unique(
            np.clip(
                np.geomspace(1, n_bins - 1, n_bands + 1).astype(int), 1, n_bins - 1
            )
        )
        n_eff = len(edges) - 1

        # enough time-sliced majority groups to genuinely FILL 63 bits:
        # integer edge collapse can leave n_eff < n_bands, and a fixed
        # group count would then leave the top bits always-zero — which
        # silently degenerates the top Hamming bands into corpus-wide
        # mega-buckets downstream
        n_groups = -(-63 // n_eff)

        def one(b: bytes) -> int:
            samples, _rate = codecs.decode_audio(bytes(b))
            hop = frame // 2
            n = (len(samples) - frame) // hop + 1
            if n < 2:
                return 0
            idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
            spec = np.abs(np.fft.rfft(samples[idx] * hann, axis=1)) ** 2
            bands = np.add.reduceat(spec, edges[:-1], axis=1)[:, :n_eff]
            bits = (np.diff(bands, axis=0) > 0)  # (n-1, n_eff)
            slices = [s for s in np.array_split(bits, n_groups, axis=0) if len(s)]
            allbits = np.concatenate([s.mean(axis=0) > 0.5 for s in slices])
            if len(allbits) < 63:  # very short clips: repeat the pattern
                allbits = np.tile(allbits, -(-63 // len(allbits)))
            allbits = allbits[:63]
            v = 0
            for bit in allbits:
                v = (v << 1) | int(bit)
            return v & 0x7FFFFFFFFFFFFFFF

        for pdf in batches:
            yield pdf[fields].assign(afp=pdf[data_col].map(one).astype("int64"))

    return assets.mapInPandas(run, schema=schema)


def synth_assets(docs: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Deterministic fake-asset table from any id column: kind cycles
    image/audio/video by id mod 3. Used by tests and the rows-only driver
    query to exercise the binary pipeline on driver data."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def gen(ids: pd.Series, kinds: pd.Series) -> pd.Series:
        def one(i, k):
            if k == "image":
                return make_fake_image(str(i))
            if k == "audio":
                return make_fake_audio(str(i))
            return make_fake_video(str(i))

        return pd.Series([one(i, k) for i, k in zip(ids, kinds)])

    kind = (
        F.when(F.col("asset_id") % 3 == 0, F.lit("image"))
        .when(F.col("asset_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return (
        docs.select(F.col(doc_col).alias("asset_id"))
        .withColumn("kind", kind)
        .withColumn("data", gen(F.col("asset_id"), F.col("kind")))
    )


def image_dhash(
    assets: DataFrame,
    data_col: str = "data",
    hash_bits: int = 64,
    normalize_orientation: bool = False,
) -> DataFrame:
    """Perceptual difference-hash (dHash) over any decodable image
    container (FAKE, BMP or PNG): resize to 9x8 luma, compare horizontal
    neighbors, pack 64 bits into a BIGINT. The standard near-duplicate-
    image signature — robust to re-encoding and mild resizing because
    only neighbor ORDER survives; identical pixels hash identically
    regardless of container, which is what makes it a cross-format dedup
    key. Pixel work is numpy over Arrow batches. Downstream dedup is
    engine-side: group or Hamming-band the integer exactly like SimHash
    (operators/dedup.simhash_candidate_pairs).

    ``normalize_orientation=True`` applies the EXIF orientation
    transform (operators/exifmini.py) before hashing for the containers
    that carry it (TIFF, JPEG): dHash is NOT invariant under the
    dihedral group, so without this a camera-rotated duplicate hashes
    differently and the pair is missed. Malformed EXIF in a carrier
    container refuses (parse-or-refuse); containers with no EXIF
    concept (BMP/PNG/FAKE) hash as stored."""
    fields = [f.name for f in assets.schema.fields]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in assets.schema.fields)
    schema += ", dhash bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> int:
            px = codecs.decode_image(bytes(b))
            if normalize_orientation and bytes(b[:2]) in (b"II", b"MM", b"\xff\xd8"):
                from vectorflow_spark.operators.exifmini import (
                    apply_exif_orientation,
                    exif_meta,
                )

                px = apply_exif_orientation(px, exif_meta(bytes(b))["orientation"])
            h, w = px.shape[:2]
            luma = px.mean(axis=2)
            ys = (np.arange(8) * h // 8).astype(int)
            xs = (np.arange(9) * w // 9).astype(int)
            small = luma[np.ix_(ys, xs)]
            bits = (small[:, 1:] > small[:, :-1]).flatten()
            v = 0
            for bit in bits:
                v = (v << 1) | int(bit)
            # keep int64-signed-safe: drop to 63 bits (top bit unused)
            return v & 0x7FFFFFFFFFFFFFFF

        for pdf in batches:
            yield pdf[fields].assign(dhash=pdf[data_col].map(one).astype("int64"))

    return assets.mapInPandas(run, schema=schema)
