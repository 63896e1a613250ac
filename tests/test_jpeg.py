"""Baseline JPEG codec (operators/jpegmini.py).

The decoder is pinned to ITU-T T.81 with HAND-CONSTRUCTED streams whose
expected pixels are analytic (a DC-only block IDCTs to a flat value), so
its correctness does not depend on our own encoder; the encoder is then
verified against the decoder with PSNR bounds (JPEG is lossy — bit
equality is never asserted) and feeds the mixed-container dedup corpus.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vectorflow_spark.operators.jpegmini import (
    AC_CHROM,
    AC_LUM,
    DC_CHROM,
    DC_LUM,
    _BitWriter,
    _encode_codes,
    decode_jpeg,
    encode_jpeg,
    jpeg_meta,
)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_ones(tq: int = 0) -> bytes:
    return _seg(0xDB, bytes([tq]) + b"\x01" * 64)


def _dht(tc: int, th: int, table) -> bytes:
    bits, vals = table
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _write_dc_only(writer: _BitWriter, diff: int, dc_codes, ac_codes) -> None:
    s = int(abs(diff)).bit_length()
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    code, length = ac_codes[0x00]  # EOB
    writer.write(code, length)


class TestSpecDecode:
    """Streams built bit-by-bit from the spec; expected pixels analytic."""

    def test_single_mcu_flat_gray(self):
        """One 8x8 grayscale block, quant all-ones, DC=64, no AC: the
        2-D IDCT of a lone DC coefficient c is c/8 everywhere, so every
        pixel is 128 + 64/8 = 136. The entropy bytes are written by hand
        from the Annex K canonical codes (cat-7 DC '11110' + 7 magnitude
        bits + AC EOB '1010' = 0xF4 0x0A)."""
        sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        sos = _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
        blob = (
            b"\xff\xd8"
            + _dqt_ones()
            + sof
            + _dht(0, 0, DC_LUM)
            + _dht(1, 0, AC_LUM)
            + sos
            + bytes([0xF4, 0x0A])
            + b"\xff\xd9"
        )
        px = decode_jpeg(blob)
        assert px.shape == (8, 8, 3)
        assert np.all(px == 136)
        assert jpeg_meta(blob) == (8, 8, 1)

    def test_restart_markers_reset_dc_prediction(self):
        """8x16 grayscale, DRI=1: MCU2 sits after an RST0 marker in its
        own entropy segment, so its DC diff decodes against a RESET
        predictor (absolute), not MCU1's. Left half 128+64/8=136, right
        half 128-64/8=120."""
        dc_codes = _encode_codes(*DC_LUM)
        ac_codes = _encode_codes(*AC_LUM)
        w1 = _BitWriter()
        _write_dc_only(w1, 64, dc_codes, ac_codes)
        w2 = _BitWriter()
        _write_dc_only(w2, -64, dc_codes, ac_codes)
        sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        sos = _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
        blob = (
            b"\xff\xd8"
            + _dqt_ones()
            + sof
            + _dht(0, 0, DC_LUM)
            + _dht(1, 0, AC_LUM)
            + _seg(0xDD, struct.pack(">H", 1))  # DRI: restart every MCU
            + sos
            + w1.flush()
            + b"\xff\xd0"  # RST0
            + w2.flush()
            + b"\xff\xd9"
        )
        px = decode_jpeg(blob)
        assert px.shape == (8, 16, 3)
        assert np.all(px[:, :8] == 136)
        assert np.all(px[:, 8:] == 120)

    def test_420_subsampled_color(self):
        """16x16 4:2:0 (Y 2x2, Cb/Cr 1x1), one MCU of six DC-only
        blocks. Flat Y=136, Cb=128+4, Cr=128-4: expected RGB is the
        analytic JFIF conversion of those constants, chroma upsampled
        2x2."""
        dc_l, ac_l = _encode_codes(*DC_LUM), _encode_codes(*AC_LUM)
        dc_c, ac_c = _encode_codes(*DC_CHROM), _encode_codes(*AC_CHROM)
        w = _BitWriter()
        _write_dc_only(w, 64, dc_l, ac_l)  # Y block 1: DC 64 -> 136
        for _ in range(3):  # Y blocks 2-4: diff 0 -> same 136
            _write_dc_only(w, 0, dc_l, ac_l)
        _write_dc_only(w, 32, dc_c, ac_c)  # Cb: 128 + 32/8 = 132
        _write_dc_only(w, -32, dc_c, ac_c)  # Cr: 128 - 32/8 = 124
        sof = _seg(
            0xC0,
            struct.pack(">BHHB", 8, 16, 16, 3)
            + bytes([1, 0x22, 0])  # Y 2x2, quant 0
            + bytes([2, 0x11, 1])  # Cb 1x1, quant 1
            + bytes([3, 0x11, 1]),  # Cr 1x1, quant 1
        )
        sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
        blob = (
            b"\xff\xd8"
            + _dqt_ones(0)
            + _dqt_ones(1)
            + sof
            + _dht(0, 0, DC_LUM)
            + _dht(1, 0, AC_LUM)
            + _dht(0, 1, DC_CHROM)
            + _dht(1, 1, AC_CHROM)
            + sos
            + w.flush()
            + b"\xff\xd9"
        )
        px = decode_jpeg(blob)
        assert px.shape == (16, 16, 3)
        y, cb, cr = 136.0, 132.0 - 128.0, 124.0 - 128.0
        exp = np.clip(
            np.rint(
                [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb]
            ),
            0,
            255,
        ).astype(np.uint8)
        assert np.all(px == exp[None, None, :])
        assert jpeg_meta(blob) == (16, 16, 3)

    def test_422_subsampled_color(self):
        """16x8 4:2:2 (Y 2x1, Cb/Cr 1x1): horizontal-only chroma
        upsampling — one MCU of four DC-only blocks (2 Y + Cb + Cr)."""
        dc_l, ac_l = _encode_codes(*DC_LUM), _encode_codes(*AC_LUM)
        dc_c, ac_c = _encode_codes(*DC_CHROM), _encode_codes(*AC_CHROM)
        w = _BitWriter()
        _write_dc_only(w, 64, dc_l, ac_l)  # Y block 1 -> 136
        _write_dc_only(w, 0, dc_l, ac_l)  # Y block 2, diff 0
        _write_dc_only(w, 32, dc_c, ac_c)  # Cb 132
        _write_dc_only(w, -32, dc_c, ac_c)  # Cr 124
        sof = _seg(
            0xC0,
            struct.pack(">BHHB", 8, 8, 16, 3)
            + bytes([1, 0x21, 0])  # Y 2x1
            + bytes([2, 0x11, 1])
            + bytes([3, 0x11, 1]),
        )
        sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
        blob = (
            b"\xff\xd8"
            + _dqt_ones(0)
            + _dqt_ones(1)
            + sof
            + _dht(0, 0, DC_LUM)
            + _dht(1, 0, AC_LUM)
            + _dht(0, 1, DC_CHROM)
            + _dht(1, 1, AC_CHROM)
            + sos
            + w.flush()
            + b"\xff\xd9"
        )
        px = decode_jpeg(blob)
        assert px.shape == (8, 16, 3)
        y, cb, cr = 136.0, 4.0, -4.0
        exp = np.clip(
            np.rint(
                [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb]
            ),
            0,
            255,
        ).astype(np.uint8)
        assert np.all(px == exp[None, None, :])

    def test_unsupported_sof_variants_refused(self):
        """SOF9/SOF10 (arithmetic DCT) decode as of r8 (operators/
        jpegarith.py, tests/test_jpeg_arith.py); the lossless/differential
        frame types stay refuse-loudly."""
        for sof in (0xC3, 0xCB):  # lossless Huffman / lossless arithmetic
            seg = _seg(sof, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
            blob = b"\xff\xd8" + _dqt_ones() + seg
            with pytest.raises(NotImplementedError, match="SOF"):
                decode_jpeg(blob + b"\xff\xd9")
            with pytest.raises(NotImplementedError, match="SOF"):
                jpeg_meta(blob + b"\xff\xd9")

    def test_progressive_hand_built_successive_approximation(self):
        """SOF2 pinned to T.81 Annex G independently of our encoder: a
        hand-written 4-scan stream (DC first Al=1, AC first Al=1, DC
        refinement, AC refinement with a correction bit behind an EOB
        run) must reconstruct DC=33, coef[zigzag 1]=3 exactly —
        expected pixels computed from the analytic IDCT:
        p(x, y) = 128 + 33/8 + (3 / (4*sqrt(2))) * cos((2y+1)*pi/16)."""
        import math

        from vectorflow_spark.operators.jpegmini import AC_PROG

        dc_codes = _encode_codes(*DC_LUM)
        ac_codes = _encode_codes(*AC_PROG)

        def bitsw() -> _BitWriter:
            return _BitWriter()

        # scan 1 — DC first, Al=1: codes 33>>1 = 16 (cat 5, bits 10000)
        w1 = bitsw()
        code, length = dc_codes[5]
        w1.write(code, length)
        w1.write(16, 5)
        # scan 2 — AC first (Ss=1, Se=63, Al=1): coef 3>>1 = +1 at k=1
        # (symbol run=0/size=1, sign bit 1), then EOB (r=0)
        w2 = bitsw()
        code, length = ac_codes[0x01]
        w2.write(code, length)
        w2.write(1, 1)  # +1 -> stored 1<<1 = 2
        code, length = ac_codes[0x00]
        w2.write(code, length)
        # scan 3 — DC refinement (Ah=1, Al=0): appended bit = 33 & 1
        w3 = bitsw()
        w3.write(1, 1)
        # scan 4 — AC refinement (Ah=1, Al=0): EOB run of 1 whose pending
        # correction bit (3 & 1 = 1) lifts coef 2 -> 3
        w4 = bitsw()
        code, length = ac_codes[0x00]
        w4.write(code, length)
        w4.write(1, 1)

        def sos(ss: int, se: int, ah: int, al: int) -> bytes:
            return _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

        sof2 = _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        blob = (
            b"\xff\xd8"
            + _dqt_ones()
            + sof2
            + _dht(0, 0, DC_LUM)
            + _dht(1, 0, AC_PROG)
            + sos(0, 0, 0, 1)
            + w1.flush()
            + sos(1, 63, 0, 1)
            + w2.flush()
            + sos(0, 0, 1, 0)
            + w3.flush()
            + sos(1, 63, 1, 0)
            + w4.flush()
            + b"\xff\xd9"
        )
        assert jpeg_meta(blob) == (8, 8, 1)
        px = decode_jpeg(blob)
        assert px.shape == (8, 8, 3)
        exp = np.empty((8, 8))
        for y in range(8):
            exp[:, y] = 128.0 + 33.0 / 8.0 + 3.0 / (4.0 * math.sqrt(2)) * math.cos(
                (2 * y + 1) * math.pi / 16
            )
        exp8 = np.clip(np.rint(exp), 0, 255).astype(np.uint8)
        assert np.array_equal(px[:, :, 0], exp8)
        assert np.array_equal(px[:, :, 1], exp8) and np.array_equal(px[:, :, 2], exp8)

    def test_progressive_420_subsampled_hand_built(self):
        """SOF2 with 4:2:0 sampling: the interleaved DC scan walks the
        2x2+1+1 MCU structure while each AC scan iterates its
        component's OWN block grid (comp_w = ceil(w*h_i/hmax), NOT the
        MCU-padded grid) — the non-interleaved geometry only subsampled
        frames exercise. Flat DC-only blocks make the expected RGB
        analytic, identical to the baseline 4:2:0 test's constants."""
        from vectorflow_spark.operators.jpegmini import AC_PROG

        dc_l = _encode_codes(*DC_LUM)
        dc_c = _encode_codes(*DC_CHROM)
        ac_codes = _encode_codes(*AC_PROG)

        def dc(writer, diff, codes):
            s = int(abs(diff)).bit_length()
            code, length = codes[s]
            writer.write(code, length)
            if s:
                writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)

        # scan 1 — interleaved DC, Ah=Al=0: one MCU = 4 Y + 1 Cb + 1 Cr
        w1 = _BitWriter()
        dc(w1, 64, dc_l)  # Y1 -> 136
        for _ in range(3):
            dc(w1, 0, dc_l)  # Y2-4 same
        dc(w1, 32, dc_c)  # Cb 132
        dc(w1, -32, dc_c)  # Cr 124
        # scans 2-4 — per-component AC (1,63,0,0), all zero: one EOBn
        # covering that component's whole block grid (Y: 4 blocks -> EOB2
        # run; Cb/Cr: 1 block -> plain EOB)
        wy = _BitWriter()
        code, length = ac_codes[0x20]  # EOB2: run = 4 blocks
        wy.write(code, length)
        wy.write(0, 2)  # extension bits: 4 = (1<<2) + 0
        wc1, wc2 = _BitWriter(), _BitWriter()
        for wc in (wc1, wc2):
            code, length = ac_codes[0x00]
            wc.write(code, length)

        sof2 = _seg(
            0xC2,
            struct.pack(">BHHB", 8, 16, 16, 3)
            + bytes([1, 0x22, 0])
            + bytes([2, 0x11, 1])
            + bytes([3, 0x11, 1]),
        )

        def sos(cid_tbl, ss, se, ahal):
            return _seg(0xDA, bytes([len(cid_tbl) // 2, *cid_tbl, ss, se, ahal]))

        blob = (
            b"\xff\xd8"
            + _dqt_ones(0)
            + _dqt_ones(1)
            + sof2
            + _dht(0, 0, DC_LUM)
            + _dht(0, 1, DC_CHROM)
            + _dht(1, 0, AC_PROG)
            + sos([1, 0x00, 2, 0x10, 3, 0x10], 0, 0, 0)
            + w1.flush()
            + sos([1, 0x00], 1, 63, 0)
            + wy.flush()
            + sos([2, 0x00], 1, 63, 0)
            + wc1.flush()
            + sos([3, 0x00], 1, 63, 0)
            + wc2.flush()
            + b"\xff\xd9"
        )
        px = decode_jpeg(blob)
        assert px.shape == (16, 16, 3)
        y, cb, cr = 136.0, 4.0, -4.0
        exp = np.clip(
            np.rint(
                [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb]
            ),
            0,
            255,
        ).astype(np.uint8)
        assert np.all(px == exp[None, None, :])
        assert jpeg_meta(blob) == (16, 16, 3)

    def test_garbage_refused(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG not a jpeg")
        with pytest.raises(ValueError):
            decode_jpeg(b"\xff\xd8\xff\xe0no real segments here")

    def test_truncated_entropy_is_value_error(self):
        """The parse-or-refuse contract: cut entropy bytes must surface
        as ValueError, never a raw IndexError from the bit reader."""
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        blob = encode_jpeg(img, quality=90)
        cut = blob[: blob.rindex(b"\xff\xd9") - 2]  # drop tail entropy + EOI
        with pytest.raises(ValueError, match="truncated entropy"):
            decode_jpeg(cut)

    def test_fill_bytes_before_rst_and_eoi_are_skipped(self):
        """T.81 B.1.1.2: runs of 0xFF FILL bytes may precede any marker
        (RSTn, EOI) in the entropy stream; _destuff must consume them
        instead of truncating the scan, and FF FF 00 must still decode
        as a stuffed data 0xFF."""
        from vectorflow_spark.operators.jpegmini import _destuff

        scan = b"\x12\xff\xff\x00\x34\xff\xff\xff\xd0\x56\xff\xff\xd9trailer"
        assert _destuff(scan) == [b"\x12\xff\x34", b"\x56"]
        # fill bytes at end-of-buffer (no terminating marker byte at all)
        assert _destuff(b"\x12\xff\xff") == [b"\x12"]

    def test_undefined_huffman_table_is_value_error(self):
        """SOS referencing a DHT id that was never defined: ValueError,
        not KeyError."""
        sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        sos = _seg(0xDA, bytes([1, 1, 0x33]) + b"\x00\x3f\x00")  # tables 3/3 undefined
        blob = (
            b"\xff\xd8" + _dqt_ones() + sof
            + _dht(0, 0, DC_LUM) + _dht(1, 0, AC_LUM)
            + sos + bytes([0xF4, 0x0A]) + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="Huffman table"):
            decode_jpeg(blob)


class TestProgressiveRoundtrip:
    """encode_jpeg_progressive transmits the same quantized coefficients
    as encode_jpeg, so decoding both must be BIT-IDENTICAL — this pins
    spectral selection, successive approximation, EOB runs, refinement
    and correction-bit buffering in one equality."""

    @pytest.mark.parametrize("successive", [False, True])
    @pytest.mark.parametrize("shape", [(8, 8, 3), (17, 31, 3), (40, 56, 3), (12, 12, 1)])
    def test_bit_identical_to_baseline(self, shape, successive):
        from vectorflow_spark.operators.jpegmini import encode_jpeg_progressive

        rng = np.random.default_rng(int(np.prod(shape)))
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        for quality in (50, 90, 100):
            base = decode_jpeg(encode_jpeg(px, quality=quality))
            prog = decode_jpeg(
                encode_jpeg_progressive(px, quality=quality, successive=successive)
            )
            assert np.array_equal(prog, base)

    def test_meta_and_frame_type(self):
        from vectorflow_spark.operators.jpegmini import encode_jpeg_progressive

        px = np.zeros((10, 20, 3), dtype=np.uint8)
        blob = encode_jpeg_progressive(px)
        assert blob[:3] == b"\xff\xd8\xff"
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob.split(b"\xff\xda")[0][8:]
        assert jpeg_meta(blob) == (20, 10, 3)

    def test_eob_run_aggregation_across_blocks(self):
        """A mostly-flat image makes long EOB runs across many blocks
        (the EOBn path with extension bits on both encode and decode)."""
        from vectorflow_spark.operators.jpegmini import encode_jpeg_progressive

        px = np.full((64, 64, 3), 77, dtype=np.uint8)
        px[30, 30] = (200, 10, 90)  # one impulse so not every block is empty
        for successive in (False, True):
            base = decode_jpeg(encode_jpeg(px, quality=85))
            prog = decode_jpeg(encode_jpeg_progressive(px, quality=85, successive=successive))
            assert np.array_equal(prog, base)


class TestRoundtrip:
    def _psnr(self, a: np.ndarray, b: np.ndarray) -> float:
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)

    @pytest.mark.parametrize("shape", [(8, 8), (24, 33), (17, 9), (64, 48)])
    def test_smooth_color_high_quality(self, shape):
        h, w = shape
        x = np.linspace(0, 255, w)[None, :].repeat(h, 0)
        y = np.linspace(0, 255, h)[:, None].repeat(w, 1)
        img = np.stack([x, y, (x + y) / 2], axis=2).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (h, w, 3)
        assert self._psnr(img, out) > 40

    def test_noise_survives_reasonably(self):
        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert self._psnr(img, out) > 30

    def test_grayscale_input_broadcasts(self):
        g = np.linspace(0, 255, 16 * 16).reshape(16, 16).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=95))
        assert out.shape == (16, 16, 3)
        assert np.all(out[:, :, 0] == out[:, :, 1])

    def test_lower_quality_smaller_file(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        hi = encode_jpeg(img, quality=95)
        lo = encode_jpeg(img, quality=20)
        assert len(lo) < len(hi)
        decode_jpeg(lo)  # low quality still decodes

    def test_fuzz_roundtrip_property(self):
        """Hypothesis: arbitrary sizes/contents/qualities decode without
        error to the right shape; for images with a full 8x8 block the
        reconstruction stays above an 18 dB PSNR floor at quality >= 70.
        Sub-block images are asserted structurally only — with 4 real
        pixels padded to 64, chroma quantization error concentrates and
        pure-noise PSNR can legitimately fall to ~16 dB."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @given(
            h=st.integers(1, 40),
            w=st.integers(1, 40),
            quality=st.integers(70, 100),
            seed=st.integers(0, 2**31 - 1),
            gray=st.booleans(),
        )
        @settings(max_examples=40, deadline=None)
        def inner(h, w, quality, seed, gray):
            rng = np.random.default_rng(seed)
            shape = (h, w) if gray else (h, w, 3)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(img, quality=quality))
            assert out.shape == (h, w, 3)
            ref = img if not gray else np.repeat(img[:, :, None], 3, axis=2)
            if h >= 8 and w >= 8:
                assert self._psnr(ref, out) > 18

        inner()

    def test_meta_matches_decode(self):
        img = np.zeros((20, 30, 3), dtype=np.uint8)
        blob = encode_jpeg(img)
        assert jpeg_meta(blob) == (30, 20, 3)
        assert decode_jpeg(blob).shape == (20, 30, 3)


class TestDispatch:
    """codecs/multimodal integration: JPEG flows through the same unified
    entry points as FAKE/BMP/PNG."""

    def test_decode_image_and_meta(self):
        from vectorflow_spark.operators.codecs import decode_image
        from vectorflow_spark.operators.multimodal import decode_meta

        img = np.full((12, 16, 3), 77, dtype=np.uint8)
        blob = encode_jpeg(img, quality=100)
        assert decode_image(blob).shape == (12, 16, 3)
        m = decode_meta(blob)
        assert (m["kind"], m["width"], m["height"]) == ("image", 16, 12)

    def test_encode_image_like_jpeg_container(self):
        from vectorflow_spark.operators.codecs import decode_image, encode_image_like

        img = np.full((8, 8, 3), 50, dtype=np.uint8)
        blob = encode_jpeg(img)
        re = encode_image_like(decode_image(blob), blob)
        assert re[:3] == b"\xff\xd8\xff"
        assert decode_image(re).shape == (8, 8, 3)

    def test_dhash_stable_under_q100_reencode(self):
        """The near-dup corpus contract: a q100 re-encode moves dHash at
        most a few bits (within the hamming<=6 band the pair query uses)."""
        from vectorflow_spark.operators.codecs import decode_image
        from vectorflow_spark.operators.multimodal import make_fake_image

        def dhash(px):
            h, w = px.shape[:2]
            luma = px.mean(axis=2)
            ys = (np.arange(8) * h // 8).astype(int)
            xs = (np.arange(9) * w // 9).astype(int)
            small = luma[np.ix_(ys, xs)]
            v = 0
            for bit in (small[:, 1:] > small[:, :-1]).flatten():
                v = (v << 1) | int(bit)
            return v & 0x7FFFFFFFFFFFFFFF

        for i in range(30):
            px = decode_image(make_fake_image(str(i)))
            tw = decode_jpeg(encode_jpeg(px, quality=100))
            assert bin(dhash(px) ^ dhash(tw)).count("1") <= 6


class TestOptimizedHuffman:
    """Two-pass optimized entropy coding (encode_jpeg(optimize=True),
    T.81 Annex K.2): the quantized coefficients are untouched, so the
    decode must be BIT-IDENTICAL to the standard-table encode — only the
    entropy layer and the (now symbol-pruned) DHT segments differ."""

    def test_table_builder_hand_example(self):
        """Two equal-frequency symbols + the reserved 256: symbol 0 gets
        the 1-bit code, symbol 1 the 2-bit one (256 absorbed the all-1s
        slot at max depth and is then dropped)."""
        from vectorflow_spark.operators.jpegmini import optimal_huffman_table

        bits, vals = optimal_huffman_table({0: 1, 1: 1})
        assert bits == [1, 1] + [0] * 14
        assert vals == [0, 1]

    def test_table_builder_skewed_freqs(self):
        """A strongly skewed distribution: the hot symbol must get the
        shortest code, Kraft strictly < 1 (the reserved all-ones leaf
        stays unassigned), all lengths <= 16, values unique."""
        from vectorflow_spark.operators.jpegmini import optimal_huffman_table

        counts = {s: 1 << max(0, 20 - s) for s in range(40)}
        bits, vals = optimal_huffman_table(counts)
        assert sum(bits) == len(vals) == 40
        assert len(set(vals)) == 40
        assert vals[0] == 0  # most frequent symbol owns the shortest code
        kraft = sum(n / (1 << (ln + 1)) for ln, n in enumerate(bits))
        assert kraft < 1.0

    def test_length_limit_sixteen(self):
        """257 near-equal tiny frequencies would want depth ~9; a
        fibonacci-ish blowup wants depth > 16 — ADJUST_BITS must cap it."""
        from vectorflow_spark.operators.jpegmini import optimal_huffman_table

        a, b, counts = 1, 1, {}
        for s in range(30):
            counts[s] = a
            a, b = b, a + b
        bits, vals = optimal_huffman_table(counts)
        assert sum(bits) == len(vals) == 30
        assert all(b >= 0 for b in bits)
        kraft = sum(n / (1 << (ln + 1)) for ln, n in enumerate(bits))
        assert kraft <= 1.0

    def test_empty_counts_empty_table(self):
        from vectorflow_spark.operators.jpegmini import optimal_huffman_table

        assert optimal_huffman_table({}) == ([0] * 16, [])

    @pytest.mark.parametrize("quality", [50, 85, 100])
    def test_decode_bit_identical_to_standard_tables(self, quality):
        from vectorflow_spark.operators.codecs import decode_image
        from vectorflow_spark.operators.multimodal import make_fake_image

        for i in range(6):
            px = decode_image(make_fake_image(str(i)))
            std = encode_jpeg(px, quality=quality)
            opt = encode_jpeg(px, quality=quality, optimize=True)
            assert np.array_equal(decode_jpeg(std), decode_jpeg(opt))

    def test_optimized_is_smaller(self):
        """On realistic content the measured-frequency tables beat the
        Annex K defaults — both in entropy bytes and in DHT size."""
        from vectorflow_spark.operators.codecs import decode_image
        from vectorflow_spark.operators.multimodal import make_fake_image

        total_std = total_opt = 0
        for i in range(8):
            px = decode_image(make_fake_image(str(i)))
            total_std += len(encode_jpeg(px, quality=85))
            total_opt += len(encode_jpeg(px, quality=85, optimize=True))
        assert total_opt < total_std

    def test_noise_and_edge_shapes(self):
        """Pure noise (dense AC symbols), grayscale, and a flat image
        (degenerate 1-symbol tables) all roundtrip identically."""
        rng = np.random.default_rng(9)
        cases = [
            rng.integers(0, 256, (64, 48, 3), dtype=np.uint8),
            rng.integers(0, 256, (17, 23), dtype=np.uint8),
            np.full((8, 8, 3), 128, dtype=np.uint8),
            np.full((3, 5), 0, dtype=np.uint8),
        ]
        for px in cases:
            std = encode_jpeg(px, quality=100)
            opt = encode_jpeg(px, quality=100, optimize=True)
            assert np.array_equal(decode_jpeg(std), decode_jpeg(opt))

    def test_counting_pass_matches_emission(self):
        """The optimize pass tallies through the REAL _encode_block, so
        every symbol pass 2 emits is in the tables — a foreign decoder
        contract check: our own strict decoder raises on any undefined
        code, so a successful decode proves full coverage."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @given(seed=st.integers(0, 2**31 - 1), q=st.integers(30, 100))
        @settings(max_examples=15, deadline=None)
        def inner(seed, q):
            rng = np.random.default_rng(seed)
            px = rng.integers(0, 256, (rng.integers(1, 33), rng.integers(1, 33), 3), dtype=np.uint8)
            assert np.array_equal(
                decode_jpeg(encode_jpeg(px, quality=q, optimize=True)),
                decode_jpeg(encode_jpeg(px, quality=q)),
            )

        inner()


class TestOptimizedProgressive:
    """encode_jpeg_progressive(optimize=True): measured-frequency tables
    (mozjpeg's default mode) replace the static all-symbol AC table —
    decode must stay bit-identical to both the static-table progressive
    encode and the baseline encode; files shrink ~2x."""

    @pytest.mark.parametrize("successive", [False, True])
    @pytest.mark.parametrize("quality", [60, 100])
    def test_decode_bit_identical(self, successive, quality):
        from vectorflow_spark.operators.codecs import decode_image
        from vectorflow_spark.operators.jpegmini import encode_jpeg_progressive
        from vectorflow_spark.operators.multimodal import make_fake_image

        for i in range(4):
            px = decode_image(make_fake_image(str(i), width=24, height=20))
            opt = encode_jpeg_progressive(
                px, quality, successive=successive, optimize=True
            )
            assert np.array_equal(
                decode_jpeg(opt), decode_jpeg(encode_jpeg(px, quality))
            )

    def test_optimized_is_smaller(self):
        from vectorflow_spark.operators.codecs import decode_image
        from vectorflow_spark.operators.jpegmini import encode_jpeg_progressive
        from vectorflow_spark.operators.multimodal import make_fake_image

        ts = to = 0
        for i in range(6):
            px = decode_image(make_fake_image(str(i), width=24, height=20))
            ts += len(encode_jpeg_progressive(px, 85))
            to += len(encode_jpeg_progressive(px, 85, optimize=True))
        assert to < ts * 0.75

    def test_degenerate_images(self):
        from vectorflow_spark.operators.jpegmini import encode_jpeg_progressive

        flat = np.full((8, 8, 3), 128, dtype=np.uint8)
        gray = np.arange(63, dtype=np.uint8).reshape(9, 7)
        for px in (flat, gray):
            assert np.array_equal(
                decode_jpeg(encode_jpeg_progressive(px, optimize=True)),
                decode_jpeg(encode_jpeg_progressive(px)),
            )


class TestRestartIntervalEncoding:
    """encode_jpeg(restart_interval=N): DRI + RSTn every N MCUs with
    per-segment predictor resets — roundtrip-pins the decoder's restart
    path (previously covered only by hand-built streams), composing
    with optimize=True."""

    @pytest.mark.parametrize("ri", [1, 3, 7])
    @pytest.mark.parametrize("optimize", [False, True])
    def test_decode_matches_unrestarted(self, ri, optimize):
        rng = np.random.default_rng(ri)
        px = rng.integers(0, 256, (24, 33, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(px, 90))
        blob = encode_jpeg(px, 90, optimize=optimize, restart_interval=ri)
        assert b"\xff\xdd" in blob
        assert np.array_equal(decode_jpeg(blob), base)

    def test_marker_cycle_wraps_past_eight(self):
        """> 8 segments: RSTn must cycle m%8 and the decoder must follow."""
        rng = np.random.default_rng(1)
        px = rng.integers(0, 256, (8, 96, 3), dtype=np.uint8)  # 12 MCUs
        blob = encode_jpeg(px, 90, restart_interval=1)  # 11 RST markers
        assert blob.count(b"\xff\xd0") >= 2  # RST0 reused after wrap
        assert np.array_equal(decode_jpeg(blob), decode_jpeg(encode_jpeg(px, 90)))


class TestParseStreamHardening:
    def test_header_truncation_always_valueerror(self):
        """Cuts landing inside MARKER SEGMENT headers (not entropy data)
        must surface as ValueError, never struct.error/IndexError (found
        by the q_jpeg_arith_roundtrip truncation sweep at doc_id=18)."""
        from vectorflow_spark.operators.jpegmini import encode_jpeg

        blob = encode_jpeg(np.full((16, 24, 3), 77, np.uint8), quality=60)
        for cut in range(2, len(blob), 5):
            try:
                decode_jpeg(blob[:cut])
            except ValueError:
                pass  # the ONLY acceptable refusal type
