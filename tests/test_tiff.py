"""Baseline TIFF codec (operators/tiffmini.py): roundtrips across the
compression/predictor/strip/byte-order matrix, hand-built fixtures
pinning PackBits and the IFD walk independently of the encoder, the
TIFF-LZW early-change boundary, refusal contracts, and the unified
dispatch integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vectorflow_spark.operators.tiffmini import (
    _lzw_decode,
    _lzw_encode,
    _packbits,
    _unpackbits,
    decode_tiff,
    encode_tiff,
    tiff_meta,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


class TestPackBits:
    def test_spec_example(self):
        """The TIFF 6.0 PackBits worked example (spec section 9)."""
        src = bytes(
            [0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA, 0xAA,
             0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA,
             0xAA, 0xAA, 0xAA, 0xAA]
        )
        packed = bytes(
            [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80,
             0x00, 0x2A, 0x22, 0xF7, 0xAA]
        )
        assert _unpackbits(packed, len(src)) == src
        # our writer may pack differently, but must roundtrip
        assert _unpackbits(_packbits(src), len(src)) == src

    def test_long_runs_and_literals(self):
        src = b"\x01" * 300 + bytes(range(200)) + b"\x02" * 3
        assert _unpackbits(_packbits(src), len(src)) == src

    def test_noop_128_skipped(self):
        assert _unpackbits(b"\x80\x00A", 1) == b"A"


class TestLZW:
    def test_roundtrip_across_size_boundaries(self):
        rng = _rng(1)
        for n in (10, 300, 2000, 20000, 60000):  # crosses 9->10->11->12 + clear
            src = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            assert _lzw_decode(_lzw_encode(src), n) == src

    def test_compressible_input(self):
        src = (b"TOBEORNOTTOBEORTOBEORNOT" * 500)
        enc = _lzw_encode(src)
        assert len(enc) < len(src) // 2
        assert _lzw_decode(enc, len(src)) == src

    def test_starts_with_clear_code(self):
        enc = _lzw_encode(b"A")
        # first 9 bits MSB-first must be 256 (ClearCode): 100000000
        assert enc[0] == 0x80 and (enc[1] & 0x80) == 0


class TestHandBuiltFixture:
    def _tiny_tiff_le(self) -> bytes:
        """2x2 gray, uncompressed, single strip, little-endian — written
        field by field so the IFD walk is pinned independently."""
        px = bytes([10, 20, 30, 40])
        # header + 8 entries + next-IFD + data
        n = 8
        ifd = struct.pack("<H", n)
        data_off = 8 + 2 + 12 * n + 4

        def e(tag, typ, count, val):
            return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", val)

        ifd += e(256, 3, 1, 2)  # width (SHORT inline)
        ifd += e(257, 4, 1, 2)  # length (LONG, also legal)
        ifd += e(258, 3, 1, 8)
        ifd += e(259, 3, 1, 1)
        ifd += e(262, 3, 1, 1)
        ifd += e(273, 4, 1, data_off)
        ifd += e(277, 3, 1, 1)
        ifd += e(279, 4, 1, 4)
        ifd += struct.pack("<I", 0)
        return b"II*\x00" + struct.pack("<I", 8) + ifd + px

    def test_hand_built_decodes(self):
        out = decode_tiff(self._tiny_tiff_le())
        assert out.shape == (2, 2, 3)
        assert out[0, 0, 0] == 10 and out[1, 1, 2] == 40

    def test_white_is_zero_inverts(self):
        blob = bytearray(self._tiny_tiff_le())
        # photometric entry is the 5th (tag 262): flip its value to 0
        off = 8 + 2 + 12 * 4 + 8
        struct.pack_into("<I", blob, off, 0)
        out = decode_tiff(bytes(blob))
        assert out[0, 0, 0] == 245  # 255 - 10


class TestRoundtrip:
    @pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
    @pytest.mark.parametrize("big_endian", [False, True])
    def test_rgb_all_compressions(self, compression, big_endian):
        px = _rng(2).integers(0, 256, (19, 23, 3), dtype=np.uint8)
        blob = encode_tiff(px, compression=compression, big_endian=big_endian)
        assert np.array_equal(decode_tiff(blob), px)
        assert tiff_meta(blob) == (23, 19, 3)

    @pytest.mark.parametrize("compression", ["packbits", "lzw"])
    def test_predictor_and_multistrip(self, compression):
        px = _rng(3).integers(0, 256, (31, 14, 3), dtype=np.uint8)
        blob = encode_tiff(px, compression=compression, predictor=True, rows_per_strip=7)
        assert np.array_equal(decode_tiff(blob), px)

    def test_gray_broadcasts(self):
        g = _rng(4).integers(0, 256, (9, 11), dtype=np.uint8)
        out = decode_tiff(encode_tiff(g, compression="lzw", predictor=True))
        assert out.shape == (9, 11, 3)
        assert np.array_equal(out[:, :, 0], g) and np.array_equal(out[:, :, 1], g)

    def test_table_filling_image(self):
        """Noise big enough to cross every LZW width and force a table
        clear inside one strip."""
        px = _rng(5).integers(0, 256, (150, 160, 3), dtype=np.uint8)
        blob = encode_tiff(px, compression="lzw")
        assert np.array_equal(decode_tiff(blob), px)

    def test_fuzz_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**31 - 1),
               comp=st.sampled_from(["none", "packbits", "lzw"]),
               pred=st.booleans(), be=st.booleans(), rps=st.integers(1, 25))
        @settings(max_examples=30, deadline=None)
        def inner(h, w, seed, comp, pred, be, rps):
            if pred and comp == "none":
                return
            px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
            blob = encode_tiff(px, compression=comp, predictor=pred,
                               rows_per_strip=rps, big_endian=be)
            assert np.array_equal(decode_tiff(blob), px)

        inner()


class TestRefusals:
    def test_not_tiff(self):
        with pytest.raises(ValueError, match="magic"):
            decode_tiff(b"XX*\x00" + b"\x00" * 20)

    def test_tiled_refused(self):
        blob = bytearray(encode_tiff(np.zeros((4, 4, 3), np.uint8)))
        # graft a TileWidth (322) tag id over the first entry's tag
        struct.pack_into("<H", blob, 10, 322)
        with pytest.raises(ValueError, match="tile"):
            decode_tiff(bytes(blob))

    def test_sixteen_bit_refused(self):
        blob = bytearray(encode_tiff(np.zeros((4, 4), np.uint8)))
        # BitsPerSample is entry tag 258: find and rewrite its value to 16
        n = struct.unpack_from("<H", blob, 8)[0]
        for k in range(n):
            e = 10 + 12 * k
            if struct.unpack_from("<H", blob, e)[0] == 258:
                struct.pack_into("<I", blob, e + 8, 16)
        with pytest.raises(ValueError, match="bits"):
            decode_tiff(bytes(blob))

    def test_truncated_strip(self):
        blob = encode_tiff(_rng().integers(0, 256, (8, 8, 3), np.uint8), compression="lzw")
        with pytest.raises(ValueError):
            decode_tiff(blob[:-20])


class TestDispatch:
    def test_decode_image_and_meta(self):
        from vectorflow_spark.operators.codecs import decode_image
        from vectorflow_spark.operators.multimodal import decode_meta

        px = _rng(6).integers(0, 256, (10, 14, 3), dtype=np.uint8)
        blob = encode_tiff(px, compression="lzw", predictor=True, big_endian=True)
        assert np.array_equal(decode_image(blob), px)
        m = decode_meta(blob)
        assert (m["kind"], m["width"], m["height"]) == ("image", 14, 10)

    def test_encode_image_like(self):
        from vectorflow_spark.operators.codecs import decode_image, encode_image_like

        px = _rng(8).integers(0, 256, (8, 8, 3), dtype=np.uint8)
        blob = encode_tiff(px)
        re = encode_image_like(decode_image(blob), blob)
        assert re[:4] == b"II*\x00" and np.array_equal(decode_image(re), px)


class TestSub8BitAndPalette:
    """r7: 1-bit bilevel, 4-bit gray and 4/8-bit palette-color — the
    depths scanned-document and legacy clip-art corpora carry. Gray
    expansion is libtiff's x*255/maxval; palette uses the 16-bit
    ColorMap high byte. Each path pinned against libtiff where present
    (tests/libtiff_ref.py)."""

    def test_1bit_roundtrip_all_compressions(self):
        rng = np.random.default_rng(0)
        b1 = rng.integers(0, 2, (23, 37), np.uint8)
        exp = np.repeat((b1 * 255)[:, :, None], 3, axis=2)
        for comp in ("none", "packbits", "lzw"):
            blob = encode_tiff(b1, compression=comp, bits=1)
            assert np.array_equal(decode_tiff(blob), exp), comp

    def test_4bit_gray_roundtrip(self):
        rng = np.random.default_rng(1)
        g4 = rng.integers(0, 16, (19, 31), np.uint8)
        exp = np.repeat((g4 * 17)[:, :, None], 3, axis=2)
        for comp in ("none", "packbits", "lzw"):
            blob = encode_tiff(g4, compression=comp, bits=4)
            assert np.array_equal(decode_tiff(blob), exp), comp

    @pytest.mark.parametrize("ncol", [12, 200])
    def test_palette_roundtrip(self, ncol):
        rng = np.random.default_rng(ncol)
        pal = rng.integers(0, 256, (ncol, 3), np.uint8)
        idx = rng.integers(0, ncol, (17, 29), np.uint8)
        for comp in ("none", "lzw"):
            blob = encode_tiff(idx, compression=comp, palette=pal)
            assert np.array_equal(decode_tiff(blob), pal[idx]), comp

    def test_guards(self):
        rng = np.random.default_rng(2)
        with pytest.raises(ValueError, match="predictor is 8-bit only"):
            encode_tiff(rng.integers(0, 2, (4, 4), np.uint8), compression="lzw",
                        predictor=True, bits=1)
        with pytest.raises(ValueError, match="exceed 4-bit"):
            encode_tiff(np.full((4, 4), 20, np.uint8), bits=4)
        with pytest.raises(ValueError, match="index out of range"):
            encode_tiff(np.full((4, 4), 9, np.uint8),
                        palette=np.zeros((8, 3), np.uint8))


@pytest.mark.skipif(
    not __import__("tests.libtiff_ref", fromlist=["HAVE_LIBTIFF"]).HAVE_LIBTIFF,
    reason="libtiff not present",
)
class TestSub8BitLibtiffParity:
    def test_depths_match_libtiff(self):
        from tests.libtiff_ref import decode_rgb

        rng = np.random.default_rng(5)
        cases = []
        b1 = rng.integers(0, 2, (23, 37), np.uint8)
        cases.append((encode_tiff(b1, compression="lzw", bits=1),
                      np.repeat((b1 * 255)[:, :, None], 3, axis=2)))
        g4 = rng.integers(0, 16, (19, 31), np.uint8)
        cases.append((encode_tiff(g4, compression="packbits", bits=4),
                      np.repeat((g4 * 17)[:, :, None], 3, axis=2)))
        for ncol in (12, 200):
            pal = rng.integers(0, 256, (ncol, 3), np.uint8)
            idx = rng.integers(0, ncol, (17, 29), np.uint8)
            cases.append((encode_tiff(idx, compression="lzw", palette=pal), pal[idx]))
        for blob, exp in cases:
            assert np.array_equal(decode_rgb(blob), exp)
            assert np.array_equal(decode_tiff(blob), exp)
