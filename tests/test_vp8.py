"""VP8 (lossy WebP) keyframe codec — self-contained tests (no libwebp):
bool-coder roundtrips, header parsing, encoder->decoder roundtrips across
modes/quantizers/odd sizes, refusal contracts, and meta dispatch.
Cross-implementation bit-exactness lives in test_vp8_libwebp_parity.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vectorflow_spark.operators.vp8mini import (
    B_PRED,
    DC_PRED,
    H_PRED,
    TM_PRED,
    V_PRED,
    _BoolDec,
    _BoolEnc,
    decode_vp8,
    decode_webp_lossy,
    encode_vp8,
    encode_webp_lossy,
    rgb_to_yuv420,
    vp8_dimensions,
)


class TestBoolCoder:
    def test_roundtrip_random_bits_and_probs(self):
        rng = np.random.default_rng(3)
        probs = rng.integers(1, 255, 500).tolist()
        bits = rng.integers(0, 2, 500).tolist()
        be = _BoolEnc()
        for p, b in zip(probs, bits):
            be.bit(p, b)
        bd = _BoolDec(be.tobytes())
        assert [bd.bit(p) for p in probs] == bits

    def test_literals(self):
        be = _BoolEnc()
        for v, n in ((37, 7), (0, 4), (15, 4), (12345, 14)):
            be.lit(v, n)
        bd = _BoolDec(be.tobytes())
        assert [bd.lit(n) for n in (7, 4, 4, 14)] == [37, 0, 15, 12345]

    def test_carry_propagation(self):
        """A long run of 1-at-high-prob forces 0xFF intermediate bytes and
        a final carry; the decoder must read it all back."""
        be = _BoolEnc()
        seq = [(254, 1)] * 300 + [(2, 0)] * 50 + [(128, 1)]
        for p, b in seq:
            be.bit(p, b)
        bd = _BoolDec(be.tobytes())
        assert [bd.bit(p) for p, _ in seq] == [b for _, b in seq]


class TestRoundtrip:
    @pytest.mark.parametrize("ymode", [DC_PRED, V_PRED, H_PRED, TM_PRED])
    def test_modes_decode_consistently(self, ymode):
        rng = np.random.default_rng(10 + ymode)
        px = rng.integers(0, 256, (33, 29, 3), np.uint8)
        blob = encode_webp_lossy(px, qi=6, ymode=ymode)
        out = decode_webp_lossy(blob)
        assert out.shape == px.shape
        # near-exact at tiny quantizer modulo YUV420 chroma subsampling:
        # compare against the YUV-domain source instead of raw RGB
        y, u, v = rgb_to_yuv420(px)
        my, mu, mv = decode_vp8(blob[20 : 20 + struct.unpack_from("<I", blob, 16)[0]])
        assert np.abs(my.astype(int) - y.astype(int)).max() <= 12
        assert np.abs(mu.astype(int) - u.astype(int)).max() <= 12

    @pytest.mark.parametrize("shape", [(8, 8), (16, 16), (17, 31), (48, 13)])
    def test_odd_sizes_crop_correctly(self, shape):
        h, w = shape
        px = np.full((h, w, 3), 99, np.uint8)
        y, u, v = decode_vp8(encode_vp8(px, qi=4))
        assert y.shape == (h, w)
        assert u.shape == ((h + 1) // 2, (w + 1) // 2)

    @pytest.mark.parametrize("qi", [0, 20, 60, 110, 127])
    def test_quantizer_range(self, qi):
        rng = np.random.default_rng(qi)
        px = rng.integers(0, 256, (32, 32, 3), np.uint8)
        y, u, v = decode_vp8(encode_vp8(px, qi=qi))
        assert y.shape == (32, 32)  # higher qi just means coarser output

    def test_deterministic(self):
        px = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
        assert encode_webp_lossy(px, qi=8) == encode_webp_lossy(px, qi=8)


class TestContracts:
    def test_interframe_refuses(self):
        with pytest.raises(NotImplementedError, match="interframe"):
            decode_vp8(bytes([1, 0, 0]) + b"\x9d\x01\x2a" + b"\x00" * 8)

    def test_truncated_raises_valueerror(self):
        with pytest.raises(ValueError):
            decode_vp8(b"\x00\x00")
        blob = encode_vp8(np.zeros((16, 16, 3), np.uint8))
        with pytest.raises(ValueError):
            decode_vp8(blob[:12])

    def test_bad_start_code(self):
        with pytest.raises(ValueError, match="start code"):
            decode_vp8(bytes([0, 0, 0]) + b"\xde\xad\xbe" + b"\x00" * 8)

    def test_bpred_encode_refused(self):
        with pytest.raises(ValueError, match="intra16"):
            encode_vp8(np.zeros((16, 16, 3), np.uint8), ymode=B_PRED)

    def test_dimensions_header_only(self):
        blob = encode_vp8(np.zeros((33, 49, 3), np.uint8))
        assert vp8_dimensions(blob) == (49, 33)


class TestMetaDispatch:
    def test_decode_meta_reports_lossy_webp(self):
        from vectorflow_spark.operators.multimodal import decode_meta

        blob = encode_webp_lossy(np.zeros((24, 40, 3), np.uint8), qi=8)
        m = decode_meta(blob)
        assert (m["kind"], m["width"], m["height"], m["channels"]) == ("image", 40, 24, 3)

    def test_decode_image_dispatch(self):
        from vectorflow_spark.operators.codecs import decode_image

        px = np.full((16, 16, 3), 200, np.uint8)
        out = decode_image(encode_webp_lossy(px, qi=4))
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 6
