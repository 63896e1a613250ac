"""Cross-implementation pinning of the pure-Python VP8 keyframe codec
against the system libwebp (ctypes, test-only). Both directions:

  * libwebp-ENCODED lossy streams (every keyframe feature its encoder
    emits: segmentation, prob updates, skip flags, B_PRED, all filter
    levels) decode to BIT-EXACT Y/U/V planes in our decoder — plane
    comparison via WebPDecodeYUV, so no YUV->RGB convention ambiguity
    and the in-loop filter is verified normatively; and
  * OUR encoder's streams decode bit-identically in libwebp and here.

Skips cleanly when libwebp.so is absent."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tests import libwebp_ref as ref
from vectorflow_spark.operators.vp8mini import (
    DC_PRED,
    H_PRED,
    TM_PRED,
    V_PRED,
    decode_vp8,
    encode_webp_lossy,
)

pytestmark = pytest.mark.skipif(not ref.HAVE_LIBWEBP, reason="libwebp.so not available")


def _payload(blob: bytes) -> bytes:
    assert blob[12:16] == b"VP8 "
    (n,) = struct.unpack_from("<I", blob, 16)
    return blob[20 : 20 + n]


def _img(kind: str, h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    gy, gx = np.mgrid[0:h, 0:w]
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), np.uint8)
    if kind == "smooth":
        return np.ascontiguousarray(
            np.stack(
                [(128 + 40 * np.sin(gy / 9 + c) + 40 * np.cos(gx / 13)).astype(np.uint8) for c in range(3)],
                axis=-1,
            )
        )
    if kind == "mixed":
        px = np.stack([(gy * 3 % 256), (gx * 5 % 256), np.full((h, w), 99)], -1).astype(np.uint8)
        px[h // 3 :, w // 3 :] = rng.integers(0, 256, (h - h // 3, w - w // 3, 3), np.uint8)
        return np.ascontiguousarray(px)
    px = np.full((h, w, 3), 77, np.uint8)
    px[::5, :] = [250, 0, 0]
    return px  # "flat"


class TestRealLossyStreamsDecodeExactly:
    @pytest.mark.parametrize("kind", ["noise", "smooth", "mixed", "flat"])
    @pytest.mark.parametrize("q", [5.0, 50.0, 80.0, 99.0])
    def test_yuv_bit_exact(self, kind, q):
        px = _img(kind, 48, 64, seed=int(q) + len(kind))
        blob = ref.encode_lossy_rgb(px, q)
        ry, ru, rv = ref.decode_yuv(blob)
        my, mu, mv = decode_vp8(_payload(blob))
        assert np.array_equal(my, ry)
        assert np.array_equal(mu, ru)
        assert np.array_equal(mv, rv)

    @pytest.mark.parametrize("shape", [(8, 8), (17, 31), (120, 160), (33, 13)])
    def test_odd_sizes(self, shape):
        h, w = shape
        px = _img("mixed", h, w, seed=h * w)
        blob = ref.encode_lossy_rgb(px, 60.0)
        ry, ru, rv = ref.decode_yuv(blob)
        my, mu, mv = decode_vp8(_payload(blob))
        assert np.array_equal(my, ry) and np.array_equal(mu, ru) and np.array_equal(mv, rv)


class TestOurStreamsDecodeInLibwebp:
    @pytest.mark.parametrize("ymode", [DC_PRED, V_PRED, H_PRED, TM_PRED])
    @pytest.mark.parametrize("qi", [4, 30, 80])
    def test_encoder_conformance(self, ymode, qi):
        rng = np.random.default_rng(qi + ymode)
        px = rng.integers(0, 256, (33, 29, 3), np.uint8)
        blob = encode_webp_lossy(px, qi=qi, ymode=ymode)
        ry, ru, rv = ref.decode_yuv(bytes(blob))
        my, mu, mv = decode_vp8(_payload(blob))
        assert np.array_equal(my, ry) and np.array_equal(mu, ru) and np.array_equal(mv, rv)


class TestVp8xExtendedContainer:
    """Real alpha-carrying lossy WebPs ride the VP8X extended container
    (VP8X + ALPH + VP8); the walk must reach the inner VP8 keyframe and
    decode it with bit-exact YUV, alpha dropped per the codec contract
    (every decoder here returns RGB). Animated VP8X refuses loudly."""

    def test_vp8x_alpha_file_decodes_yuv_exact(self):
        import struct as _struct

        from vectorflow_spark.operators.webpmini import decode_webp, webp_meta

        rng = np.random.default_rng(21)
        rgba = rng.integers(0, 256, (16, 24, 4), np.uint8)
        blob = ref.encode_lossy_rgba(rgba, 80.0)
        assert blob[12:16] == b"VP8X"  # non-opaque alpha forces VP8X
        assert webp_meta(blob) == (24, 16, 4)
        out = decode_webp(blob)  # walks through VP8X/ALPH to the VP8 chunk
        assert out.shape == (16, 24, 3)
        # the normative pin: the inner VP8 chunk's YUV planes bit-exact
        pos = 12
        while pos + 8 <= len(blob):
            fc = blob[pos : pos + 4]
            (sz,) = _struct.unpack_from("<I", blob, pos + 4)
            if fc == b"VP8 ":
                my, mu, mv = decode_vp8(blob[pos + 8 : pos + 8 + sz])
                break
            pos += 8 + sz + (sz & 1)
        ry, ru, rv = ref.decode_yuv(blob)
        assert np.array_equal(my, ry) and np.array_equal(mu, ru) and np.array_equal(mv, rv)

    def test_opaque_alpha_collapses_to_plain_vp8(self):
        from vectorflow_spark.operators.webpmini import decode_webp

        rng = np.random.default_rng(22)
        rgba = np.concatenate(
            [rng.integers(0, 256, (16, 24, 3), np.uint8), np.full((16, 24, 1), 255, np.uint8)],
            axis=2,
        )
        blob = ref.encode_lossy_rgba(rgba, 80.0)
        assert blob[12:16] == b"VP8 "  # libwebp drops all-opaque alpha
        assert decode_webp(blob).shape == (16, 24, 3)

    def test_animated_vp8x_refuses(self):
        import struct as _struct

        from vectorflow_spark.operators.webpmini import decode_webp

        body = bytes([0x02, 0, 0, 0]) + (23).to_bytes(3, "little") + (15).to_bytes(3, "little")
        chunk = b"VP8X" + _struct.pack("<I", len(body)) + body
        blob = b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        with pytest.raises(NotImplementedError, match="animated"):
            decode_webp(blob)
