"""Cross-implementation pinning of the pure-Python WebP codecs against the
system libwebp (ctypes, test-only; production code never links it). Two
directions, both bit-exact:

  * libwebp-encoded VP8L streams -> our decoder (real-file conformance:
    predictor border rules, spec cache/meta bit order, C truncation
    semantics — exactly the deviations roundtrip tests cannot see), and
  * our encoder's streams -> libwebp's decoder (emitted-bitstream
    conformance for every transform and the meta-Huffman form).

Skips cleanly when libwebp.so is absent."""

from __future__ import annotations

import numpy as np
import pytest

from tests import libwebp_ref as ref

pytestmark = pytest.mark.skipif(not ref.HAVE_LIBWEBP, reason="libwebp.so not available")


def _mixed(h: int, w: int, seed: int) -> np.ndarray:
    """Gradient + noise + flat regions: exercises predictors, LZ77 and the
    color cache in whatever mix libwebp's encoder picks."""
    rng = np.random.default_rng(seed)
    gy, gx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(gy * 3 + gx) % 256, (gx * 5) % 256, np.full((h, w), 77)], axis=-1
    ).astype(np.uint8)
    px[h // 2 :, w // 2 :] = rng.integers(0, 256, (h - h // 2, w - w // 2, 3), np.uint8)
    return px


class TestRealLosslessStreamsDecodeExactly:
    @pytest.mark.parametrize(
        "shape", [(7, 5), (16, 24), (64, 48), (128, 96), (96, 200), (17, 300)]
    )
    def test_mixed_content(self, shape):
        from vectorflow_spark.operators.webpmini import decode_webp

        h, w = shape
        px = _mixed(h, w, seed=h * 1000 + w)
        blob = ref.encode_lossless_rgb(px)
        assert np.array_equal(decode_webp(blob), px)

    def test_smooth_content_predictor_heavy(self):
        from vectorflow_spark.operators.webpmini import decode_webp

        h, w = 120, 160
        gy, gx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [(40 * c + gy * 0.5 + gx * 0.3 + 10 * np.sin(gx / 17 + c)).astype(np.uint8) for c in range(3)],
            axis=-1,
        )
        blob = ref.encode_lossless_rgb(np.ascontiguousarray(px))
        assert np.array_equal(decode_webp(blob), px)

    def test_flat_content_lz77_heavy(self):
        from vectorflow_spark.operators.webpmini import decode_webp

        px = np.zeros((96, 128, 3), np.uint8)
        px[::7, :] = [200, 10, 50]
        px[:, ::13] = [1, 2, 3]
        blob = ref.encode_lossless_rgb(px)
        assert np.array_equal(decode_webp(blob), px)


class TestOurStreamsDecodeInLibwebp:
    @pytest.mark.parametrize("transform", ["none", "subtract_green", "predictor", "color", "palette"])
    def test_all_transforms(self, transform):
        from vectorflow_spark.operators.webpmini import encode_webp

        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (21, 17, 3), np.uint8)
        if transform == "palette":
            pal = rng.integers(0, 256, (9, 3), np.uint8)
            px = pal[rng.integers(0, 9, (21, 17))]
        blob = encode_webp(px, transform=transform)
        assert np.array_equal(ref.decode_rgb(blob), px)

    @pytest.mark.parametrize("cache_bits", [0, 4])
    def test_meta_groups_and_cache(self, cache_bits):
        from vectorflow_spark.operators.webpmini import encode_webp

        rng = np.random.default_rng(13)
        pal = rng.integers(0, 256, (7, 3), np.uint8)
        px = pal[rng.integers(0, 7, (33, 40))]
        blob = encode_webp(px, transform="none", cache_bits=cache_bits, meta_groups=True)
        assert np.array_equal(ref.decode_rgb(blob), px)
