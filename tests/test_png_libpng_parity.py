"""Cross-implementation pinning of the PNG codec against the system
libpng16 (simplified png_image API — no setjmp, safe in-process). Exact
both ways for this lossless format: genuine libpng streams (its own
deflate strategy and filter heuristics) decode bit-exactly in our
decoder, and our encoder's streams (fixed filters, ADAPTIVE per-row
filters, Adam7 interlace) decode bit-exactly in libpng. Skips cleanly
when libpng16.so is absent."""

from __future__ import annotations

import numpy as np
import pytest

from tests import libpng_ref as ref

pytestmark = pytest.mark.skipif(not ref.HAVE_LIBPNG, reason="libpng not available")


def _img(kind: str, h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), np.uint8)
    gy, gx = np.mgrid[0:h, 0:w]
    return np.stack([(gy * 3 % 256), (gx * 5 % 256), ((gy + gx) % 256)], -1).astype(np.uint8)


class TestRealLibpngStreams:
    @pytest.mark.parametrize("kind", ["noise", "grad"])
    @pytest.mark.parametrize("shape", [(16, 24), (33, 29), (7, 5)])
    def test_decode_exact(self, kind, shape):
        from vectorflow_spark.operators.codecs import decode_png

        px = _img(kind, *shape, seed=shape[0] + len(kind))
        assert np.array_equal(decode_png(ref.encode_rgb(px)), px)


class TestOurStreamsInLibpng:
    @pytest.mark.parametrize("kind", ["noise", "grad"])
    @pytest.mark.parametrize("interlace", [False, True])
    def test_encode_conformance(self, kind, interlace):
        from vectorflow_spark.operators.codecs import encode_png

        px = _img(kind, 33, 29, seed=7 + interlace)
        assert np.array_equal(ref.decode_rgb(encode_png(px, interlace=interlace)), px)
