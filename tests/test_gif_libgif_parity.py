"""Cross-implementation pinning of the GIF codec (codecs.decode_gif /
encode_gif) against the system giflib — exact both ways for this
lossless palette format:

  * genuine giflib-encoded LZW streams (4/16/256-color palettes, sizes
    that cycle the code width) decode bit-exactly in our decoder, and
  * our encoder's streams (plain, interlaced, animated, 256-color)
    decode bit-exactly in giflib.

Skips cleanly when libgif.so is absent."""

from __future__ import annotations

import numpy as np
import pytest

from tests import libgif_ref as ref

pytestmark = pytest.mark.skipif(not ref.HAVE_LIBGIF, reason="libgif not available")


class TestRealGiflibStreams:
    @pytest.mark.parametrize("n_colors", [4, 16, 256])
    @pytest.mark.parametrize("shape", [(13, 19), (48, 64)])
    def test_decode_exact(self, n_colors, shape):
        from vectorflow_spark.operators.codecs import decode_gif

        rng = np.random.default_rng(n_colors + shape[0])
        pal = rng.integers(0, 256, (n_colors, 3), np.uint8)
        idx = rng.integers(0, n_colors, shape).astype(np.uint8)
        blob = ref.encode_gif_rgbidx(idx, pal)
        assert np.array_equal(decode_gif(blob)[0], pal[idx])


class TestOurStreamsInGiflib:
    @pytest.mark.parametrize("interlace", [False, True])
    def test_single_frame(self, interlace):
        from vectorflow_spark.operators.codecs import encode_gif

        rng = np.random.default_rng(3 + interlace)
        pal = rng.integers(0, 256, (16, 3), np.uint8)
        idx = rng.integers(0, 16, (1, 33, 29)).astype(np.uint8)
        blob = encode_gif(idx, palette=pal, interlace=interlace)
        assert np.array_equal(ref.decode_frames(blob)[0], pal[idx[0]])

    def test_animation(self):
        from vectorflow_spark.operators.codecs import encode_gif

        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (16, 3), np.uint8)
        idx = rng.integers(0, 16, (4, 12, 17)).astype(np.uint8)
        frames = ref.decode_frames(encode_gif(idx, palette=pal))
        assert len(frames) == 4
        for f, i in zip(frames, idx):
            assert np.array_equal(f, pal[i])

    def test_256_colors(self):
        from vectorflow_spark.operators.codecs import encode_gif

        rng = np.random.default_rng(6)
        pal = rng.integers(0, 256, (256, 3), np.uint8)
        idx = rng.integers(0, 256, (1, 64, 80)).astype(np.uint8)
        assert np.array_equal(
            ref.decode_frames(encode_gif(idx, palette=pal))[0], pal[idx[0]]
        )
