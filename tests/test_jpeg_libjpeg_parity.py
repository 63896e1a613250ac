"""Cross-implementation pinning of jpegmini against the system libjpeg
(subprocess ctypes — libjpeg's error path exits the process). Unlike VP8,
JPEG's IDCT and chroma upsampling are NOT normative-exact, so the pin is
tolerance-based: max |diff| <= 3 per sample, which only holds when the
implementation choices agree (libjpeg's triangular "fancy" upsampler,
clamped uint8 sample pipeline, correct edge replication at the
downsampled extent) — nearest-neighbour upsampling fails it by 60+.

Directions:
  * genuine libjpeg-ENCODED 4:2:0 streams (baseline + progressive, the
    real-web default) decode in jpegmini within tolerance, and
  * jpegmini's streams (baseline/progressive/optimized/restart) are
    accepted by libjpeg and decode within tolerance of our decoder.

Skips cleanly when libjpeg.so.62 is absent."""

from __future__ import annotations

import numpy as np
import pytest

from tests import libjpeg_ref as ref

pytestmark = pytest.mark.skipif(not ref.HAVE_LIBJPEG, reason="libjpeg not available")

TOL = 3


def _diff(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(int) - b.astype(int)).max())


class TestRealLibjpegStreams:
    @pytest.mark.parametrize("shape", [(24, 32), (17, 31), (64, 48), (16, 16)])
    @pytest.mark.parametrize("quality", [50, 90])
    @pytest.mark.parametrize("progressive", [False, True])
    def test_420_noise(self, shape, quality, progressive):
        from vectorflow_spark.operators.jpegmini import decode_jpeg

        rng = np.random.default_rng(shape[0] * quality + progressive)
        px = rng.integers(0, 256, (*shape, 3), np.uint8)
        blob = ref.encode_rgb(px, quality=quality, progressive=progressive)
        assert _diff(decode_jpeg(blob), ref.decode_rgb(blob)) <= TOL

    def test_smooth_gradient(self):
        from vectorflow_spark.operators.jpegmini import decode_jpeg

        h, w = 48, 64
        gy, gx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [(128 + 30 * np.sin(gy / 11)).astype(np.uint8),
             (128 + 30 * np.cos(gx / 13)).astype(np.uint8),
             np.full((h, w), 100, np.uint8)],
            axis=-1,
        )
        blob = ref.encode_rgb(px, quality=95)
        assert _diff(decode_jpeg(blob), ref.decode_rgb(blob)) <= TOL


class TestOurStreamsInLibjpeg:
    @pytest.mark.parametrize(
        "knobs",
        [
            {"quality": 95},
            {"quality": 100, "optimize": True},
            {"quality": 90, "restart_interval": 2},
        ],
    )
    def test_baseline(self, knobs):
        from vectorflow_spark.operators.jpegmini import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (24, 32, 3), np.uint8)
        blob = encode_jpeg(px, **knobs)
        assert _diff(decode_jpeg(blob), ref.decode_rgb(blob)) <= TOL

    @pytest.mark.parametrize("optimize", [False, True])
    def test_progressive(self, optimize):
        from vectorflow_spark.operators.jpegmini import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(8)
        px = rng.integers(0, 256, (33, 29, 3), np.uint8)
        blob = encode_jpeg_progressive(px, quality=95, optimize=optimize)
        assert _diff(decode_jpeg(blob), ref.decode_rgb(blob)) <= TOL


class TestOur420StreamsInLibjpeg:
    """Our 4:2:0 encoder (the real-web default shape: 2x2 luma MCUs,
    box-downsampled chroma) — accepted by libjpeg, and both decoders
    agree within the IDCT tolerance, with optimize/restart composing."""

    @pytest.mark.parametrize(
        "knobs",
        [
            {"quality": 92},
            {"quality": 100, "optimize": True},
            {"quality": 90, "restart_interval": 2},
            {"quality": 90, "optimize": True, "restart_interval": 3},
        ],
    )
    @pytest.mark.parametrize("shape", [(16, 16), (17, 31), (48, 64)])
    def test_parity(self, knobs, shape):
        from vectorflow_spark.operators.jpegmini import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(shape[0] + len(knobs))
        px = rng.integers(0, 256, (*shape, 3), np.uint8)
        blob = encode_jpeg(px, subsampling="420", **knobs)
        assert _diff(decode_jpeg(blob), ref.decode_rgb(blob)) <= TOL
