"""Cross-implementation pinning of tiffmini against the system libtiff
(in-process ctypes; libtiff reports via return codes). Both directions
are EXACT for lossless TIFF:

  * genuine libtiff-encoded strips (none/PackBits/LZW, LZW+horizontal
    predictor) decode bit-exactly in tiffmini — this is what exposed the
    round-5 LZW early-change point as off by one (widen at table size
    (1<<bits)-1, not -2; roundtrips alone could never see it), and
  * tiffmini's strips decode bit-exactly in libtiff, including streams
    long enough to cycle the code width to 12 bits and clear the table.

Skips cleanly when libtiff.so is absent."""

from __future__ import annotations

import numpy as np
import pytest

from tests import libtiff_ref as ref

pytestmark = pytest.mark.skipif(not ref.HAVE_LIBTIFF, reason="libtiff not available")


@pytest.mark.parametrize("shape", [(16, 24), (33, 29), (7, 5)])
@pytest.mark.parametrize(
    "comp,pred", [("none", False), ("packbits", False), ("lzw", False), ("lzw", True)]
)
class TestBothDirectionsExact:
    def test_real_libtiff_stream_decodes(self, shape, comp, pred):
        from vectorflow_spark.operators.tiffmini import decode_tiff

        rng = np.random.default_rng(shape[0] * 31 + len(comp) + pred)
        px = rng.integers(0, 256, (*shape, 3), np.uint8)
        assert np.array_equal(decode_tiff(ref.encode_rgb(px, comp, pred)), px)

    def test_our_stream_decodes_in_libtiff(self, shape, comp, pred):
        from vectorflow_spark.operators.tiffmini import encode_tiff

        rng = np.random.default_rng(shape[1] * 17 + len(comp) + pred)
        px = rng.integers(0, 256, (*shape, 3), np.uint8)
        assert np.array_equal(ref.decode_rgb(encode_tiff(px, compression=comp, predictor=pred)), px)


def test_lzw_twelve_bit_table_cycle():
    """A 128x128 noise image pushes LZW past every width change and the
    table-full clear — both directions stay exact."""
    from vectorflow_spark.operators.tiffmini import decode_tiff, encode_tiff

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, (128, 128, 3), np.uint8)
    assert np.array_equal(decode_tiff(ref.encode_rgb(px, "lzw", True)), px)
    assert np.array_equal(ref.decode_rgb(encode_tiff(px, compression="lzw", predictor=True)), px)
