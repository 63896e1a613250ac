"""Test-only ctypes bindings to the system libtiff: the reference
implementation our pure-Python tiffmini is pinned against. Error/warning
handlers are silenced (libtiff reports via return codes, so in-process
use is safe, unlike libjpeg). Files go through tmp paths — TIFFOpen's
path API is the stable ABI surface."""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

try:  # pragma: no cover - environment-dependent
    _lib = ctypes.CDLL("libtiff.so.6")
except OSError:  # pragma: no cover
    _lib = None

HAVE_LIBTIFF = _lib is not None

COMPRESSION = {"none": 1, "packbits": 32773, "lzw": 5}

if HAVE_LIBTIFF:
    _HANDLER = ctypes.CFUNCTYPE(None, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p)
    _silent = _HANDLER(lambda *_: None)
    _lib.TIFFSetErrorHandler(_silent)
    _lib.TIFFSetWarningHandler(_silent)
    _lib.TIFFOpen.restype = ctypes.c_void_p
    _lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    _lib.TIFFClose.argtypes = [ctypes.c_void_p]
    _lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    _lib.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
    ]
    _lib.TIFFWriteScanline.restype = ctypes.c_int
    _lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16,
    ]


def _get_u32(tif, tag: int) -> int:
    v = ctypes.c_uint32()
    # varargs functions get NO argtypes: the handle must be wrapped or it
    # is passed as a (truncated) 32-bit int
    _lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.byref(v))
    return v.value


def decode_rgb(blob: bytes) -> np.ndarray:
    """TIFF bytes -> (h, w, 3) uint8 via libtiff's RGBA reader."""
    fd, path = tempfile.mkstemp(suffix=".tiff")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        tif = _lib.TIFFOpen(path.encode(), b"r")
        if not tif:
            raise RuntimeError("libtiff rejected the file")
        try:
            w = _get_u32(tif, 256)  # ImageWidth
            h = _get_u32(tif, 257)  # ImageLength
            raster = (ctypes.c_uint32 * (w * h))()
            ok = _lib.TIFFReadRGBAImageOriented(tif, w, h, raster, 1, 0)  # top-left
            if not ok:
                raise RuntimeError("TIFFReadRGBAImage failed")
            abgr = np.frombuffer(raster, np.uint32).reshape(h, w)
            rgb = np.stack(
                [(abgr & 0xFF), (abgr >> 8) & 0xFF, (abgr >> 16) & 0xFF], axis=-1
            ).astype(np.uint8)
            return rgb
        finally:
            _lib.TIFFClose(tif)
    finally:
        os.unlink(path)


def encode_rgb(px: np.ndarray, compression: str = "lzw", predictor: bool = False) -> bytes:
    """(h, w, 3) uint8 -> TIFF bytes via libtiff (genuine third-party
    streams, incl. its LZW with horizontal predictor)."""
    h, w = px.shape[:2]
    fd, path = tempfile.mkstemp(suffix=".tiff")
    os.close(fd)
    try:
        tif = _lib.TIFFOpen(path.encode(), b"w")
        if not tif:
            raise RuntimeError("TIFFOpen(w) failed")
        set_ = _lib.TIFFSetField
        tifp = ctypes.c_void_p(tif)
        set_(tifp, ctypes.c_uint32(256), ctypes.c_uint32(w))       # width
        set_(tifp, ctypes.c_uint32(257), ctypes.c_uint32(h))       # length
        set_(tifp, ctypes.c_uint32(258), ctypes.c_int(8))          # bits/sample (u16 promoted)
        set_(tifp, ctypes.c_uint32(277), ctypes.c_int(3))          # samples/pixel
        set_(tifp, ctypes.c_uint32(259), ctypes.c_int(COMPRESSION[compression]))
        set_(tifp, ctypes.c_uint32(262), ctypes.c_int(2))          # photometric RGB
        set_(tifp, ctypes.c_uint32(284), ctypes.c_int(1))          # planar contig
        set_(tifp, ctypes.c_uint32(278), ctypes.c_uint32(max(1, h // 3)))  # rows/strip
        if predictor:
            set_(tifp, ctypes.c_uint32(317), ctypes.c_int(2))      # horizontal predictor
        row = np.ascontiguousarray(px)
        for y in range(h):
            buf = row[y].tobytes()
            if _lib.TIFFWriteScanline(tif, buf, y, 0) != 1:
                _lib.TIFFClose(tif)
                raise RuntimeError(f"TIFFWriteScanline failed at row {y}")
        _lib.TIFFClose(tif)
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)
