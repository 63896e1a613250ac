"""Test-only ctypes bindings to the system libpng16 via its SIMPLIFIED
API (png_image_*) — no setjmp error handling needed (errors land in the
struct's warning_or_error/message fields), so in-process use is safe.
The reference implementation our PNG codec is pinned against."""

from __future__ import annotations

import ctypes

import numpy as np

try:  # pragma: no cover
    _lib = ctypes.CDLL("libpng16.so.16")
except OSError:  # pragma: no cover
    _lib = None

HAVE_LIBPNG = _lib is not None

PNG_IMAGE_VERSION = 1
PNG_FORMAT_RGB = 2  # PNG_FORMAT_FLAG_COLOR


class png_image(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


if HAVE_LIBPNG:
    _lib.png_image_begin_read_from_memory.restype = ctypes.c_int
    _lib.png_image_begin_read_from_memory.argtypes = [
        ctypes.POINTER(png_image), ctypes.c_char_p, ctypes.c_size_t,
    ]
    _lib.png_image_finish_read.restype = ctypes.c_int
    _lib.png_image_finish_read.argtypes = [
        ctypes.POINTER(png_image), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p,
    ]
    _lib.png_image_write_to_memory.restype = ctypes.c_int
    _lib.png_image_write_to_memory.argtypes = [
        ctypes.POINTER(png_image), ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
    ]


def decode_rgb(blob: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 via libpng."""
    img = png_image()
    img.version = PNG_IMAGE_VERSION
    if not _lib.png_image_begin_read_from_memory(ctypes.byref(img), blob, len(blob)):
        raise RuntimeError(f"libpng read: {img.message.decode(errors='replace')}")
    img.format = PNG_FORMAT_RGB
    buf = (ctypes.c_uint8 * (img.width * img.height * 3))()
    if not _lib.png_image_finish_read(ctypes.byref(img), None, buf, 0, None):
        raise RuntimeError(f"libpng finish: {img.message.decode(errors='replace')}")
    return np.frombuffer(buf, np.uint8).reshape(img.height, img.width, 3).copy()


def encode_rgb(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes via libpng (genuine third-party
    deflate/filter choices for decode pinning)."""
    h, w = px.shape[:2]
    img = png_image()
    img.version = PNG_IMAGE_VERSION
    img.width = w
    img.height = h
    img.format = PNG_FORMAT_RGB
    raw = np.ascontiguousarray(px).tobytes()
    size = ctypes.c_size_t(0)
    # first call with NULL buffer computes the required size
    _lib.png_image_write_to_memory(ctypes.byref(img), None, ctypes.byref(size), 0, raw, 0, None)
    out = (ctypes.c_uint8 * size.value)()
    if not _lib.png_image_write_to_memory(
        ctypes.byref(img), out, ctypes.byref(size), 0, raw, 0, None
    ):
        raise RuntimeError(f"libpng write: {img.message.decode(errors='replace')}")
    return bytes(out[: size.value])
