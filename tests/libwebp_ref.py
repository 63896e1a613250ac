"""Test-only ctypes bindings to the system libwebp (when present): the
independent reference implementation our pure-Python WebP codecs are pinned
against. Production code never touches this — decoders stay stdlib/numpy —
but tests that find libwebp.so use it to (a) generate REAL lossy/lossless
WebP streams our decoders must parse and (b) cross-check pixel output
bit-exactly (YUV planes for VP8, RGB for VP8L)."""

from __future__ import annotations

import ctypes

import numpy as np

try:  # pragma: no cover - trivially environment-dependent
    _lib = ctypes.CDLL("libwebp.so.7")
except OSError:  # pragma: no cover
    _lib = None

HAVE_LIBWEBP = _lib is not None

if HAVE_LIBWEBP:
    _lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    _lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    _lib.WebPEncodeRGB.restype = ctypes.c_size_t
    _lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
    ]
    _lib.WebPDecodeRGB.restype = ctypes.c_void_p
    _lib.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib.WebPDecodeYUV.restype = ctypes.c_void_p
    _lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib.WebPFree.restype = None
    _lib.WebPFree.argtypes = [ctypes.c_void_p]


def encode_lossless_rgb(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> lossless WebP (VP8L) bytes via libwebp."""
    h, w = px.shape[:2]
    out = ctypes.c_void_p()
    n = _lib.WebPEncodeLosslessRGB(
        np.ascontiguousarray(px).tobytes(), w, h, w * 3, ctypes.byref(out)
    )
    if not n:
        raise RuntimeError("WebPEncodeLosslessRGB failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        _lib.WebPFree(out)


def encode_lossy_rgb(px: np.ndarray, quality: float = 75.0) -> bytes:
    """(h, w, 3) uint8 -> lossy WebP (VP8) bytes via libwebp."""
    h, w = px.shape[:2]
    out = ctypes.c_void_p()
    n = _lib.WebPEncodeRGB(
        np.ascontiguousarray(px).tobytes(), w, h, w * 3, quality, ctypes.byref(out)
    )
    if not n:
        raise RuntimeError("WebPEncodeRGB failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        _lib.WebPFree(out)


def decode_rgb(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 3) uint8 via libwebp."""
    w, h = ctypes.c_int(), ctypes.c_int()
    buf = _lib.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        raise RuntimeError("WebPDecodeRGB failed")
    try:
        raw = ctypes.string_at(buf, w.value * h.value * 3)
    finally:
        _lib.WebPFree(buf)
    return np.frombuffer(raw, np.uint8).reshape(h.value, w.value, 3)


def decode_yuv(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """WebP bytes -> exact (Y, U, V) planes via libwebp — the bit-exact
    reference for the VP8 reconstruction incl. the in-loop filter, free of
    any YUV->RGB conversion convention."""
    w, h = ctypes.c_int(), ctypes.c_int()
    u, v = ctypes.c_void_p(), ctypes.c_void_p()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    buf = _lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v), ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not buf:
        raise RuntimeError("WebPDecodeYUV failed")
    try:
        ww, hh, s, us = w.value, h.value, stride.value, uv_stride.value
        cw, ch = (ww + 1) // 2, (hh + 1) // 2
        y = np.frombuffer(ctypes.string_at(buf, s * hh), np.uint8).reshape(hh, s)[:, :ww]
        up = np.frombuffer(ctypes.string_at(u.value, us * ch), np.uint8).reshape(ch, us)[:, :cw]
        vp = np.frombuffer(ctypes.string_at(v.value, us * ch), np.uint8).reshape(ch, us)[:, :cw]
        return y.copy(), up.copy(), vp.copy()
    finally:
        _lib.WebPFree(buf)


def encode_lossy_rgba(px: np.ndarray, quality: float = 75.0) -> bytes:
    """(h, w, 4) uint8 -> lossy WebP; with non-opaque alpha libwebp emits
    the VP8X + ALPH + VP8 extended container."""
    h, w = px.shape[:2]
    _lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    _lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
    ]
    out = ctypes.c_void_p()
    n = _lib.WebPEncodeRGBA(
        np.ascontiguousarray(px).tobytes(), w, h, w * 4, quality, ctypes.byref(out)
    )
    if not n:
        raise RuntimeError("WebPEncodeRGBA failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        _lib.WebPFree(out)
