"""Test-only ctypes bindings to the system giflib 7: the reference GIF
implementation our codecs.decode_gif/encode_gif are pinned against.
Struct layouts follow giflib 5.2's public gif_lib.h (the v7 soname)."""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

try:  # pragma: no cover
    _lib = ctypes.CDLL("libgif.so.7")
except OSError:  # pragma: no cover
    _lib = None

HAVE_LIBGIF = _lib is not None


class GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte), ("Blue", ctypes.c_ubyte)]


class ColorMapObject(ctypes.Structure):
    _fields_ = [
        ("ColorCount", ctypes.c_int),
        ("BitsPerPixel", ctypes.c_int),
        ("SortFlag", ctypes.c_bool),
        ("Colors", ctypes.POINTER(GifColorType)),
    ]


class GifImageDesc(ctypes.Structure):
    _fields_ = [
        ("Left", ctypes.c_int), ("Top", ctypes.c_int),
        ("Width", ctypes.c_int), ("Height", ctypes.c_int),
        ("Interlace", ctypes.c_bool),
        ("ColorMap", ctypes.POINTER(ColorMapObject)),
    ]


class SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", GifImageDesc),
        ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
    ]


class GifFileType(ctypes.Structure):
    _fields_ = [
        ("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
        ("SColorResolution", ctypes.c_int),
        ("SBackGroundColor", ctypes.c_int),
        ("AspectByte", ctypes.c_ubyte),
        ("SColorMap", ctypes.POINTER(ColorMapObject)),
        ("ImageCount", ctypes.c_int),
        ("Image", GifImageDesc),
        ("SavedImages", ctypes.POINTER(SavedImage)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
        ("Error", ctypes.c_int),
        ("UserData", ctypes.c_void_p),
        ("Private", ctypes.c_void_p),
    ]


if HAVE_LIBGIF:
    _lib.DGifOpenFileName.restype = ctypes.POINTER(GifFileType)
    _lib.DGifOpenFileName.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    _lib.DGifSlurp.restype = ctypes.c_int
    _lib.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]
    _lib.DGifCloseFile.restype = ctypes.c_int
    _lib.DGifCloseFile.argtypes = [ctypes.POINTER(GifFileType), ctypes.POINTER(ctypes.c_int)]


def decode_frames(blob: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of (h, w, 3) uint8 RGB frames via giflib.
    Frames composite onto the full logical screen (frame 0's palette
    rules; no disposal handling beyond draw-on-top — matches our
    codecs.decode_gif contract for the corpora we generate)."""
    fd, path = tempfile.mkstemp(suffix=".gif")
    err = ctypes.c_int()
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        gif = _lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
        if not gif:
            raise RuntimeError(f"giflib open failed: {err.value}")
        try:
            if _lib.DGifSlurp(gif) != 1:
                raise RuntimeError(f"DGifSlurp failed: {gif.contents.Error}")
            g = gif.contents
            sw, sh = g.SWidth, g.SHeight
            canvas = np.zeros((sh, sw, 3), np.uint8)
            frames = []
            for i in range(g.ImageCount):
                img = g.SavedImages[i]
                d = img.ImageDesc
                cmap = d.ColorMap if d.ColorMap else g.SColorMap
                if not cmap:
                    raise RuntimeError("no color map")
                cc = cmap.contents.ColorCount
                pal = np.array(
                    [
                        (cmap.contents.Colors[k].Red,
                         cmap.contents.Colors[k].Green,
                         cmap.contents.Colors[k].Blue)
                        for k in range(cc)
                    ],
                    np.uint8,
                )
                idx = np.ctypeslib.as_array(img.RasterBits, shape=(d.Height, d.Width))
                canvas[d.Top : d.Top + d.Height, d.Left : d.Left + d.Width] = pal[idx]
                frames.append(canvas.copy())
            return frames
        finally:
            _lib.DGifCloseFile(gif, ctypes.byref(err))
    finally:
        os.unlink(path)


def encode_gif_rgbidx(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) palette indices + (n, 3) palette -> GIF bytes via giflib's
    encoder (genuine third-party LZW streams for decode pinning)."""
    h, w = idx.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    n_slots = 1 << bits
    fd, path = tempfile.mkstemp(suffix=".gif")
    os.close(fd)
    err = ctypes.c_int()
    try:
        _lib.EGifOpenFileName.restype = ctypes.POINTER(GifFileType)
        _lib.EGifOpenFileName.argtypes = [ctypes.c_char_p, ctypes.c_bool, ctypes.POINTER(ctypes.c_int)]
        gif = _lib.EGifOpenFileName(path.encode(), False, ctypes.byref(err))
        if not gif:
            raise RuntimeError(f"EGifOpenFileName failed: {err.value}")
        colors = (GifColorType * n_slots)()
        for i in range(n_slots):
            r, g, b = palette[min(i, n - 1)]
            colors[i] = GifColorType(int(r), int(g), int(b))
        _lib.GifMakeMapObject.restype = ctypes.POINTER(ColorMapObject)
        _lib.GifMakeMapObject.argtypes = [ctypes.c_int, ctypes.POINTER(GifColorType)]
        cmap = _lib.GifMakeMapObject(n_slots, colors)
        _lib.EGifPutScreenDesc.restype = ctypes.c_int
        _lib.EGifPutScreenDesc.argtypes = [
            ctypes.POINTER(GifFileType), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ColorMapObject),
        ]
        if _lib.EGifPutScreenDesc(gif, w, h, bits, 0, cmap) != 1:
            raise RuntimeError("EGifPutScreenDesc failed")
        _lib.EGifPutImageDesc.restype = ctypes.c_int
        _lib.EGifPutImageDesc.argtypes = [
            ctypes.POINTER(GifFileType), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_bool, ctypes.POINTER(ColorMapObject),
        ]
        if _lib.EGifPutImageDesc(gif, 0, 0, w, h, False, None) != 1:
            raise RuntimeError("EGifPutImageDesc failed")
        _lib.EGifPutLine.restype = ctypes.c_int
        _lib.EGifPutLine.argtypes = [ctypes.POINTER(GifFileType), ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        row_arr = np.ascontiguousarray(idx, np.uint8)
        for y in range(h):
            buf = (ctypes.c_ubyte * w).from_buffer_copy(row_arr[y].tobytes())
            if _lib.EGifPutLine(gif, buf, w) != 1:
                raise RuntimeError(f"EGifPutLine failed at {y}")
        _lib.EGifCloseFile(ctypes.cast(gif, ctypes.POINTER(GifFileType)), ctypes.byref(err))
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)
