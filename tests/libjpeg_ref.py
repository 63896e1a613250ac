"""Test-only reference JPEG decoder: the system libjpeg (v62 ABI) driven
via ctypes INSIDE A SUBPROCESS — libjpeg's default error handling calls
exit(), so the classic API must not run in the test process. Used to pin
our pure-Python jpegmini against the canonical implementation: our
ENCODER's streams (baseline/progressive/optimized/restart) must decode
in libjpeg, and both decoders must agree within the IDCT tolerance the
JPEG spec allows (the transform is not normative-exact, unlike VP8)."""

from __future__ import annotations

import ctypes.util
import os
import struct
import subprocess
import sys

import numpy as np

HAVE_LIBJPEG = bool(
    ctypes.util.find_library("jpeg")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libjpeg.so.62")
)

_WORKER = r"""
import ctypes, sys, struct

lib = ctypes.CDLL("libjpeg.so.62")
data = sys.stdin.buffer.read()

class jpeg_error_mgr(ctypes.Structure):
    _fields_ = [("_opaque", ctypes.c_uint8 * 1024)]

# the decompress struct is opaque to us except the fields we need; v62
# ABI layout: allocate generously and read documented offsets via the
# accessor-free route -- instead we use the struct prefix layout:
class jpeg_decompress_struct(ctypes.Structure):
    _fields_ = [("_opaque", ctypes.c_uint8 * 632)]  # v62 ABI sizeof

err = jpeg_error_mgr()
cinfo = jpeg_decompress_struct()

lib.jpeg_std_error.restype = ctypes.c_void_p
lib.jpeg_std_error.argtypes = [ctypes.POINTER(jpeg_error_mgr)]
err_ptr = lib.jpeg_std_error(ctypes.byref(err))
# cinfo.err is the FIRST field of the common struct prefix
ctypes.cast(ctypes.byref(cinfo), ctypes.POINTER(ctypes.c_void_p))[0] = err_ptr

lib.jpeg_CreateDecompress.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t]
lib.jpeg_CreateDecompress(ctypes.byref(cinfo), 62, ctypes.sizeof(cinfo))
lib.jpeg_mem_src.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_ulong]
lib.jpeg_mem_src(ctypes.byref(cinfo), data, len(data))
lib.jpeg_read_header.argtypes = [ctypes.c_void_p, ctypes.c_int]
lib.jpeg_read_header(ctypes.byref(cinfo), 1)
lib.jpeg_start_decompress.argtypes = [ctypes.c_void_p]
lib.jpeg_start_decompress(ctypes.byref(cinfo))

# output_width / output_height / output_components: find them by known
# v62 offsets is fragile -- instead use jpeg_read_scanlines until it
# returns 0 rows, with a generous row buffer, and recover dims from the
# image_width/image_height fields located by scanning the struct for the
# two consecutive uint32s we planted... simpler: the SOF dims come from
# the stream itself, parsed in the parent; the parent passes them argv.
w, h, ncomp = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
row = (ctypes.c_uint8 * (w * ncomp))()
rowp = ctypes.cast(ctypes.byref(row), ctypes.c_void_p)
rows = (ctypes.c_void_p * 1)(rowp)
lib.jpeg_read_scanlines.restype = ctypes.c_uint
lib.jpeg_read_scanlines.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint]
out = bytearray()
for _ in range(h):
    n = lib.jpeg_read_scanlines(ctypes.byref(cinfo), rows, 1)
    if n != 1:
        sys.exit(3)
    out += bytes(row)
lib.jpeg_finish_decompress.argtypes = [ctypes.c_void_p]
lib.jpeg_finish_decompress(ctypes.byref(cinfo))
sys.stdout.buffer.write(bytes(out))
"""


_ENC_WORKER = r"""
import ctypes, sys

lib = ctypes.CDLL("libjpeg.so.62")
w, h, quality, progressive, restart, arith = (int(a) for a in sys.argv[1:7])
dc_l, dc_u, ac_k = (int(a) for a in sys.argv[7:10]) if len(sys.argv) > 7 else (0, 1, 5)
script = sys.argv[10] if len(sys.argv) > 10 else ""
raw = sys.stdin.buffer.read()
assert len(raw) == w * h * 3

class jpeg_error_mgr(ctypes.Structure):
    _fields_ = [("_opaque", ctypes.c_uint8 * 1024)]

class jpeg_compress_struct(ctypes.Structure):
    _fields_ = [("_opaque", ctypes.c_uint8 * 520)]  # v62 ABI sizeof

err = jpeg_error_mgr()
cinfo = jpeg_compress_struct()
lib.jpeg_std_error.restype = ctypes.c_void_p
lib.jpeg_std_error.argtypes = [ctypes.POINTER(jpeg_error_mgr)]
ctypes.cast(ctypes.byref(cinfo), ctypes.POINTER(ctypes.c_void_p))[0] = lib.jpeg_std_error(ctypes.byref(err))
lib.jpeg_CreateCompress.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t]
lib.jpeg_CreateCompress(ctypes.byref(cinfo), 62, ctypes.sizeof(cinfo))

outbuf = ctypes.c_void_p()
outsize = ctypes.c_ulong()
lib.jpeg_mem_dest.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_ulong)]
lib.jpeg_mem_dest(ctypes.byref(cinfo), ctypes.byref(outbuf), ctypes.byref(outsize))

# v62 struct offsets for the fields we must set (x86-64 layout):
#   err(8) mem(8) progress(8) client_data(8) is_decompressor(4) global_state(4)
#   dest(8) -> image_width @48, image_height @52, input_components @56,
#   in_color_space @60
base = ctypes.addressof(cinfo)
ctypes.c_uint.from_address(base + 48).value = w
ctypes.c_uint.from_address(base + 52).value = h
ctypes.c_int.from_address(base + 56).value = 3
ctypes.c_int.from_address(base + 60).value = 2  # JCS_RGB
lib.jpeg_set_defaults.argtypes = [ctypes.c_void_p]
lib.jpeg_set_defaults(ctypes.byref(cinfo))

# ABI layout gate: jpeg_CreateCompress(62, sizeof) above already made
# libjpeg itself verify JPEG_LIB_VERSION==62 and the exact struct size
# (ERREXIT -> exit() on mismatch). Field OFFSETS are additionally
# fingerprinted here against values jpeg_set_defaults just wrote: the
# 48-byte (0*16, 1*16, 5*16) arith-conditioning pattern plus zeroed
# num_scans/scan_info/arith_code/restart_interval at our claimed
# addresses. If this build's layout differs, the pattern cannot match
# and the fixture fails loudly instead of poking unrelated fields.
_layout_ok = (
    bytes((ctypes.c_uint8 * 16).from_address(base + 192)) == b"\x00" * 16
    and bytes((ctypes.c_uint8 * 16).from_address(base + 208)) == b"\x01" * 16
    and bytes((ctypes.c_uint8 * 16).from_address(base + 224)) == b"\x05" * 16
    and ctypes.c_int.from_address(base + 240).value == 0
    and ctypes.c_void_p.from_address(base + 248).value in (None, 0)
    and ctypes.c_int.from_address(base + 260).value == 0
    and ctypes.c_uint.from_address(base + 280).value == 0
    and ctypes.c_uint.from_address(base + 48).value == w
    and ctypes.c_uint.from_address(base + 52).value == h
)
if not _layout_ok:
    sys.stderr.write("libjpeg v62 x86-64 struct layout fingerprint mismatch; refusing to poke offsets\n")
    sys.exit(4)
lib.jpeg_set_quality.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
lib.jpeg_set_quality(ctypes.byref(cinfo), quality, 1)
if progressive:
    lib.jpeg_simple_progression.argtypes = [ctypes.c_void_p]
    lib.jpeg_simple_progression(ctypes.byref(cinfo))
if script:
    # custom scan script: jpeg_scan_info = {comps_in_scan, component_index[4],
    # Ss, Se, Ah, Al} = 9 ints; scans separated by ';', fields by ','
    scans = [tuple(int(x) for x in part.split(",")) for part in script.split(";")]
    ScanInfo = ctypes.c_int * 9
    arr = (ScanInfo * len(scans))()
    for si, sc in enumerate(scans):
        ncs = sc[0]
        fields = [ncs] + list(sc[1 : 1 + ncs]) + [0] * (4 - ncs) + list(sc[1 + ncs :])
        for fi, val in enumerate(fields):
            arr[si][fi] = val
    ctypes.c_int.from_address(base + 240).value = len(scans)  # num_scans
    ctypes.c_void_p.from_address(base + 248).value = ctypes.addressof(arr)  # scan_info
# v62 x86-64 offsets past the huff table pointers (@160-192):
#   arith_dc_L/U[16] @192/@208, arith_ac_K[16] @224, num_scans @240,
#   scan_info @248, raw_data_in @256, arith_code @260, optimize_coding
#   @264, CCIR601 @268, smoothing @272, dct_method @276,
#   restart_interval @280 — the emitted markers (SOF9/SOF10, DRI/RSTn)
#   verify each poke landed, so a layout drift fails loudly in the tests
if arith:
    ctypes.c_int.from_address(base + 260).value = 1
    for t in range(16):  # DAC conditioning (defaults 0/1/5)
        ctypes.c_uint8.from_address(base + 192 + t).value = dc_l
        ctypes.c_uint8.from_address(base + 208 + t).value = dc_u
        ctypes.c_uint8.from_address(base + 224 + t).value = ac_k
if restart:
    ctypes.c_uint.from_address(base + 280).value = restart
lib.jpeg_start_compress.argtypes = [ctypes.c_void_p, ctypes.c_int]
lib.jpeg_start_compress(ctypes.byref(cinfo), 1)
lib.jpeg_write_scanlines.restype = ctypes.c_uint
lib.jpeg_write_scanlines.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint]
stride = w * 3
for y in range(h):
    row = (ctypes.c_uint8 * stride).from_buffer_copy(raw[y * stride : (y + 1) * stride])
    rows = (ctypes.c_void_p * 1)(ctypes.cast(ctypes.byref(row), ctypes.c_void_p))
    if lib.jpeg_write_scanlines(ctypes.byref(cinfo), rows, 1) != 1:
        sys.exit(3)
lib.jpeg_finish_compress.argtypes = [ctypes.c_void_p]
lib.jpeg_finish_compress(ctypes.byref(cinfo))
sys.stdout.buffer.write(ctypes.string_at(outbuf, outsize.value))
"""


def encode_rgb(
    px: np.ndarray,
    quality: int = 90,
    progressive: bool = False,
    restart: int = 0,
    arith: bool = False,
    conditioning: tuple = (0, 1, 5),
    scan_script: str = "",
) -> bytes:
    """(h, w, 3) uint8 -> JPEG bytes via the system libjpeg (subprocess):
    genuine third-party streams for decode-conformance pinning."""
    h, w = px.shape[:2]
    p = subprocess.run(
        [sys.executable, "-c", _ENC_WORKER, str(w), str(h), str(quality),
         "1" if progressive else "0", str(restart), "1" if arith else "0",
         str(conditioning[0]), str(conditioning[1]), str(conditioning[2]),
         scan_script],
        input=np.ascontiguousarray(px).tobytes(),
        capture_output=True,
        timeout=60,
    )
    if p.returncode != 0:
        raise RuntimeError(f"libjpeg encode worker rc={p.returncode}: {p.stderr.decode()[:300]}")
    return p.stdout


def decode_rgb(blob: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w, C) uint8 via the system libjpeg (subprocess).
    Raises RuntimeError if libjpeg rejects the stream."""
    from vectorflow_spark.operators.jpegmini import jpeg_meta

    w, h, ncomp = jpeg_meta(blob)
    p = subprocess.run(
        [sys.executable, "-c", _WORKER, str(w), str(h), str(ncomp)],
        input=blob,
        capture_output=True,
        timeout=60,
    )
    if p.returncode != 0:
        raise RuntimeError(
            f"libjpeg worker failed rc={p.returncode}: {p.stderr.decode()[:300]}"
        )
    px = np.frombuffer(p.stdout, np.uint8)
    if px.size != w * h * ncomp:
        raise RuntimeError(f"libjpeg returned {px.size} bytes, wanted {w * h * ncomp}")
    return px.reshape(h, w, ncomp)
