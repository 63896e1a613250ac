"""EXIF metadata (CIPA DC-008, structured as TIFF 6.0 IFDs) — camera
orientation and provenance tags in the two containers that carry them:
TIFF itself (the tags live in IFD0) and JPEG (an APP1 segment wrapping
a self-contained TIFF structure).

Why a 100 TB image pipeline needs this: cameras store SENSOR pixels and
record how to display them in Orientation (tag 0x0112, values 1-8 —
the dihedral group of the rectangle). Perceptual hashes over raw stored
pixels therefore MISS duplicates that differ only by orientation;
``apply_exif_orientation`` normalizes to display orientation first, and
the q_exif_orientation gate proves the normalize-then-hash plan
recovers exactly the ground-truth duplicate pairs. Make/Model/DateTime
feed provenance filtering (dedup-by-burst, camera blacklists).

Verification strategy (the ID3/WARC framing class): no EXIF library
exists in this environment to pin against, so the writer and reader are
independent implementations cross-checked three ways — (1) the tagged
TIFFs still decode pixel-exact through tiffmini's libtiff-PINNED
decoder (unknown-tag tolerance is spec'd TIFF behavior), (2) the JPEG
APP1 insertion leaves jpegmini's libjpeg-pinned header walk and decode
untouched, (3) the orientation table's group structure (1-4,5,7
involutions; 6/8 mutual inverses) is asserted exhaustively in tests.
Parse-correctly-or-refuse: bounds-checked offsets, strict byte-order /
magic-42 checks; unknown tags and types are SKIPPED (spec behavior —
an unknown maker note must not reject a valid file), malformed
structure refuses.

Reference parity note: the reference pipeline (dgarnitz/vectorflow)
has no image handling; extension scope (SURVEY.md §2.13).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "apply_exif_orientation",
    "inverse_exif_orientation",
    "exif_meta",
    "tiff_add_exif",
    "build_exif_app1",
    "jpeg_add_exif",
]

_ORIENTATION = 0x0112
_MAKE = 0x010F
_MODEL = 0x0110
_DATETIME = 0x0132
_EXIF_IFD = 0x8769
_PIXEL_X = 0xA002
_PIXEL_Y = 0xA003

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


# ---------------------------------------------------------------------------
# Orientation transforms (EXIF tag 274 values 1-8; the table PIL's
# exif_transpose and libtiff's documentation publish). Stored pixels ->
# DISPLAY pixels.
# ---------------------------------------------------------------------------


def apply_exif_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Stored-pixel array -> display-oriented array (copy)."""
    o = int(orientation)
    if o == 1:
        return px.copy()
    if o == 2:
        return np.fliplr(px).copy()
    if o == 3:
        return np.rot90(px, 2).copy()
    if o == 4:
        return np.flipud(px).copy()
    if o == 5:  # transpose: flip across the main diagonal
        return np.swapaxes(px, 0, 1).copy()
    if o == 6:  # stored row 0 is the display's RIGHT edge: rotate 90 CW
        return np.rot90(px, 3).copy()
    if o == 7:  # transverse: flip across the anti-diagonal
        return np.rot90(np.swapaxes(px, 0, 1), 2).copy()
    if o == 8:  # rotate 90 CCW
        return np.rot90(px, 1).copy()
    raise ValueError(f"exif: orientation {orientation} outside 1..8")


def inverse_exif_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Display array -> stored array: what a camera writing ``orientation``
    would put in the file. 1-5 and 7 are involutions; 6 and 8 invert
    each other — asserted exhaustively in tests."""
    o = int(orientation)
    if o == 6:
        return apply_exif_orientation(px, 8)
    if o == 8:
        return apply_exif_orientation(px, 6)
    return apply_exif_orientation(px, o)


# ---------------------------------------------------------------------------
# IFD reader (strict bounds; ASCII decoded, unknown tags skipped)
# ---------------------------------------------------------------------------


def _parse_tiff_structure(data: bytes) -> dict:
    if len(data) < 8:
        raise ValueError("exif: truncated TIFF header")
    if data[:2] == b"II":
        order = "<"
    elif data[:2] == b"MM":
        order = ">"
    else:
        raise ValueError("exif: bad TIFF byte-order mark")
    (magic,) = struct.unpack_from(order + "H", data, 2)
    if magic != 42:
        raise ValueError(f"exif: TIFF magic {magic} != 42")
    (ifd0,) = struct.unpack_from(order + "I", data, 4)

    def read_ifd(off: int) -> dict[int, tuple[int, bytes]]:
        if off + 2 > len(data):
            raise ValueError("exif: IFD offset out of bounds")
        (n,) = struct.unpack_from(order + "H", data, off)
        if off + 2 + 12 * n + 4 > len(data):
            raise ValueError("exif: truncated IFD entry table")
        out: dict[int, tuple[int, bytes]] = {}
        for k in range(n):
            e = off + 2 + 12 * k
            tag, typ, count = struct.unpack_from(order + "HHI", data, e)
            size = _TYPE_SIZES.get(typ)
            if size is None:
                continue  # unknown type: skip per spec
            total = size * count
            if total <= 4:
                raw = data[e + 8 : e + 8 + total]
            else:
                (voff,) = struct.unpack_from(order + "I", data, e + 8)
                if voff + total > len(data):
                    raise ValueError(f"exif: tag 0x{tag:04x} value offset out of bounds")
                raw = data[voff : voff + total]
            out[tag] = (typ, raw)
        return out

    def short_or_long(entry: tuple[int, bytes] | None) -> int | None:
        if entry is None:
            return None
        typ, raw = entry
        if typ == 3:
            return struct.unpack(order + "H", raw[:2])[0]
        if typ == 4:
            return struct.unpack(order + "I", raw[:4])[0]
        return None

    def ascii_tag(entry: tuple[int, bytes] | None) -> str | None:
        if entry is None:
            return None
        typ, raw = entry
        if typ != 2:
            return None
        return raw.split(b"\x00", 1)[0].decode("ascii", errors="strict")

    ifd = read_ifd(ifd0)
    meta: dict = {
        "byte_order": "little" if order == "<" else "big",
        "orientation": short_or_long(ifd.get(_ORIENTATION)) or 1,
        "make": ascii_tag(ifd.get(_MAKE)),
        "model": ascii_tag(ifd.get(_MODEL)),
        "datetime": ascii_tag(ifd.get(_DATETIME)),
        "pixel_x": None,
        "pixel_y": None,
    }
    if not 1 <= meta["orientation"] <= 8:
        raise ValueError(f"exif: orientation {meta['orientation']} outside 1..8")
    exif_ptr = short_or_long(ifd.get(_EXIF_IFD))
    if exif_ptr is not None:
        sub = read_ifd(exif_ptr)
        meta["pixel_x"] = short_or_long(sub.get(_PIXEL_X))
        meta["pixel_y"] = short_or_long(sub.get(_PIXEL_Y))
    return meta


def exif_meta(data: bytes) -> dict:
    """JPEG (APP1) or TIFF bytes -> EXIF dict ``{byte_order, orientation,
    make, model, datetime, pixel_x, pixel_y}``. Orientation defaults to 1
    when untagged. A JPEG without any APP1 Exif segment returns the same
    defaults (orientation-normalization is then the identity)."""
    data = bytes(data)
    if data[:2] in (b"II", b"MM"):
        return _parse_tiff_structure(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("exif: not a TIFF or JPEG stream")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"exif: bad JPEG marker alignment at byte {pos}")
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # start of scan: no EXIF past here
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if seglen < 2 or pos + 2 + seglen > n:
            raise ValueError(f"exif: truncated JPEG segment at byte {pos}")
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return _parse_tiff_structure(data[pos + 10 : pos + 2 + seglen])
        pos += 2 + seglen
    return {
        "byte_order": None,
        "orientation": 1,
        "make": None,
        "model": None,
        "datetime": None,
        "pixel_x": None,
        "pixel_y": None,
    }


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------


def _ifd_block(
    order: str,
    entries: list[tuple[int, int, int, bytes]],
    base: int,
) -> bytes:
    """Serialize (tag, type, count, value-bytes) entries into an IFD at
    absolute offset ``base``: entry table first (ascending tag order, as
    TIFF 6.0 requires), out-of-line values appended after the next-IFD
    pointer."""
    entries = sorted(entries)
    table = struct.pack(order + "H", len(entries))
    tail = b""
    tail_off = base + 2 + 12 * len(entries) + 4
    for tag, typ, count, raw in entries:
        if len(raw) <= 4:
            val = raw.ljust(4, b"\x00")
        else:
            val = struct.pack(order + "I", tail_off + len(tail))
            tail += raw
        table += struct.pack(order + "HHI", tag, typ, count) + val
    return table + struct.pack(order + "I", 0) + tail


def _exif_entries(
    order: str,
    orientation: int,
    make: str | None,
    model: str | None,
    datetime: str | None,
) -> list[tuple[int, int, int, bytes]]:
    if not 1 <= orientation <= 8:
        raise ValueError(f"exif: orientation {orientation} outside 1..8")
    out = [(_ORIENTATION, 3, 1, struct.pack(order + "H", orientation))]
    for tag, text in ((_MAKE, make), (_MODEL, model), (_DATETIME, datetime)):
        if text is not None:
            raw = text.encode("ascii") + b"\x00"
            out.append((tag, 2, len(raw), raw))
    return out


def tiff_add_exif(
    tiff: bytes,
    orientation: int = 1,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
) -> bytes:
    """Append EXIF tags to an existing single-IFD TIFF (e.g. a
    tiffmini.encode_tiff output) WITHOUT disturbing image bytes: the
    original IFD's entries are re-serialized together with the new tags
    into a fresh IFD at EOF and the header pointer is patched — every
    existing out-of-line value keeps its original offset, so the image
    strips are byte-identical and the result still decodes through the
    libtiff-pinned tiffmini reader."""
    data = bytes(tiff)
    if data[:2] == b"II":
        order = "<"
    elif data[:2] == b"MM":
        order = ">"
    else:
        raise ValueError("exif: bad TIFF byte-order mark")
    (ifd0,) = struct.unpack_from(order + "I", data, 4)
    (n,) = struct.unpack_from(order + "H", data, ifd0)
    if ifd0 + 2 + 12 * n + 4 > len(data):
        raise ValueError("exif: truncated IFD entry table")
    entries: list[tuple[int, int, int, bytes]] = []
    new_tags = {_ORIENTATION, _MAKE, _MODEL, _DATETIME}
    for k in range(n):
        e = ifd0 + 2 + 12 * k
        tag, typ, count = struct.unpack_from(order + "HHI", data, e)
        if tag in new_tags:
            continue  # replaced below
        size = _TYPE_SIZES.get(typ)
        total = None if size is None else size * count
        if total is not None and total <= 4:
            entries.append((tag, typ, count, data[e + 8 : e + 8 + total]))
        else:
            # out-of-line (or unknown-size) value: keep the ORIGINAL
            # absolute offset bytes — the value body is not moved
            entries.append((tag, typ, count, None))  # type: ignore[arg-type]
    base = len(data)
    ents = []
    for tag, typ, count, raw in entries:
        if raw is None:
            e_src = next(
                ifd0 + 2 + 12 * k
                for k in range(n)
                if struct.unpack_from(order + "HHI", data, ifd0 + 2 + 12 * k)[0] == tag
            )
            ents.append((tag, typ, count, data[e_src + 8 : e_src + 12], True))
        else:
            ents.append((tag, typ, count, raw, False))
    for tag, typ, count, raw in _exif_entries(order, orientation, make, model, datetime):
        ents.append((tag, typ, count, raw, False))
    # serialize with pass-through offsets preserved verbatim
    ents.sort(key=lambda t: t[0])
    table = struct.pack(order + "H", len(ents))
    tail = b""
    tail_off = base + 2 + 12 * len(ents) + 4
    for tag, typ, count, raw, passthrough in ents:
        if passthrough or len(raw) <= 4:
            val = raw.ljust(4, b"\x00")
        else:
            val = struct.pack(order + "I", tail_off + len(tail))
            tail += raw
        table += struct.pack(order + "HHI", tag, typ, count) + val
    block = table + struct.pack(order + "I", 0) + tail
    out = bytearray(data)
    struct.pack_into(order + "I", out, 4, base)
    return bytes(out) + block


def build_exif_app1(
    orientation: int = 1,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    byte_order: str = "little",
) -> bytes:
    """A complete JPEG APP1 segment (marker + length + ``Exif\\0\\0`` +
    self-contained TIFF structure with IFD0 and, when dimensions are
    given, an Exif sub-IFD carrying PixelX/YDimension)."""
    order = "<" if byte_order == "little" else ">"
    bom = b"II" if order == "<" else b"MM"
    head = bom + struct.pack(order + "H", 42) + struct.pack(order + "I", 8)
    entries = _exif_entries(order, orientation, make, model, datetime)
    sub = b""
    if pixel_x is not None or pixel_y is not None:
        # IFD0 size must be known to place the sub-IFD after it; compute
        # with the pointer entry included
        n0 = len(entries) + 1
        probe = _ifd_block(order, entries + [(_EXIF_IFD, 4, 1, b"\x00\x00\x00\x00")], 8)
        sub_off = 8 + len(probe)
        sub_entries = []
        if pixel_x is not None:
            sub_entries.append((_PIXEL_X, 4, 1, struct.pack(order + "I", pixel_x)))
        if pixel_y is not None:
            sub_entries.append((_PIXEL_Y, 4, 1, struct.pack(order + "I", pixel_y)))
        sub = _ifd_block(order, sub_entries, sub_off)
        entries = entries + [(_EXIF_IFD, 4, 1, struct.pack(order + "I", sub_off))]
        assert n0 == len(entries)
    tiff = head + _ifd_block(order, entries, 8) + sub
    payload = b"Exif\x00\x00" + tiff
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("exif: APP1 payload exceeds the 64 KB segment bound")
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def jpeg_add_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Insert a built APP1 segment right after SOI — where cameras put
    it. The entropy stream and every other segment are untouched, so
    jpegmini's libjpeg-pinned decode is byte-identical."""
    data = bytes(jpeg)
    if data[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG stream")
    if app1[:2] != b"\xff\xe1":
        raise ValueError("exif: not an APP1 segment")
    return data[:2] + app1 + data[2:]
