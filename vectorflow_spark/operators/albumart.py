"""Embedded album art — the PICTURE structure shared by FLAC and Ogg.

One binary layout appears twice in the wild (RFC 9639 §8.8):

* as FLAC metadata block type 6 (``PICTURE``) inside native ``.flac``;
* base64-encoded as the Vorbis comment tag ``METADATA_BLOCK_PICTURE=``
  — the mechanism Ogg Vorbis, Ogg Opus (OpusTags, RFC 7845 §5.2.1) and
  Ogg FLAC all use, since none of their comment headers has a binary
  picture field.

Layout (all integers 32-bit big-endian)::

    picture_type | mime_len | mime (ASCII) | desc_len | desc (UTF-8)
    | width | height | depth | n_colors | data_len | data

Why this module exists: album art is the highest-volume CROSS-MODAL
duplicate channel in crawled audio — the same cover image rides inside
millions of audio containers AND circulates as standalone image files.
A 100 TB curation pipeline dedups across that boundary by extracting
the embedded picture, hashing its PIXELS (multimodal.image_dhash), and
joining against the image corpus's hashes (gate q_albumart_dedup).

Parse-correctly-or-refuse: every length field is bounds-checked, the
picture type range (0-20, RFC 9639 table) is enforced, base64 tags must
decode strictly, and a structure with trailing garbage refuses — a
malformed length in attacker-controlled crawl data must never read out
of bounds or silently mis-slice the image bytes.

Reference parity note: the reference pipeline (dgarnitz/vectorflow) has
no audio handling; this is extension scope (SURVEY.md §2.13 multimodal).
"""

from __future__ import annotations

import base64
import struct

__all__ = [
    "build_picture_block",
    "parse_picture_block",
    "flac_pictures",
    "add_flac_picture",
    "ogg_pictures",
    "picture_comment_tag",
]

_MAX_PICTURE_TYPE = 20  # RFC 9639 §8.8: 0 (other) .. 20 (publisher logo)


def build_picture_block(
    data: bytes,
    mime: str,
    width: int,
    height: int,
    depth: int = 24,
    picture_type: int = 3,  # front cover
    description: str = "",
    n_colors: int = 0,
) -> bytes:
    """The raw PICTURE structure (no FLAC block header, no base64)."""
    if not 0 <= picture_type <= _MAX_PICTURE_TYPE:
        raise ValueError(f"picture: type {picture_type} outside 0..{_MAX_PICTURE_TYPE}")
    mime_b = mime.encode("ascii")
    desc_b = description.encode("utf-8")
    return b"".join(
        [
            struct.pack(">I", picture_type),
            struct.pack(">I", len(mime_b)),
            mime_b,
            struct.pack(">I", len(desc_b)),
            desc_b,
            struct.pack(">IIII", width, height, depth, n_colors),
            struct.pack(">I", len(data)),
            bytes(data),
        ]
    )


def parse_picture_block(buf: bytes) -> dict:
    """Raw PICTURE structure -> dict; refuses on any malformation."""
    buf = bytes(buf)

    def take(n: int, pos: int, what: str) -> tuple[bytes, int]:
        if pos + n > len(buf):
            raise ValueError(f"picture: truncated {what}")
        return buf[pos : pos + n], pos + n

    raw, pos = take(4, 0, "picture type")
    (ptype,) = struct.unpack(">I", raw)
    if ptype > _MAX_PICTURE_TYPE:
        raise ValueError(f"picture: type {ptype} outside 0..{_MAX_PICTURE_TYPE}")
    raw, pos = take(4, pos, "mime length")
    (mlen,) = struct.unpack(">I", raw)
    raw, pos = take(mlen, pos, "mime string")
    try:
        mime = raw.decode("ascii")
    except UnicodeDecodeError as e:
        raise ValueError("picture: MIME type is not ASCII") from e
    if any(c < "\x20" or c > "\x7e" for c in mime):
        raise ValueError("picture: MIME type has non-printable bytes")
    raw, pos = take(4, pos, "description length")
    (dlen,) = struct.unpack(">I", raw)
    raw, pos = take(dlen, pos, "description")
    desc = raw.decode("utf-8")  # strict: spec says UTF-8
    raw, pos = take(16, pos, "dimension fields")
    width, height, depth, n_colors = struct.unpack(">IIII", raw)
    raw, pos = take(4, pos, "data length")
    (datalen,) = struct.unpack(">I", raw)
    data, pos = take(datalen, pos, "picture data")
    if pos != len(buf):
        raise ValueError(f"picture: {len(buf) - pos} trailing bytes after data")
    return {
        "picture_type": ptype,
        "mime": mime,
        "description": desc,
        "width": width,
        "height": height,
        "depth": depth,
        "n_colors": n_colors,
        "data": data,
    }


def flac_pictures(flac_bytes: bytes) -> list[dict]:
    """Every PICTURE metadata block (type 6) of a native FLAC file, in
    stream order. The block walk reuses STREAMINFO's framing rules: a
    declared block length past EOF refuses before any picture parsing."""
    from vectorflow_spark.operators.flacmini import FLAC_MAGIC

    data = bytes(flac_bytes)
    if data[:4] != FLAC_MAGIC:
        raise ValueError("flac: bad magic")
    out = []
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata block header")
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("flac: truncated metadata block body")
        if hdr & 0x7F == 6:
            out.append(parse_picture_block(body))
        pos += 4 + length
        if hdr & 0x80:
            break
    return out


def add_flac_picture(flac_bytes: bytes, picture: bytes) -> bytes:
    """Insert a PICTURE block (raw structure from build_picture_block)
    right after STREAMINFO, preserving the last-metadata-block chain:
    the flag moves to the new block only when STREAMINFO was last."""
    from vectorflow_spark.operators.flacmini import FLAC_MAGIC

    data = bytes(flac_bytes)
    if data[:4] != FLAC_MAGIC:
        raise ValueError("flac: bad magic")
    if len(data) < 8:
        raise ValueError("flac: truncated metadata block header")
    hdr = data[4]
    if hdr & 0x7F != 0:
        raise ValueError("flac: first metadata block is not STREAMINFO")
    length = int.from_bytes(data[5:8], "big")
    end = 8 + length
    if len(data) < end:
        raise ValueError("flac: truncated metadata block body")
    was_last = bool(hdr & 0x80)
    if len(picture) >= 1 << 24:
        raise ValueError("flac: picture block exceeds the 24-bit length field")
    block = bytes([(0x80 if was_last else 0) | 6]) + len(picture).to_bytes(3, "big") + picture
    return data[:4] + bytes([hdr & 0x7F]) + data[5:end] + block + data[end:]


def picture_comment_tag(picture: bytes) -> str:
    """The Vorbis comment tag carrying a picture (base64 of the raw
    structure) — pass to build_ogg_opus/build_ogg_vorbis/build_ogg_flac
    ``tags``."""
    return "METADATA_BLOCK_PICTURE=" + base64.b64encode(bytes(picture)).decode("ascii")


def ogg_pictures(ogg_bytes: bytes) -> list[dict]:
    """Every METADATA_BLOCK_PICTURE in an Ogg file's comment header
    (Opus, Vorbis or FLAC mapping), parsed and validated. Base64 decodes
    STRICTLY (validate=True): a corrupted tag refuses rather than
    silently dropping 6 bits in 8."""
    from vectorflow_spark.operators.oggmini import (
        _parse_comment_block,
        ogg_packets,
        ogg_pages,
    )

    packets = ogg_packets(ogg_pages(ogg_bytes))
    if not packets:
        raise ValueError("ogg: no packets")
    first = packets[0]
    if len(packets) < 2:
        raise ValueError("ogg: missing comment header packet")
    cmt = packets[1]
    if first.startswith(b"OpusHead"):
        if not cmt.startswith(b"OpusTags"):
            raise ValueError("ogg: missing OpusTags packet")
        off = 8
    elif first.startswith(b"\x01vorbis"):
        if not cmt.startswith(b"\x03vorbis"):
            raise ValueError("ogg: missing Vorbis comment header")
        off = 7
    elif first.startswith(b"\x7fFLAC"):
        if len(cmt) < 4 or cmt[0] & 0x7F != 4:
            raise ValueError("ogg: first FLAC header packet is not a Vorbis comment")
        off = 4
    else:
        raise ValueError("ogg: unrecognized first packet (not Opus/Vorbis/FLAC)")
    _vendor, _n, tags = _parse_comment_block(cmt, off, "comment")
    out = []
    for tag in tags:
        key, sep, value = tag.partition(b"=")
        if not sep or key.upper() != b"METADATA_BLOCK_PICTURE":
            continue
        try:
            raw = base64.b64decode(value, validate=True)
        except (ValueError, TypeError) as e:
            raise ValueError("ogg: METADATA_BLOCK_PICTURE is not valid base64") from e
        out.append(parse_picture_block(raw))
    return out
