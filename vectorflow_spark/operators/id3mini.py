"""ID3v2 tag framing (informal standard id3v2.3.0 / id3v2.4.0) — the
metadata container that fronts most crawled MP3s, and the third carrier
of embedded album art next to FLAC PICTURE blocks and Vorbis
METADATA_BLOCK_PICTURE comments (operators/albumart.py).

Scope and verification strategy (the WARC/Ogg-page precedent: framing
specs with deterministic writer + reader cross-verification; no codec
claims):

* **Framing only.** Header (``ID3`` + version + flags + synchsafe
  28-bit size), frame walk (v2.3 4-char ids + big-endian sizes, v2.4
  synchsafe sizes, v2.2 3-char ids + 3-byte sizes with no flag bytes),
  padding, text frames in all four spec'd encodings (ISO-8859-1, UTF-16
  w/ BOM, UTF-16BE, UTF-8; v2.2 restricted to its two), and attached
  pictures both ways — APIC (MIME string) and the v2.2 PIC (3-char
  image format). The embedded image is verified END-TO-END by the
  album-art gates: the BMP payload decodes pixel-exact and dHash-joins
  against the image corpus.
* **Parse correctly or refuse.** Everything this module cannot verify
  refuses loudly instead of guessing: the unsynchronisation flag (a
  byte-stuffing layer we have no third-party stream corpus to pin
  against), extended headers, v2.2 compressed tags, and per-frame
  compression/encryption/group flags. Every length field is
  bounds-checked; text refuses on undecodable bytes.
* ``codecs.mp3_meta`` already SKIPS a leading ID3v2 tag by the same
  synchsafe arithmetic; this module parses what that walker hops over,
  and the q_id3_meta gate drives both against one fixture so the two
  implementations cross-check (tag size consumed == audio offset).

Reference parity note: the reference pipeline (dgarnitz/vectorflow)
has no audio/metadata handling; extension scope (SURVEY.md §2.13).
"""

from __future__ import annotations

import struct

__all__ = [
    "build_id3v2",
    "text_frame",
    "text_frame_v22",
    "apic_frame",
    "pic_frame_v22",
    "id3v2_meta",
    "id3_text",
    "id3_pictures",
]

_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}
_TERMINATOR = {0: b"\x00", 1: b"\x00\x00", 2: b"\x00\x00", 3: b"\x00"}


def _synchsafe(n: int) -> bytes:
    if not 0 <= n < 1 << 28:
        raise ValueError("id3: size does not fit a 28-bit synchsafe field")
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _read_synchsafe(raw: bytes, what: str) -> int:
    n = 0
    for b in raw:
        if b & 0x80:
            raise ValueError(f"id3: invalid synchsafe byte in {what}")
        n = (n << 7) | b
    return n


def text_frame(frame_id: str, text: str, encoding: int = 3) -> tuple[str, bytes]:
    """A T??? text-information frame body: encoding byte + encoded text
    (id3v2.4.0-structure §4.2). No trailing NUL — readers must cope with
    both forms and ours strips it."""
    if encoding not in _ENCODINGS:
        raise ValueError(f"id3: unknown text encoding {encoding}")
    if not (len(frame_id) == 4 and frame_id[0] == "T" and frame_id.isalnum()):
        raise ValueError(f"id3: {frame_id!r} is not a text frame id")
    return frame_id, bytes([encoding]) + text.encode(_ENCODINGS[encoding])


def apic_frame(
    image: bytes,
    mime: str = "image/bmp",
    picture_type: int = 3,
    description: str = "",
    encoding: int = 0,
) -> tuple[str, bytes]:
    """An APIC attached-picture frame body (id3v2.4.0-frames §4.14):
    encoding + NUL-terminated latin-1 MIME + type byte + NUL-terminated
    description (in ``encoding``) + raw image bytes."""
    if encoding not in _ENCODINGS:
        raise ValueError(f"id3: unknown text encoding {encoding}")
    if not 0 <= picture_type <= 20:
        raise ValueError(f"id3: picture type {picture_type} outside 0..20")
    body = (
        bytes([encoding])
        + mime.encode("latin-1")
        + b"\x00"
        + bytes([picture_type])
        + description.encode(_ENCODINGS[encoding])
        + _TERMINATOR[encoding]
        + bytes(image)
    )
    return "APIC", body


def build_id3v2(
    frames: list[tuple[str, bytes]],
    version: int = 4,
    padding: int = 0,
) -> bytes:
    """Frames (id, body) -> a complete ID3v2.2/2.3/2.4 tag block (prepend
    to MP3 bytes). Frame sizes are synchsafe in v2.4, plain big-endian in
    v2.3, and 3-byte big-endian with 3-char ids and no flag bytes in
    v2.2 — exactly the splits readers must honor."""
    if version not in (2, 3, 4):
        raise ValueError("id3: only v2.2, v2.3 and v2.4 are written")
    id_len = 3 if version == 2 else 4
    out = bytearray()
    for fid, body in frames:
        if len(fid) != id_len or not fid.isalnum() or not fid.isupper():
            raise ValueError(f"id3: bad v2.{version} frame id {fid!r}")
        if version == 2 and (fid[0] == "T" or fid == "PIC") and body[:1] in (b"\x02", b"\x03"):
            raise ValueError("id3: v2.2 text encodings are 0 (latin-1) and 1 (UCS-2) only")
        if version == 3 and (fid[0] == "T" or fid == "APIC") and body[:1] == b"\x03":
            raise ValueError("id3: UTF-8 (encoding 3) is v2.4-only")
        if version == 2:
            if len(body) >= 1 << 24:
                raise ValueError("id3: v2.2 frame body exceeds the 24-bit size field")
            out += fid.encode("ascii") + struct.pack(">I", len(body))[1:] + body
        else:
            size = _synchsafe(len(body)) if version == 4 else struct.pack(">I", len(body))
            out += fid.encode("ascii") + size + b"\x00\x00" + body
    out += bytes(padding)
    return b"ID3" + bytes([version, 0, 0]) + _synchsafe(len(out)) + bytes(out)


def text_frame_v22(frame_id: str, text: str, encoding: int = 0) -> tuple[str, bytes]:
    """A v2.2 T?? text frame body (id3v2-00 §4.2): encoding byte +
    encoded text; encodings 0 (latin-1) and 1 (UCS-2 with BOM) only."""
    if encoding not in (0, 1):
        raise ValueError("id3: v2.2 text encodings are 0 (latin-1) and 1 (UCS-2) only")
    if not (len(frame_id) == 3 and frame_id[0] == "T" and frame_id.isalnum()):
        raise ValueError(f"id3: {frame_id!r} is not a v2.2 text frame id")
    return frame_id, bytes([encoding]) + text.encode(_ENCODINGS[encoding])


_PIC_FORMATS = {"BMP": "image/bmp", "PNG": "image/png", "JPG": "image/jpeg", "GIF": "image/gif"}


def pic_frame_v22(
    image: bytes,
    image_format: str = "BMP",
    picture_type: int = 3,
    description: str = "",
    encoding: int = 0,
) -> tuple[str, bytes]:
    """A v2.2 PIC attached-picture frame body (id3v2-00 §4.15): encoding
    + 3-char image format (NOT a MIME string — the v2.2/v2.3 split PIC
    readers must honor) + type byte + NUL-terminated description + image
    bytes."""
    if encoding not in (0, 1):
        raise ValueError("id3: v2.2 text encodings are 0 (latin-1) and 1 (UCS-2) only")
    if image_format not in _PIC_FORMATS:
        raise ValueError(f"id3: unknown v2.2 image format {image_format!r}")
    if not 0 <= picture_type <= 20:
        raise ValueError(f"id3: picture type {picture_type} outside 0..20")
    body = (
        bytes([encoding])
        + image_format.encode("ascii")
        + bytes([picture_type])
        + description.encode(_ENCODINGS[encoding])
        + _TERMINATOR[encoding]
        + bytes(image)
    )
    return "PIC", body


def id3v2_meta(data: bytes) -> dict:
    """MP3/standalone bytes starting with an ID3v2 tag -> parsed tag:
    ``{version, tag_size, frames: [(id, body bytes), ...], n_frames,
    padding}``. ``tag_size`` is the full block length including the
    10-byte header — the offset where audio begins, the same number
    codecs.mp3_meta hops by."""
    data = bytes(data)
    if data[:3] != b"ID3":
        raise ValueError("id3: missing ID3 magic")
    if len(data) < 10:
        raise ValueError("id3: truncated header")
    major, rev, flags = data[3], data[4], data[5]
    if major not in (2, 3, 4):
        raise ValueError(f"id3: unknown ID3v2.{major} version")
    if flags & 0x80:
        raise NotImplementedError(
            "id3: unsynchronised tags are not supported (no third-party "
            "corpus here to pin the de-stuffing against; module docstring)"
        )
    if major == 2:
        # v2.2 header flags: bit 6 = compression ("since no compression
        # scheme has been decided", id3v2-00 §3.1 — refuse)
        if flags & 0x40:
            raise NotImplementedError("id3: ID3v2.2 compressed tags are not supported")
        if flags & 0x3F:
            raise ValueError(f"id3: undefined v2.2 header flags 0x{flags:02x}")
    else:
        if flags & 0x40:
            raise NotImplementedError("id3: extended headers are not supported")
        if flags & 0x3F and not (major == 4 and flags == 0x10):
            raise ValueError(f"id3: undefined header flags 0x{flags:02x}")
    size = _read_synchsafe(data[6:10], "tag size")
    end = 10 + size
    if len(data) < end:
        raise ValueError("id3: declared tag size exceeds the data")
    footer = 10 if major == 4 and flags & 0x10 else 0
    pos = 10
    frames: list[tuple[str, bytes]] = []
    padding = 0
    id_len, hdr_len = (3, 6) if major == 2 else (4, 10)
    while pos < end:
        if data[pos] == 0:  # padding reaches to the end of the tag
            if any(data[pos:end]):
                raise ValueError("id3: non-zero bytes inside padding")
            padding = end - pos
            break
        if pos + hdr_len > end:
            raise ValueError("id3: truncated frame header")
        fid = data[pos : pos + id_len]
        try:
            fid_s = fid.decode("ascii")
        except UnicodeDecodeError as e:
            raise ValueError(f"id3: non-ASCII frame id at byte {pos}") from e
        if not fid_s.isalnum() or not fid_s.isupper():
            raise ValueError(f"id3: malformed frame id {fid_s!r}")
        if major == 2:
            # v2.2 frame header: 3-char id + 3-byte big-endian size, no flags
            b = data[pos + 3 : pos + 6]
            fsize = (b[0] << 16) | (b[1] << 8) | b[2]
        else:
            if major == 4:
                fsize = _read_synchsafe(data[pos + 4 : pos + 8], f"frame {fid_s} size")
            else:
                (fsize,) = struct.unpack_from(">I", data, pos + 4)
            fflags = struct.unpack_from(">H", data, pos + 8)[0]
            if fflags:
                raise NotImplementedError(
                    f"id3: frame {fid_s} uses flags 0x{fflags:04x} "
                    "(compression/encryption/grouping/unsync are unsupported)"
                )
        body_end = pos + hdr_len + fsize
        if body_end > end:
            raise ValueError(f"id3: frame {fid_s} size exceeds the tag")
        frames.append((fid_s, data[pos + hdr_len : body_end]))
        pos = body_end
    return {
        "version": f"2.{major}.{rev}",
        "tag_size": end + footer,
        "frames": frames,
        "n_frames": len(frames),
        "padding": padding,
    }


def _decode_text(body: bytes, what: str) -> str:
    if not body:
        raise ValueError(f"id3: empty {what} body")
    enc = body[0]
    if enc not in _ENCODINGS:
        raise ValueError(f"id3: unknown text encoding {enc} in {what}")
    raw = body[1:]
    term = _TERMINATOR[enc]
    if raw.endswith(term):  # optional trailing terminator
        raw = raw[: len(raw) - len(term)]
    return raw.decode(_ENCODINGS[enc])


def id3_text(data_or_meta, frame_id: str) -> str | None:
    """The decoded text of the first ``frame_id`` frame, or None."""
    meta = data_or_meta if isinstance(data_or_meta, dict) else id3v2_meta(data_or_meta)
    for fid, body in meta["frames"]:
        if fid == frame_id:
            return _decode_text(body, frame_id)
    return None


def id3_pictures(data_or_meta) -> list[dict]:
    """Every attached picture — APIC (v2.3/v2.4) or PIC (v2.2, whose
    3-char image format maps to the MIME the APIC shape carries) —
    parsed to the same dict shape as albumart.parse_picture_block
    (minus the dimension header fields, which ID3 does not carry —
    decode the image for those)."""
    meta = data_or_meta if isinstance(data_or_meta, dict) else id3v2_meta(data_or_meta)
    out = []
    for fid, body in meta["frames"]:
        if fid not in ("APIC", "PIC"):
            continue
        if len(body) < (6 if fid == "PIC" else 4):
            raise ValueError(f"id3: truncated {fid} frame")
        enc = body[0]
        if enc not in _ENCODINGS:
            raise ValueError(f"id3: unknown text encoding {enc} in {fid}")
        if fid == "PIC":
            fmt = body[1:4].decode("latin-1")
            if fmt not in _PIC_FORMATS:
                raise ValueError(f"id3: unknown PIC image format {fmt!r}")
            mime = _PIC_FORMATS[fmt]
            pos = 4
        else:
            mime_end = body.find(b"\x00", 1)
            if mime_end < 0:
                raise ValueError("id3: unterminated APIC MIME string")
            mime = body[1:mime_end].decode("latin-1")
            pos = mime_end + 1
        if pos >= len(body):
            raise ValueError(f"id3: truncated {fid} picture type")
        ptype = body[pos]
        if ptype > 20:
            raise ValueError(f"id3: picture type {ptype} outside 0..20")
        pos += 1
        term = _TERMINATOR[enc]
        # description terminator: scan on the encoding's unit width so a
        # UTF-16 code unit containing 0x00 bytes is not split mid-char
        unit = len(term)
        dpos = pos
        while True:
            if dpos + unit > len(body):
                raise ValueError(f"id3: unterminated {fid} description")
            if body[dpos : dpos + unit] == term:
                break
            dpos += unit
        desc = body[pos:dpos].decode(_ENCODINGS[enc])
        out.append(
            {
                "picture_type": ptype,
                "mime": mime,
                "description": desc,
                "data": bytes(body[dpos + unit :]),
            }
        )
    return out
