"""ID3v2 tag framing (informal standard id3v2.3.0 / id3v2.4.0) — the
metadata container that fronts most crawled MP3s, and the third carrier
of embedded album art next to FLAC PICTURE blocks and Vorbis
METADATA_BLOCK_PICTURE comments (operators/albumart.py).

Scope and verification strategy (the WARC/Ogg-page precedent: framing
specs with deterministic writer + reader cross-verification; no codec
claims):

* **Framing only.** Header (``ID3`` + version + flags + synchsafe
  28-bit size), frame walk (4-char ids, v2.3 big-endian / v2.4
  synchsafe sizes, 2 flag bytes), padding, text frames in all four
  spec'd encodings (ISO-8859-1, UTF-16 w/ BOM, UTF-16BE, UTF-8), and
  APIC pictures (MIME + type + description + image bytes). The embedded
  image is verified END-TO-END by the album-art gates: the BMP payload
  decodes pixel-exact and dHash-joins against the image corpus.
* **Parse correctly or refuse.** Everything this module cannot verify
  refuses loudly instead of guessing: ID3v2.2 (3-char frame ids, a
  different layout), the unsynchronisation flag (a byte-stuffing layer
  we have no third-party stream corpus to pin against), extended
  headers, and per-frame compression/encryption/group flags. Every
  length field is bounds-checked; text refuses on undecodable bytes.
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
    "apic_frame",
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
    """Frames (id, body) -> a complete ID3v2.3/2.4 tag block (prepend to
    MP3 bytes). Frame sizes are synchsafe in v2.4 and plain big-endian
    in v2.3, exactly the split readers must honor."""
    if version not in (3, 4):
        raise ValueError("id3: only v2.3 and v2.4 are written")
    out = bytearray()
    for fid, body in frames:
        if len(fid) != 4 or not fid.isalnum() or not fid.isupper():
            raise ValueError(f"id3: bad frame id {fid!r}")
        if version == 3 and (fid[0] == "T" or fid == "APIC") and body[:1] == b"\x03":
            raise ValueError("id3: UTF-8 (encoding 3) is v2.4-only")
        size = _synchsafe(len(body)) if version == 4 else struct.pack(">I", len(body))
        out += fid.encode("ascii") + size + b"\x00\x00" + body
    out += bytes(padding)
    return b"ID3" + bytes([version, 0, 0]) + _synchsafe(len(out)) + bytes(out)


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
    if major == 2:
        raise NotImplementedError(
            "id3: ID3v2.2 (3-char frame layout) is not supported — "
            "re-tag to v2.3/v2.4"
        )
    if major not in (3, 4):
        raise ValueError(f"id3: unknown ID3v2.{major} version")
    if flags & 0x80:
        raise NotImplementedError(
            "id3: unsynchronised tags are not supported (no third-party "
            "corpus here to pin the de-stuffing against; module docstring)"
        )
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
    while pos < end:
        if data[pos] == 0:  # padding reaches to the end of the tag
            if any(data[pos:end]):
                raise ValueError("id3: non-zero bytes inside padding")
            padding = end - pos
            break
        if pos + 10 > end:
            raise ValueError("id3: truncated frame header")
        fid = data[pos : pos + 4]
        try:
            fid_s = fid.decode("ascii")
        except UnicodeDecodeError as e:
            raise ValueError(f"id3: non-ASCII frame id at byte {pos}") from e
        if not fid_s.isalnum() or not fid_s.isupper():
            raise ValueError(f"id3: malformed frame id {fid_s!r}")
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
        body_end = pos + 10 + fsize
        if body_end > end:
            raise ValueError(f"id3: frame {fid_s} size exceeds the tag")
        frames.append((fid_s, data[pos + 10 : body_end]))
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
    """Every APIC frame, parsed to the same dict shape as
    albumart.parse_picture_block (minus the dimension header fields,
    which APIC does not carry — decode the image for those)."""
    meta = data_or_meta if isinstance(data_or_meta, dict) else id3v2_meta(data_or_meta)
    out = []
    for fid, body in meta["frames"]:
        if fid != "APIC":
            continue
        if len(body) < 4:
            raise ValueError("id3: truncated APIC frame")
        enc = body[0]
        if enc not in _ENCODINGS:
            raise ValueError(f"id3: unknown text encoding {enc} in APIC")
        mime_end = body.find(b"\x00", 1)
        if mime_end < 0:
            raise ValueError("id3: unterminated APIC MIME string")
        mime = body[1:mime_end].decode("latin-1")
        pos = mime_end + 1
        if pos >= len(body):
            raise ValueError("id3: truncated APIC picture type")
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
                raise ValueError("id3: unterminated APIC description")
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
