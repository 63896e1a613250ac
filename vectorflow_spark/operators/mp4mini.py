"""MP4 / ISO-BMFF (ISO 14496-12) HEADER-ONLY metadata: a box walk over
ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/stbl/stsd/stsz — duration, track
count, per-track codec fourcc, video dimensions, sample counts — without
touching a single coded sample. This is the q_mp3_meta pattern for
video: real-crawl video ingest can classify, route and dedup-by-metadata
MP4 files even though SAMPLE decode (H.264/AAC...) genuinely needs
external libraries and keeps refusing loudly (codecs.decode_video).

Covers both box-size forms (32-bit and ``size==1`` 64-bit largesize) and
both mvhd/mdhd/tkhd versions (0: 32-bit times, 1: 64-bit). A
deterministic skeleton writer (``build_mp4``) provides spec-shaped
fixtures so the parser is pinned on hand-built files.

Reference parity: the vectorflow reference has no video handling at all
(client-side images only, README.md:49); extension scope for the
multimodal ingest surface (SURVEY.md §2.13).
"""

from __future__ import annotations

import struct

_HANDLER_KIND = {b"vide": "video", b"soun": "audio"}


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, header_size, body_start, body_end) for each box in
    [start, end); validates sizes so malformed input raises ValueError."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"mp4: bad box size {size} for {fourcc!r}")
        yield fourcc, hdr, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError("mp4: trailing bytes after last box")


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, _hdr, a, b in _iter_boxes(data, start, end):
        if fc == fourcc:
            return a, b
    return None


def _full_box(data: bytes, pos: int) -> tuple[int, int]:
    """(version, position after version/flags) of a full box body."""
    return data[pos], pos + 4


def _times(data: bytes, pos: int, version: int, n32: int) -> list[int]:
    """Read creation/modification/timescale/duration with the version-0
    (32-bit) or version-1 (64-bit times, 32-bit timescale) layout.
    Returns [timescale, duration] with ``n32`` = index of timescale."""
    if version == 1:
        # 64, 64, 32 (timescale), 64 (duration)
        ts = struct.unpack_from(">I", data, pos + 16)[0]
        dur = struct.unpack_from(">Q", data, pos + 20)[0]
    else:
        ts = struct.unpack_from(">I", data, pos + 8)[0]
        dur = struct.unpack_from(">I", data, pos + 12)[0]
    return [ts, dur]


def mp4_meta(data: bytes) -> dict:
    """ISO-BMFF bytes -> header metadata dict:

    ``{"kind", "major_brand", "duration_ms", "n_tracks", "tracks": [
    {"kind", "codec", "timescale", "duration", "n_samples", "width",
    "height"}], "width", "height", "n_bytes"}`` — width/height at the
    top level come from the first video track; ``kind`` is "video" when
    any video track exists, else "audio"."""
    data = bytes(data)
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("mp4: no ftyp box at start")
    major = data[8:12].decode("latin-1")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box")
    ma, mb = moov
    mvhd = _find(data, ma, mb, b"mvhd")
    if mvhd is None:
        raise ValueError("mp4: no mvhd box")
    ver, pos = _full_box(data, mvhd[0])
    ts, dur = _times(data, pos, ver, 2)
    if ts == 0:
        raise ValueError("mp4: zero movie timescale")

    tracks = []
    for fc, _hdr, a, b in _iter_boxes(data, ma, mb):
        if fc != b"trak":
            continue
        trk: dict = {
            "kind": "unknown", "codec": None, "timescale": None,
            "duration": None, "n_samples": None, "width": None, "height": None,
        }
        tkhd = _find(data, a, b, b"tkhd")
        if tkhd is not None:
            tver, tpos = _full_box(data, tkhd[0])
            # layout: times (2x 32/64), track id 32, reserved 32, duration
            # 32/64, then 52 bytes to width/height (16.16 fixed) at END-8
            w_fx, h_fx = struct.unpack_from(">II", data, tkhd[1] - 8)
            trk["width"], trk["height"] = w_fx >> 16, h_fx >> 16
        mdia = _find(data, a, b, b"mdia")
        if mdia is not None:
            mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
            if mdhd is not None:
                mver, mpos = _full_box(data, mdhd[0])
                trk["timescale"], trk["duration"] = _times(data, mpos, mver, 2)
            hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                handler = data[hdlr[0] + 8 : hdlr[0] + 12]
                trk["kind"] = _HANDLER_KIND.get(handler, handler.decode("latin-1"))
            minf = _find(data, mdia[0], mdia[1], b"minf")
            if minf is not None:
                stbl = _find(data, minf[0], minf[1], b"stbl")
                if stbl is not None:
                    stsd = _find(data, stbl[0], stbl[1], b"stsd")
                    if stsd is not None:
                        (n_entries,) = struct.unpack_from(">I", data, stsd[0] + 4)
                        if n_entries > 0:
                            trk["codec"] = data[stsd[0] + 12 : stsd[0] + 16].decode("latin-1")
                    stsz = _find(data, stbl[0], stbl[1], b"stsz")
                    if stsz is not None:
                        (trk["n_samples"],) = struct.unpack_from(">I", data, stsz[0] + 8)
        tracks.append(trk)

    vid = next((t for t in tracks if t["kind"] == "video"), None)
    return {
        "kind": "video" if vid is not None else "audio",
        "major_brand": major,
        "duration_ms": dur * 1000 // ts,
        "n_tracks": len(tracks),
        "tracks": tracks,
        "width": vid["width"] if vid else None,
        "height": vid["height"] if vid else None,
        "n_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# Deterministic skeleton writer (spec-shaped fixture MP4s: real box tree,
# empty mdat — there are no coded samples to carry)
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I", 1) + fourcc + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, body: bytes, largesize: bool = False) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]) + body, largesize)


def _mvhd(timescale: int, duration: int, version: int) -> bytes:
    if version == 1:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100) + b"\x00" * 10
    body += struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    body += b"\x00" * 24 + struct.pack(">I", 2)  # pre_defined + next_track_ID
    return _full(b"mvhd", version, body)


def _tkhd(track_id: int, duration: int, w: int, h: int, version: int) -> bytes:
    if version == 1:
        body = struct.pack(">QQIIQ", 0, 0, track_id, 0, duration)
    else:
        body = struct.pack(">IIIII", 0, 0, track_id, 0, duration)
    body += b"\x00" * 8  # reserved
    body += struct.pack(">hhhh", 0, 0, 0x0100, 0)  # layer, group, volume, rsvd
    body += struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    body += struct.pack(">II", w << 16, h << 16)
    return _full(b"tkhd", version, body)


def _mdhd(timescale: int, duration: int, version: int) -> bytes:
    if version == 1:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">HH", 0x55C4, 0)  # language 'und', pre_defined
    return _full(b"mdhd", version, body)


def _hdlr(handler: bytes) -> bytes:
    return _full(b"hdlr", 0, struct.pack(">I", 0) + handler + b"\x00" * 12 + b"vf\x00")


def _stsd(codec: bytes) -> bytes:
    # one minimal sample entry: size + fourcc + 6 reserved + data_ref_index
    entry = struct.pack(">I", 16) + codec + b"\x00" * 6 + struct.pack(">H", 1)
    return _full(b"stsd", 0, struct.pack(">I", 1) + entry)


def _stsz(n_samples: int) -> bytes:
    return _full(b"stsz", 0, struct.pack(">II", 0, n_samples))


def build_mp4(
    tracks: list[dict],
    movie_timescale: int = 1000,
    duration_ms: int = 0,
    major_brand: bytes = b"isom",
    mvhd_version: int = 0,
    largesize_moov: bool = False,
) -> bytes:
    """Deterministic ISO-BMFF skeleton: ``tracks`` entries are dicts with
    ``kind`` ('video'|'audio'), ``codec`` (4 chars), ``timescale``,
    ``duration`` (track units), ``n_samples``, and for video ``width``/
    ``height``. Empty mdat; every box a real spec layout."""
    ftyp = _box(b"ftyp", major_brand + struct.pack(">I", 0) + b"isommp42")
    kids = [_mvhd(movie_timescale, duration_ms * movie_timescale // 1000, mvhd_version)]
    for i, t in enumerate(tracks):
        handler = b"vide" if t["kind"] == "video" else b"soun"
        stbl = _box(b"stbl", _stsd(t["codec"].encode("latin-1")) + _stsz(t["n_samples"]))
        minf = _box(b"minf", stbl)
        mdia = _box(
            b"mdia",
            _mdhd(t["timescale"], t["duration"], t.get("version", 0))
            + _hdlr(handler)
            + minf,
        )
        movie_dur = t["duration"] * movie_timescale // max(t["timescale"], 1)
        trak = _box(
            b"trak",
            _tkhd(i + 1, movie_dur, t.get("width", 0), t.get("height", 0), t.get("version", 0))
            + mdia,
        )
        kids.append(trak)
    moov = _box(b"moov", b"".join(kids), largesize=largesize_moov)
    return ftyp + moov + _box(b"mdat", b"")
