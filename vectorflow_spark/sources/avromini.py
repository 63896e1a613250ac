"""Byte-level Avro Object Container File codec, pure Python — the
row-oriented third format of the storage stack (companions:
sources/parquetmini.py, sources/orcmini.py).

Implements the public Apache Avro 1.12 specification
(avro.apache.org/docs/1.12.0/specification) from bytes up:

  * Binary encoding: zigzag-varint int/long, little-endian IEEE
    float/double, length-prefixed bytes/string, boolean, null; union by
    zigzag branch index; arrays and maps in the blocked encoding
    (including the negative-count + byte-size fast-skip form on read).
  * Object Container File layout: ``Obj\\x01`` magic, file metadata map
    (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, then
    blocks of (object count, byte size, payload, sync).
  * Codecs: ``null``, ``deflate`` (raw zlib, RFC 1951), ``snappy``
    (block format + 4-byte big-endian CRC32 of the UNCOMPRESSED payload,
    per the spec) via this repo's own operators/snappymini.py. Other
    codecs (zstandard, bzip2, xz) refuse loudly — no verifiable decoder
    in this environment.
  * Schemas: records of the primitive types plus ``["null", T]`` unions
    (nullable columns) and ``array`` of primitives (embedding columns).
    Nested records, maps, enums, fixed and recursive schemas refuse
    loudly — parse-correctly-or-refuse, never silently wrong.

Verification: pinned against the JVM Avro implementation Spark itself
bundles (avro-1.12.1.jar, via py4j in tests/test_avro.py): files OUR
writer emits are decoded by ``org.apache.avro.file.DataFileReader`` +
``GenericDatumReader``, and files the JVM's ``DataFileWriter`` emits
round-trip through OUR reader — both directions, across codecs and
null densities. The q_avro_* gates hash-match a distributed
write-then-scan of the documents table against the DuckDB oracle.

Scale shape: Avro is splittable by DESIGN — the 16-byte sync marker
between blocks exists so a reader can enter a file at any byte offset,
scan forward to the next sync, and own every block that STARTS inside
its range (the Hadoop input-split contract). ``avro_raw_scan`` plans
(file, range) tasks of ~``split_bytes`` each driver-side from file
SIZES alone (no footer round-trips — row formats have no footer) and
each task does exactly that seek-to-sync walk, so one 100-GB avro file
still fans out across executors.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Callable, Iterator

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
# refuse-loudly ceiling for a single block buffered by the split readers
MAX_BLOCK_BYTES = 256 << 20


class AvroError(ValueError):
    """Malformed or unsupported Avro bytes (refuse-loudly contract)."""


# ---------------------------------------------------------------------------
# Binary encoding primitives
# ---------------------------------------------------------------------------


def _w_long(out: bytearray, n: int) -> None:
    if not -(1 << 63) <= n < (1 << 63):
        raise AvroError(f"avro: value {n} outside signed 64-bit range")
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1  # two's-complement view for negatives
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


class _R:
    """Cursor over one decoded block / header region."""

    __slots__ = ("b", "i", "n")

    def __init__(self, b: bytes, i: int = 0):
        self.b = b
        self.i = i
        self.n = len(b)

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            if self.i >= self.n:
                raise AvroError("avro: truncated varint")
            byte = self.b[self.i]
            self.i += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 63:
                raise AvroError("avro: varint overflow")
        if acc >= 1 << 64:
            # a 10-byte varint whose final byte carries payload above bit
            # 63 (e.g. FF*9 7F) encodes no int64 — refuse, don't return a
            # Python int outside the type (r10 ADVICE)
            raise AvroError("avro: varint overflow")
        return (acc >> 1) ^ -(acc & 1)

    def raw(self, k: int) -> bytes:
        if self.i + k > self.n:
            raise AvroError("avro: truncated value")
        v = self.b[self.i : self.i + k]
        self.i += k
        return v

    def bytes_(self) -> bytes:
        k = self.long()
        if k < 0:
            raise AvroError("avro: negative byte length")
        return self.raw(k)


# ---------------------------------------------------------------------------
# Schema handling
# ---------------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _norm_schema(s: Any) -> Any:
    """Json-decoded schema -> normalized internal form. Refuses anything
    outside the documented scope so an unsupported file can never decode
    to silently-wrong rows."""
    if isinstance(s, str):
        if s in _PRIMITIVES:
            return s
        raise AvroError(f"avro: unsupported named/complex type reference {s!r}")
    if isinstance(s, list):
        branches = [_norm_schema(x) for x in s]
        if len(branches) != 2 or "null" not in branches:
            raise AvroError("avro: only [null, T] unions are supported")
        other = branches[0] if branches[1] == "null" else branches[1]
        if not (
            isinstance(other, str)
            or (isinstance(other, tuple) and other[0] == "array")
        ):
            raise AvroError("avro: union branch must be primitive or array")
        return ("union", other)
    if isinstance(s, dict):
        t = s.get("type")
        if t == "record":
            fields = []
            for f in s.get("fields", []):
                fields.append((f["name"], _norm_schema(f["type"])))
            return ("record", fields)
        if t == "array":
            item = _norm_schema(s["items"])
            if not isinstance(item, str) or item == "null":
                raise AvroError("avro: array items must be non-null primitives")
            return ("array", item)
        if isinstance(t, str) and t in _PRIMITIVES:
            return t  # {"type": "long", "logicalType": ...} — logical wrap
        raise AvroError(f"avro: unsupported schema element {t!r}")
    raise AvroError("avro: malformed schema")


# kind tags mirroring parquetmini/orcmini writer kinds
_KIND_SCHEMA = {
    "i64": "long",
    "i32": "int",
    "f64": "double",
    "f32": "float",
    "bool": "boolean",
    "str": "string",
    "bin": "bytes",
    "arr_f32": {"type": "array", "items": "float"},
    "arr_f64": {"type": "array", "items": "double"},
}


def schema_for(kinds: dict[str, str], *, nullable: bool = True, name: str = "row") -> dict:
    """Writer-kind map -> Avro record schema (JSON-decodable dict)."""
    fields = []
    for col, kind in kinds.items():
        base = _KIND_SCHEMA.get(kind)
        if base is None:
            raise AvroError(f"avro: unsupported writer kind {kind} for {col}")
        fields.append({"name": col, "type": ["null", base] if nullable else base})
    return {"type": "record", "name": name, "fields": fields}


# ---------------------------------------------------------------------------
# Value decode / encode against a normalized schema
# ---------------------------------------------------------------------------


def _read_value(r: _R, sch: Any) -> Any:
    if isinstance(sch, str):
        if sch == "null":
            return None
        if sch == "boolean":
            v = r.raw(1)[0]
            if v not in (0, 1):
                raise AvroError("avro: boolean byte must be 0 or 1")
            return bool(v)
        if sch in ("int", "long"):
            return r.long()
        if sch == "float":
            return struct.unpack("<f", r.raw(4))[0]
        if sch == "double":
            return struct.unpack("<d", r.raw(8))[0]
        if sch == "string":
            return r.bytes_().decode("utf-8")
        if sch == "bytes":
            return r.bytes_()
        raise AvroError(f"avro: unknown primitive {sch}")
    tag = sch[0]
    if tag == "union":
        idx = r.long()
        if idx == 0:
            return None
        if idx == 1:
            return _read_value(r, sch[1])
        raise AvroError("avro: union branch out of range")
    if tag == "record":
        return [_read_value(r, fs) for _, fs in sch[1]]
    if tag == "array":
        out = []
        while True:
            cnt = r.long()
            if cnt == 0:
                return out
            if cnt < 0:
                # negative count: followed by the block's byte size —
                # the fast-skip form; we still decode the items
                r.long()
                cnt = -cnt
            for _ in range(cnt):
                out.append(_read_value(r, sch[1]))
    raise AvroError(f"avro: unknown schema tag {tag}")


def _write_value(out: bytearray, v: Any, sch: Any) -> None:
    if isinstance(sch, str):
        if sch == "null":
            if v is not None:
                raise AvroError("avro: non-null value for null schema")
            return
        if sch == "boolean":
            out.append(1 if v else 0)
            return
        if sch in ("int", "long"):
            _w_long(out, int(v))
            return
        if sch == "float":
            out += struct.pack("<f", v)
            return
        if sch == "double":
            out += struct.pack("<d", v)
            return
        if sch == "string":
            b = v.encode("utf-8")
            _w_long(out, len(b))
            out += b
            return
        if sch == "bytes":
            b = bytes(v)
            _w_long(out, len(b))
            out += b
            return
        raise AvroError(f"avro: unknown primitive {sch}")
    tag = sch[0]
    if tag == "union":
        if v is None:
            _w_long(out, 0)
        else:
            _w_long(out, 1)
            _write_value(out, v, sch[1])
        return
    if tag == "record":
        for (_, fs), fv in zip(sch[1], v):
            _write_value(out, fv, fs)
        return
    if tag == "array":
        vals = list(v)
        if vals:
            _w_long(out, len(vals))
            for item in vals:
                _write_value(out, item, sch[1])
        _w_long(out, 0)
        return
    raise AvroError(f"avro: unknown schema tag {tag}")


# ---------------------------------------------------------------------------
# Codecs
# ---------------------------------------------------------------------------


def _decode_block(payload: bytes, codec: str) -> bytes:
    if codec in ("null", ""):
        return payload
    if codec == "deflate":
        try:
            return zlib.decompress(payload, wbits=-15)
        except zlib.error as e:
            raise AvroError(f"avro: bad deflate block: {e}") from None
    if codec == "snappy":
        if len(payload) < 4:
            raise AvroError("avro: snappy block shorter than its CRC")
        from vectorflow_spark.operators.snappymini import decompress as _sd

        raw = _sd(payload[:-4])
        crc = struct.unpack(">I", payload[-4:])[0]
        if zlib.crc32(raw) & 0xFFFFFFFF != crc:
            raise AvroError("avro: snappy block CRC mismatch")
        return raw
    raise AvroError(f"avro: unsupported codec {codec!r} (no verifiable decoder here)")


def _encode_block(raw: bytes, codec: str) -> bytes:
    if codec == "null":
        return raw
    if codec == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        return co.compress(raw) + co.flush()
    if codec == "snappy":
        from vectorflow_spark.operators.snappymini import compress as _sc

        return _sc(raw) + struct.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF)
    raise AvroError(f"avro: unsupported writer codec {codec!r}")


# ---------------------------------------------------------------------------
# Container file: read
# ---------------------------------------------------------------------------


def read_header_of(f, window: int = 1 << 16) -> dict:
    """read_header over a file handle, growing the read window (doubling,
    up to 16 MiB) when the metadata map outruns it — a foreign file with
    a giant schema gets more bytes, not a misleading truncation error."""
    while True:
        f.seek(0)
        data = f.read(window)
        try:
            return read_header(data)
        except AvroError:
            if len(data) < window or window >= (1 << 24):
                raise
            window *= 2


def read_header(data: bytes) -> dict:
    """Parse the container header: returns {schema, norm, codec, sync,
    meta, data_start}."""
    if data[:4] != MAGIC:
        raise AvroError("avro: bad magic")
    r = _R(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        cnt = r.long()
        if cnt == 0:
            break
        if cnt < 0:
            r.long()
            cnt = -cnt
        for _ in range(cnt):
            k = r.bytes_().decode("utf-8")
            meta[k] = r.bytes_()
    sync = r.raw(SYNC_SIZE)
    if "avro.schema" not in meta:
        raise AvroError("avro: header missing avro.schema")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return {
        "schema": schema,
        "norm": _norm_schema(schema),
        "codec": codec,
        "sync": sync,
        "meta": meta,
        "data_start": r.i,
    }


def iter_blocks(data: bytes, hdr: dict, start: int | None = None, end: int | None = None):
    """Yield (block_offset, n_objects, raw_payload), replicating the JVM
    DataFileReader split semantics exactly: entry = first sync marker
    STARTING at byte >= start (``sync(start)``), stop when a block's
    first byte reaches end + SYNC_SIZE (``pastSync(end)``). Adjacent
    splits [0,e1),[e1,e2),... therefore cover every block exactly once —
    split i owns blocks starting in [s_i + 16, e_i + 16). The trailing
    sync of every block is verified."""
    sync = hdr["sync"]
    if start is None or start == 0:
        pos = hdr["data_start"]
    else:
        # enter mid-file: the next block starts after the next sync
        j = data.find(sync, start)
        if j < 0:
            return
        pos = j + SYNC_SIZE
    end = len(data) if end is None else min(end, len(data))
    while pos < end + SYNC_SIZE:
        if pos >= len(data):
            return
        r = _R(data, pos)
        try:
            cnt = r.long()
            size = r.long()
        except AvroError:
            raise AvroError("avro: truncated block header")
        if cnt < 0 or size < 0:
            raise AvroError("avro: negative block header")
        payload = r.raw(size)
        if r.raw(SYNC_SIZE) != sync:
            raise AvroError("avro: block sync mismatch")
        yield pos, cnt, _decode_block(payload, hdr["codec"])
        pos = r.i


def _read_exact(f, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise AvroError("avro: truncated block")
    return b


def iter_blocks_stream(f, hdr: dict, start: int | None, end: int, file_size: int):
    """File-handle twin of ``iter_blocks`` with the same ownership rule,
    reading ONLY the split's bytes: the entry scan reads ~1 MiB windows
    from ``start`` until it finds the sync marker, then each block costs
    exactly (header varints + payload + sync). A whole-file read per
    split would make total I/O O(file_size x n_splits) — the r10
    self-review flaw this function closes; with this, N splits over one
    file read the file once collectively, which is the entire point of
    the sync-marker design."""
    sync = hdr["sync"]
    if start is None or start == 0:
        pos = hdr["data_start"]
    else:
        # scan forward for the first sync STARTING at byte >= start
        window_abs = start
        tail = b""
        f.seek(start)
        pos = -1
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                return
            window = tail + chunk
            idx = window.find(sync)
            if idx >= 0:
                pos = window_abs - len(tail) + idx + SYNC_SIZE
                break
            tail = window[-(SYNC_SIZE - 1):]
            window_abs += len(chunk)
    stop = min(end + SYNC_SIZE, file_size)
    while pos < stop:
        if pos >= file_size:
            return
        f.seek(pos)
        head = f.read(20)  # two varints, <= 10 bytes each
        r = _R(head)
        cnt = r.long()
        size = r.long()
        if cnt < 0 or size < 0:
            raise AvroError("avro: negative block header")
        if size > MAX_BLOCK_BYTES:
            raise AvroError(
                f"avro: block of {size} bytes exceeds MAX_BLOCK_BYTES="
                f"{MAX_BLOCK_BYTES} (a legal but executor-hostile foreign "
                "block; raise avromini.MAX_BLOCK_BYTES to accept it)"
            )
        consumed = r.i
        payload = head[consumed : consumed + size]
        if len(payload) < size:
            payload += _read_exact(f, size - len(payload))
        else:
            f.seek(pos + consumed + size)
        if _read_exact(f, SYNC_SIZE) != sync:
            raise AvroError("avro: block sync mismatch")
        yield pos, cnt, _decode_block(bytes(payload), hdr["codec"])
        pos = pos + consumed + size + SYNC_SIZE


def count_rows(data: bytes) -> int:
    """Metadata-only row count: sums block object counts from the block
    headers WITHOUT decompressing any payload (the avro twin of a parquet
    footer num_rows read — what a catalog/stats pass wants)."""
    hdr = read_header(data)
    sync = hdr["sync"]
    pos = hdr["data_start"]
    total = 0
    while pos < len(data):
        r = _R(data, pos)
        cnt = r.long()
        size = r.long()
        if cnt < 0 or size < 0:
            raise AvroError("avro: negative block header")
        r.raw(size)  # skip payload, bounds-checked
        if r.raw(SYNC_SIZE) != sync:
            raise AvroError("avro: block sync mismatch")
        total += cnt
        pos = r.i
    return total


def _skip_value(r: _R, sch: Any) -> None:
    """Advance past one value WITHOUT materializing it — the fast path for
    unprojected fields (a wide text column costs one length varint + a
    raw slice skip instead of a UTF-8 decode) and for fields the reader
    schema drops. Arrays honor the negative-count fast-skip form: the
    writer-provided byte size skips the whole block in O(1)."""
    if isinstance(sch, str):
        if sch == "null":
            return
        if sch == "boolean":
            r.raw(1)
        elif sch in ("int", "long"):
            r.long()
        elif sch == "float":
            r.raw(4)
        elif sch == "double":
            r.raw(8)
        elif sch in ("string", "bytes"):
            r.bytes_()  # one varint + raw slice skip, no decode
        else:
            raise AvroError(f"avro: unknown primitive {sch}")
        return
    tag = sch[0]
    if tag == "union":
        idx = r.long()
        if idx == 1:
            _skip_value(r, sch[1])
        elif idx != 0:
            raise AvroError("avro: union branch out of range")
        return
    if tag == "record":
        for _, fs in sch[1]:
            _skip_value(r, fs)
        return
    if tag == "array":
        while True:
            cnt = r.long()
            if cnt == 0:
                return
            if cnt < 0:
                size = r.long()
                if size < 0:
                    raise AvroError("avro: negative array block size")
                r.raw(size)  # O(1) whole-block skip
                continue
            for _ in range(cnt):
                _skip_value(r, sch[1])
    raise AvroError(f"avro: unknown schema tag {tag}")


_PROMOTIONS = {
    ("int", "long"): int,
    ("int", "float"): float,
    ("int", "double"): float,
    ("long", "float"): float,
    ("long", "double"): float,
    ("float", "double"): float,
    ("string", "bytes"): lambda s: s.encode("utf-8"),
    ("bytes", "string"): lambda b: b.decode("utf-8"),
}


def _base(sch: Any):
    return sch[1] if isinstance(sch, tuple) and sch[0] == "union" else sch


def resolve_plan(writer_norm: Any, reader_norm: Any, aliases: dict | None = None):
    """Avro Schema Resolution (spec section of that name) for flat record
    schemas: per WRITER field either ('read', reader_field_name, cast) or
    ('skip',); plus defaults for reader fields absent from the writer.
    Promotions follow the spec table (int->long/float/double,
    long->float/double, float->double, string<->bytes); ``aliases`` maps
    a reader field name to the set of writer names it also answers to
    (the spec's field-alias rename mechanism). Anything the two schemas
    disagree on beyond that refuses loudly."""
    if not (isinstance(writer_norm, tuple) and writer_norm[0] == "record"):
        raise AvroError("avro: writer schema must be a record")
    if not (isinstance(reader_norm, tuple) and reader_norm[0] == "record"):
        raise AvroError("avro: reader schema must be a record")
    reader_fields = dict(reader_norm[1])
    by_writer_name = {}
    for rname, _ in reader_norm[1]:
        by_writer_name[rname] = rname
        for a in (aliases or {}).get(rname, ()):
            by_writer_name[a] = rname
    plan = []
    matched = set()
    for wname, wsch in writer_norm[1]:
        rname = by_writer_name.get(wname)
        if rname is None:
            plan.append(("skip", wname, None, wname))
            continue
        matched.add(rname)
        rsch = reader_fields[rname]
        wb, rb = _base(wsch), _base(rsch)
        if wb == rb:
            cast = None
        elif isinstance(wb, str) and isinstance(rb, str) and (wb, rb) in _PROMOTIONS:
            cast = _PROMOTIONS[(wb, rb)]
        else:
            raise AvroError(
                f"avro: field {wname}: writer type {wb!r} does not resolve "
                f"to reader type {rb!r}"
            )
        # nullability: writer nullable -> reader must be nullable too
        if isinstance(wsch, tuple) and wsch[0] == "union" and not (
            isinstance(rsch, tuple) and rsch[0] == "union"
        ):
            raise AvroError(f"avro: field {wname}: nullable writer, non-null reader")
        plan.append(("read", rname, cast, wname))
    defaults = [rname for rname, _ in reader_norm[1] if rname not in matched]
    return plan, defaults


def read_avro(
    data: bytes,
    columns: list[str] | None = None,
    reader_schema: dict | None = None,
    defaults: dict | None = None,
) -> dict[str, list]:
    """Whole-file decode -> column dict (the reference path; the
    distributed path is avro_raw_scan's per-split walk). Unrequested
    columns are SKIPPED, not decoded. With ``reader_schema`` the spec's
    Schema Resolution applies: writer fields missing from the reader are
    skipped, reader fields missing from the writer fill from
    ``defaults`` (which must then cover them), and type promotions
    follow the spec table. JVM parity in tests/test_avro.py
    (GenericDatumReader(writer, reader))."""
    hdr = read_header(data)
    wnorm = hdr["norm"]
    if not (isinstance(wnorm, tuple) and wnorm[0] == "record"):
        raise AvroError("avro: top-level schema must be a record")
    if reader_schema is not None:
        rnorm = _norm_schema(reader_schema)
        aliases = {
            f["name"]: tuple(f.get("aliases", ()))
            for f in reader_schema.get("fields", [])
        }
        plan, dflt_names = resolve_plan(wnorm, rnorm, aliases)
        for n in dflt_names:
            if defaults is None or n not in defaults:
                raise AvroError(f"avro: reader field {n} needs a default")
        rnames = [n for n, _ in rnorm[1]]
    else:
        plan = [("read", n, None, n) for n, _ in wnorm[1]]
        dflt_names = []
        rnames = [n for n, _ in wnorm[1]]
    want = set(columns) if columns is not None else set(rnames)
    for n in want:
        if n not in rnames:
            raise AvroError(f"avro: unknown column {n}")
    wfields = dict(wnorm[1])
    steps = [
        (op if (op == "read" and name in want) else "skip", name, cast, wfields[wname])
        for op, name, cast, wname in plan
    ]
    cols: dict[str, list] = {n: [] for n in rnames if n in want}
    n_rows = 0
    for _, cnt, raw in iter_blocks(data, hdr):
        r = _R(raw)
        for _ in range(cnt):
            for op, name, cast, wsch in steps:
                if op == "skip":
                    _skip_value(r, wsch)
                else:
                    v = _read_value(r, wsch)
                    if cast is not None and v is not None:
                        v = cast(v)
                    cols[name].append(v)
        n_rows += cnt
        if r.i != r.n:
            raise AvroError("avro: trailing bytes in block")
    for n in dflt_names:
        if n in want:
            cols[n] = [defaults[n]] * n_rows
    return cols


# ---------------------------------------------------------------------------
# Container file: write
# ---------------------------------------------------------------------------


def encode_avro(
    cols: dict[str, list],
    kinds: dict[str, str],
    *,
    codec: str = "deflate",
    rows_per_block: int = 4096,
    sync: bytes | None = None,
) -> bytes:
    """Serialize named columns to one complete Avro container file. The
    sync marker defaults to a content-derived hash so a retried task
    rewrites byte-identical output (idempotent rename-commit sinks);
    callers may pass their own 16 bytes."""
    names = list(cols)
    if not names:
        raise AvroError("encode_avro needs at least one column")
    n_rows = len(cols[names[0]])
    for c in names:
        if len(cols[c]) != n_rows:
            raise AvroError("ragged columns")
    schema = schema_for({c: kinds[c] for c in names})
    norm = _norm_schema(schema)
    if sync is None:
        import hashlib

        h = hashlib.sha256(json.dumps(schema, sort_keys=True).encode())
        h.update(struct.pack("<q", n_rows))
        for c in names[: min(4, len(names))]:
            h.update(repr(cols[c][:3]).encode())
        sync = h.digest()[:SYNC_SIZE]
    if len(sync) != SYNC_SIZE:
        raise AvroError("avro: sync marker must be 16 bytes")

    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    _w_long(out, len(meta))
    for k in sorted(meta):
        kb = k.encode()
        _w_long(out, len(kb))
        out += kb
        _w_long(out, len(meta[k]))
        out += meta[k]
    _w_long(out, 0)
    out += sync

    for lo in range(0, n_rows, rows_per_block):
        hi = min(lo + rows_per_block, n_rows)
        raw = bytearray()
        for i in range(lo, hi):
            _write_value(raw, [cols[c][i] for c in names], norm)
        payload = _encode_block(bytes(raw), codec)
        _w_long(out, hi - lo)
        _w_long(out, len(payload))
        out += payload
        out += sync
    return bytes(out)


# ---------------------------------------------------------------------------
# Distributed scan / sink
# ---------------------------------------------------------------------------


def plan_splits(paths: list[str], split_bytes: int = 32 << 20) -> list[tuple[str, int, int]]:
    """(file, start, end) tasks from file SIZES alone — no per-file header
    round-trip at plan time (row formats carry no footer; the header is
    read by the task that owns byte 0 and re-read cheaply by later splits
    for schema/sync)."""
    import os

    tasks = []
    for p in paths:
        size = os.path.getsize(p)
        if size == 0:
            raise AvroError(f"avro: empty file {p}")
        for s in range(0, size, split_bytes):
            tasks.append((p, s, min(s + split_bytes, size)))
    return tasks


def avro_raw_scan(spark, paths: list[str], columns: list[str], split_bytes: int = 32 << 20):
    """Distributed byte-range scan over OUR decoder: one task per
    ~split_bytes range, each seeking to the next sync marker and decoding
    only blocks that START in its range (the Hadoop split contract, which
    is what makes row-oriented Avro workable at 100 TB: a single huge
    file still parallelizes). Schema is read driver-side from the first
    file; all files must agree on the requested columns' types (plan-time
    refusal, the raw_scan rule)."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        FloatType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    if not paths:
        raise AvroError("avro_raw_scan needs at least one file")
    heads: dict[str, dict] = {}
    for p in sorted(paths):
        with open(p, "rb") as f:
            heads[p] = read_header_of(f)
    norm0 = heads[sorted(paths)[0]]["norm"]
    fields0 = dict(norm0[1])
    for p, hdr in heads.items():
        fields = dict(hdr["norm"][1])
        for c in columns:
            if fields.get(c) != fields0.get(c):
                raise AvroError(f"avro: {p}: column {c} has a different type")

    def spark_type(sch):
        base = sch[1] if isinstance(sch, tuple) and sch[0] == "union" else sch
        if isinstance(base, tuple) and base[0] == "array":
            from pyspark.sql.types import ArrayType

            return ArrayType(spark_type(base[1]))
        return {
            "boolean": BooleanType(),
            "int": LongType(),
            "long": LongType(),
            "float": FloatType(),
            "double": DoubleType(),
            "string": StringType(),
        }.get(base) or StringType()

    schema = StructType([StructField(c, spark_type(fields0[c])) for c in columns])
    tasks = plan_splits(sorted(paths), split_bytes)
    tasks_df = spark.createDataFrame(tasks, "path string, start long, end long").repartition(
        max(len(tasks), 1)
    )

    def scan(batches):
        import os as _os

        for pdf in batches:
            for path, start, end in zip(pdf["path"], pdf["start"], pdf["end"]):
                size = _os.path.getsize(path)
                with open(path, "rb") as f:
                    hdr = read_header_of(f)
                    norm = hdr["norm"]
                    want = set(columns)
                    # unprojected fields are SKIPPED (length-hop), not
                    # decoded — the scan cost tracks the projection
                    steps = [
                        ("read" if n in want else "skip", n, fs) for n, fs in norm[1]
                    ]
                    out = {c: [] for c in columns}
                    s = int(start) if int(start) > 0 else None
                    for _, cnt, raw in iter_blocks_stream(f, hdr, s, int(end), size):
                        r = _R(raw)
                        for _ in range(cnt):
                            for op, name, fs in steps:
                                if op == "skip":
                                    _skip_value(r, fs)
                                else:
                                    out[name].append(_read_value(r, fs))
                yield pd.DataFrame(out, columns=columns)

    return tasks_df.mapInPandas(scan, schema)


def write_avro_corpus(
    df, out_dir: str, kinds: dict[str, str], *, codec: str = "deflate", rows_per_block: int = 4096
):
    """Distributed sink over OUR writer: one container file per partition,
    committed write-then-rename (the parquetmini/orcmini/warcmini
    protocol). Returns a manifest DataFrame of (part, n_rows, n_bytes)."""
    import os as _os
    import uuid as _uuid

    import pandas as pd

    names = [f.name for f in df.schema.fields]
    for c in names:
        if c not in kinds:
            raise AvroError(f"no writer kind declared for column {c}")
    _os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    man_schema = StructType(
        [
            StructField("part", StringType()),
            StructField("n_rows", LongType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def sink(batches):
        rows = []
        pdfs = [p for p in batches if len(p)]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True)
            cols = {}
            for c in names:
                kind = kinds[c]
                vals = []
                for v in pdf[c].tolist():
                    # NaN -> NULL (documented, see parquetmini._pdf_column)
                    if v is None or (
                        not isinstance(v, (str, bytes, list)) and pd.isna(v)
                    ):
                        vals.append(None)
                    elif kind in ("i64", "i32"):
                        vals.append(int(v))
                    elif kind == "bool":
                        vals.append(bool(v))
                    elif kind in ("arr_f32", "arr_f64"):
                        vals.append([float(x) for x in v])
                    else:
                        vals.append(v)
                cols[c] = vals
            blob = encode_avro(
                cols, {c: kinds[c] for c in names}, codec=codec, rows_per_block=rows_per_block
            )
            part = f"part-{_uuid.uuid4().hex}.avro"
            tmp = _os.path.join(out_dir, f".uncommitted-{part}")
            with open(tmp, "wb") as fh:
                fh.write(blob)
            _os.replace(tmp, _os.path.join(out_dir, part))
            rows.append((part, len(pdf), len(blob)))
        yield pd.DataFrame(rows, columns=["part", "n_rows", "n_bytes"])

    return df.mapInPandas(sink, man_schema)


def write_avro_grouped(
    df,
    out_dir: str,
    kinds: dict[str, str],
    group_col: str,
    sort_cols: list[str],
    *,
    codec: str = "deflate",
):
    """Group-wise Avro sink: one sorted container file per GROUP via
    applyInPandas — ONE Spark job however many groups there are (the
    write_orc_grouped twin; a per-group driver loop would serialize
    thousands of groups into thousands of jobs at corpus scale). The
    group value is carried in the file NAME (hive-ish ``col=value``),
    not duplicated into the rows."""
    import os as _os

    import pandas as pd

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    names = [f.name for f in df.schema.fields if f.name != group_col]
    for c in names:
        if c not in kinds:
            raise AvroError(f"no avro writer kind declared for column {c}")
    _os.makedirs(out_dir, exist_ok=True)
    man_schema = StructType(
        [StructField("grp", StringType()), StructField("n_rows", LongType())]
    )

    def sink(key, pdf):
        g = key[0]
        if g is None or any(ch in str(g) for ch in "/\x00\\"):
            raise AvroError(
                f"avro grouped sink: group value {g!r} cannot name a file "
                "(null or contains a path separator); sanitize the group "
                "column first"
            )
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        cols = {}
        for c in names:
            kind = kinds[c]
            vals = []
            for v in pdf[c].tolist():
                # NaN -> NULL (documented, see parquetmini._pdf_column)
                if v is None or (not isinstance(v, (str, bytes, list)) and pd.isna(v)):
                    vals.append(None)
                elif kind in ("i64", "i32"):
                    vals.append(int(v))
                elif kind == "bool":
                    vals.append(bool(v))
                elif kind in ("arr_f32", "arr_f64"):
                    vals.append([float(x) for x in v])
                else:
                    vals.append(v)
            cols[c] = vals
        blob = encode_avro(cols, {c: kinds[c] for c in names}, codec=codec)
        part = f"{group_col}={g}.avro"
        tmp = _os.path.join(out_dir, f".uncommitted-{part}")
        with open(tmp, "wb") as fh:
            fh.write(blob)
        _os.replace(tmp, _os.path.join(out_dir, part))
        return pd.DataFrame([(str(g), len(pdf))], columns=["grp", "n_rows"])

    return df.groupBy(group_col).applyInPandas(sink, man_schema)
