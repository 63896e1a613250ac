"""Byte-level Parquet introspection and column decode, pure Python.

Why the engine carries its own Parquet internals when Spark already reads
Parquet: a 100-TB table is planned from its FOOTERS — row-group boundaries,
per-chunk min/max statistics, dictionary offsets, encodings — and an engine
that can only see files through an opaque scan cannot audit pushdown, build
external row-group indexes, prune before listing finishes, or salvage
columns from partially-corrupt files. This module implements the public
Parquet format (https://github.com/apache/parquet-format, Thrift IDL +
format README) from bytes up:

  * Thrift Compact Protocol reader (the footer/page-header wire format):
    varint/zigzag, field-delta headers, structs/lists/unions, unknown-field
    skip (forward compatible with newer writers).
  * ``FileMetaData`` walk: schema tree (incl. nested LIST groups, logical +
    converted types, def/rep levels), row groups, column chunks, typed
    min/max/null_count statistics.
  * Page decode: v1 + v2 data pages, dictionary pages, RLE/bit-packed
    hybrid levels and indices, PLAIN values for BOOLEAN/INT32/INT64/FLOAT/
    DOUBLE/BYTE_ARRAY/FIXED_LEN_BYTE_ARRAY, SNAPPY (our own codec:
    operators/snappymini.py) and GZIP page compression.

Contract: parse-correctly-or-refuse — codecs without a verifiable decoder
here (ZSTD/LZ4/BROTLI/LZO), encrypted footers and malformed framing all
raise ``ParquetError`` loudly; nothing is silently skipped. The full
modern encoding set decodes (PLAIN, RLE, dictionary, DELTA_*,
BYTE_STREAM_SPLIT), as do legacy INT96 timestamps (Spark's default
output), whose unordered legacy stats are deliberately presented as
absent.

Verification: every layer is pinned against independent implementations on
the same bytes — pyarrow's ParquetFile metadata object for the footer walk,
DuckDB for the gates (q_parquet_meta / q_parquet_schema: footer facts vs
data-derived facts; q_parquet_rawscan: our byte-level column decode vs the
view's values; q_parquet_prune: stats-based row-group pruning vs an
order-key reconstruction) — plus truncation/corruption fuzz tests.

Scale shape: the unit of parallelism is (file, row_group). ``raw_scan``
reads ONE footer driver-side (two ranged reads: 8-byte tail then the
metadata block — the object-store pattern; no full-file read) and ships
(path, row_group, column-chunk byte ranges) tasks to executors, each of
which reads only its chunk's byte range. ``footer_meta_scan`` distributes
whole-footer parsing across files via mapInPandas — the 100-TB catalog
crawl is embarrassingly parallel over files, with only (file, stats) rows
ever reaching the driver.
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import Any, Callable, Iterator

from vectorflow_spark.operators.snappymini import decompress as _snappy_decompress

MAGIC = b"PAR1"
MAGIC_ENCRYPTED = b"PARE"


class ParquetError(ValueError):
    """Malformed or unsupported Parquet bytes (refuse-loudly contract)."""


# ---------------------------------------------------------------------------
# Thrift Compact Protocol
# ---------------------------------------------------------------------------

_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_I8 = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


class _Thrift:
    """Minimal Thrift Compact Protocol reader over a bytes buffer.

    ``read_struct(spec)`` materializes only the fields named in ``spec``
    ({field_id: (name, subspec)}); everything else is skipped by wire type,
    so footers written by newer parquet-format revisions still parse.
    """

    __slots__ = ("buf", "pos", "end")

    def __init__(self, buf: bytes, pos: int = 0, end: int | None = None):
        self.buf = buf
        self.pos = pos
        self.end = len(buf) if end is None else end

    def _need(self, n: int) -> None:
        if self.pos + n > self.end:
            raise ParquetError("thrift: truncated buffer")

    def read_byte(self) -> int:
        self._need(1)
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def read_varint(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.read_byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ParquetError("thrift: varint too long")

    def read_zigzag(self) -> int:
        v = self.read_varint()
        return (v >> 1) ^ -(v & 1)

    def read_binary(self) -> bytes:
        n = self.read_varint()
        self._need(n)
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_double(self) -> float:
        self._need(8)
        (v,) = struct.unpack_from("<d", self.buf, self.pos)
        self.pos += 8
        return v

    def _read_value(self, ctype: int, subspec: Any):
        if ctype == _CT_TRUE:
            return True
        if ctype == _CT_FALSE:
            return False
        if ctype in (_CT_I8, _CT_I16, _CT_I32, _CT_I64):
            return self.read_zigzag()
        if ctype == _CT_DOUBLE:
            return self.read_double()
        if ctype == _CT_BINARY:
            return self.read_binary()
        if ctype in (_CT_LIST, _CT_SET):
            return self._read_list(subspec)
        if ctype == _CT_STRUCT:
            if subspec is None:
                self._skip_struct()
                return None
            return self.read_struct(subspec)
        if ctype == _CT_MAP:
            self._skip_map()
            return None
        raise ParquetError(f"thrift: unsupported wire type {ctype}")

    def _read_list(self, subspec: Any) -> list:
        hdr = self.read_byte()
        size = hdr >> 4
        etype = hdr & 0x0F
        if size == 15:
            size = self.read_varint()
        out = []
        for _ in range(size):
            if etype == _CT_TRUE or etype == _CT_FALSE:
                # bool list elements are stored as one byte each
                out.append(self.read_byte() == 1)
            else:
                out.append(self._read_value(etype, subspec))
        return out

    def _skip(self, ctype: int) -> None:
        if ctype in (_CT_TRUE, _CT_FALSE):
            return
        if ctype == _CT_I8:
            self.pos += 1
            self._need(0)
            return
        if ctype in (_CT_I16, _CT_I32, _CT_I64):
            self.read_varint()
            return
        if ctype == _CT_DOUBLE:
            self._need(8)
            self.pos += 8
            return
        if ctype == _CT_BINARY:
            self.read_binary()
            return
        if ctype in (_CT_LIST, _CT_SET):
            hdr = self.read_byte()
            size = hdr >> 4
            etype = hdr & 0x0F
            if size == 15:
                size = self.read_varint()
            for _ in range(size):
                if etype in (_CT_TRUE, _CT_FALSE):
                    self.read_byte()
                else:
                    self._skip(etype)
            return
        if ctype == _CT_MAP:
            self._skip_map()
            return
        if ctype == _CT_STRUCT:
            self._skip_struct()
            return
        raise ParquetError(f"thrift: cannot skip wire type {ctype}")

    def _skip_map(self) -> None:
        size = self.read_varint()
        if size:
            hdr = self.read_byte()
            kt, vt = hdr >> 4, hdr & 0x0F
            for _ in range(size):
                self._skip(kt)
                self._skip(vt)

    def _skip_struct(self) -> None:
        last = 0
        while True:
            hdr = self.read_byte()
            if hdr == _CT_STOP:
                return
            delta = hdr >> 4
            ctype = hdr & 0x0F
            last = last + delta if delta else self.read_zigzag()
            self._skip(ctype)

    def read_struct(self, spec: dict[int, tuple[str, Any]]) -> dict[str, Any]:
        out: dict[str, Any] = {}
        last = 0
        while True:
            hdr = self.read_byte()
            if hdr == _CT_STOP:
                return out
            delta = hdr >> 4
            ctype = hdr & 0x0F
            last = last + delta if delta else self.read_zigzag()
            ent = spec.get(last)
            if ent is None:
                self._skip(ctype)
            else:
                name, subspec = ent
                out[name] = self._read_value(ctype, subspec)


# ---------------------------------------------------------------------------
# parquet-format Thrift specs (field ids from the public IDL)
# ---------------------------------------------------------------------------

_TIME_UNIT = {1: ("millis", None), 2: ("micros", None), 3: ("nanos", None)}
_LOGICAL_TYPE = {
    1: ("string", {}),
    2: ("map", {}),
    3: ("list", {}),
    4: ("enum", {}),
    5: ("decimal", {1: ("scale", None), 2: ("precision", None)}),
    6: ("date", {}),
    7: ("time", {1: ("is_adjusted_to_utc", None), 2: ("unit", _TIME_UNIT)}),
    8: ("timestamp", {1: ("is_adjusted_to_utc", None), 2: ("unit", _TIME_UNIT)}),
    10: ("integer", {1: ("bit_width", None), 2: ("is_signed", None)}),
    11: ("unknown", {}),
    12: ("json", {}),
    13: ("bson", {}),
    14: ("uuid", {}),
    15: ("float16", {}),
}
_SCHEMA_ELEMENT = {
    1: ("type", None),
    2: ("type_length", None),
    3: ("repetition_type", None),
    4: ("name", None),
    5: ("num_children", None),
    6: ("converted_type", None),
    7: ("scale", None),
    8: ("precision", None),
    9: ("field_id", None),
    10: ("logical_type", _LOGICAL_TYPE),
}
_STATISTICS = {
    1: ("max_deprecated", None),
    2: ("min_deprecated", None),
    3: ("null_count", None),
    4: ("distinct_count", None),
    5: ("max_value", None),
    6: ("min_value", None),
    7: ("is_max_value_exact", None),
    8: ("is_min_value_exact", None),
}
_KEY_VALUE = {1: ("key", None), 2: ("value", None)}
_COLUMN_META = {
    1: ("type", None),
    2: ("encodings", None),
    3: ("path_in_schema", None),
    4: ("codec", None),
    5: ("num_values", None),
    6: ("total_uncompressed_size", None),
    7: ("total_compressed_size", None),
    8: ("key_value_metadata", _KEY_VALUE),
    9: ("data_page_offset", None),
    10: ("index_page_offset", None),
    11: ("dictionary_page_offset", None),
    12: ("statistics", _STATISTICS),
    14: ("bloom_filter_offset", None),
    15: ("bloom_filter_length", None),
}
_COLUMN_CHUNK = {
    1: ("file_path", None),
    2: ("file_offset", None),
    3: ("meta_data", _COLUMN_META),
    4: ("offset_index_offset", None),
    5: ("offset_index_length", None),
    6: ("column_index_offset", None),
    7: ("column_index_length", None),
    16: ("crypto_metadata", None),
}
_PAGE_LOCATION = {
    1: ("offset", None),
    2: ("compressed_page_size", None),
    3: ("first_row_index", None),
}
_OFFSET_INDEX = {1: ("page_locations", _PAGE_LOCATION)}
_COLUMN_INDEX = {
    1: ("null_pages", None),
    2: ("min_values", None),
    3: ("max_values", None),
    4: ("boundary_order", None),
    5: ("null_counts", None),
}
_ROW_GROUP = {
    1: ("columns", _COLUMN_CHUNK),
    2: ("total_byte_size", None),
    3: ("num_rows", None),
    5: ("file_offset", None),
    6: ("total_compressed_size", None),
    7: ("ordinal", None),
}
_FILE_META = {
    1: ("version", None),
    2: ("schema", _SCHEMA_ELEMENT),
    3: ("num_rows", None),
    4: ("row_groups", _ROW_GROUP),
    5: ("key_value_metadata", _KEY_VALUE),
    6: ("created_by", None),
    8: ("encryption_algorithm", None),
}
_DATA_PAGE_HEADER = {
    1: ("num_values", None),
    2: ("encoding", None),
    3: ("definition_level_encoding", None),
    4: ("repetition_level_encoding", None),
}
_DICT_PAGE_HEADER = {1: ("num_values", None), 2: ("encoding", None), 3: ("is_sorted", None)}
_DATA_PAGE_HEADER_V2 = {
    1: ("num_values", None),
    2: ("num_nulls", None),
    3: ("num_rows", None),
    4: ("encoding", None),
    5: ("definition_levels_byte_length", None),
    6: ("repetition_levels_byte_length", None),
    7: ("is_compressed", None),
}
_PAGE_HEADER = {
    1: ("type", None),
    2: ("uncompressed_page_size", None),
    3: ("compressed_page_size", None),
    4: ("crc", None),
    5: ("data_page_header", _DATA_PAGE_HEADER),
    7: ("dictionary_page_header", _DICT_PAGE_HEADER),
    8: ("data_page_header_v2", _DATA_PAGE_HEADER_V2),
}

PHYSICAL_TYPES = {
    0: "BOOLEAN",
    1: "INT32",
    2: "INT64",
    3: "INT96",
    4: "FLOAT",
    5: "DOUBLE",
    6: "BYTE_ARRAY",
    7: "FIXED_LEN_BYTE_ARRAY",
}
CODECS = {
    0: "UNCOMPRESSED",
    1: "SNAPPY",
    2: "GZIP",
    3: "LZO",
    4: "BROTLI",
    5: "LZ4",
    6: "ZSTD",
    7: "LZ4_RAW",
}
ENCODINGS = {
    0: "PLAIN",
    2: "PLAIN_DICTIONARY",
    3: "RLE",
    4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED",
    6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY",
    8: "RLE_DICTIONARY",
    9: "BYTE_STREAM_SPLIT",
}
REPETITION = {0: "REQUIRED", 1: "OPTIONAL", 2: "REPEATED"}
_CONVERTED = {
    0: "UTF8",
    1: "MAP",
    2: "MAP_KEY_VALUE",
    3: "LIST",
    4: "ENUM",
    5: "DECIMAL",
    6: "DATE",
    7: "TIME_MILLIS",
    8: "TIME_MICROS",
    9: "TIMESTAMP_MILLIS",
    10: "TIMESTAMP_MICROS",
    11: "UINT_8",
    12: "UINT_16",
    13: "UINT_32",
    14: "UINT_64",
    15: "INT_8",
    16: "INT_16",
    17: "INT_32",
    18: "INT_64",
    19: "JSON",
    20: "BSON",
    21: "INTERVAL",
}


# ---------------------------------------------------------------------------
# Footer parsing + schema walk
# ---------------------------------------------------------------------------


class _Leaf:
    """A leaf column resolved from the schema tree."""

    __slots__ = (
        "path",
        "physical_type",
        "type_length",
        "max_def_level",
        "max_rep_level",
        "logical",
        "converted_type",
        "element",
    )

    def __init__(self, path, physical_type, type_length, max_def, max_rep, logical, conv, element):
        self.path = path
        self.physical_type = physical_type
        self.type_length = type_length
        self.max_def_level = max_def
        self.max_rep_level = max_rep
        self.logical = logical
        self.converted_type = conv
        self.element = element  # the raw SchemaElement dict


def parse_footer(meta_bytes: bytes) -> dict[str, Any]:
    """Parse a FileMetaData thrift blob (the bytes between the data section
    and the 8-byte tail)."""
    meta = _Thrift(meta_bytes).read_struct(_FILE_META)
    if meta.get("encryption_algorithm") is not None:
        raise ParquetError("encrypted parquet footers are not supported")
    for req in ("version", "schema", "num_rows", "row_groups"):
        if req not in meta:
            raise ParquetError(f"footer missing required field {req}")
    if isinstance(meta.get("created_by"), bytes):
        meta["created_by"] = meta["created_by"].decode("utf-8", "replace")
    for el in meta["schema"]:
        if isinstance(el.get("name"), bytes):
            el["name"] = el["name"].decode("utf-8")
    for rg in meta["row_groups"]:
        for cc in rg.get("columns", []):
            cm = cc.get("meta_data")
            if cm is None:
                raise ParquetError("column chunk without inline metadata (external/encrypted)")
            cm["path_in_schema"] = [
                p.decode("utf-8") if isinstance(p, bytes) else p for p in cm["path_in_schema"]
            ]
    return meta


def read_file_meta(path: str) -> dict[str, Any]:
    """Read only the footer of a parquet file: an 8-byte tail probe, then a
    single ranged read of the metadata block — the object-store access
    pattern (2 GETs per file, never a full download)."""
    with open(path, "rb") as fh:
        fh.seek(0, io.SEEK_END)
        size = fh.tell()
        if size < 12:
            raise ParquetError("file too small to be parquet")
        fh.seek(size - 8)
        tail = fh.read(8)
        magic = tail[4:]
        if magic == MAGIC_ENCRYPTED:
            raise ParquetError("encrypted parquet (PARE) is not supported")
        if magic != MAGIC:
            raise ParquetError("missing PAR1 trailing magic")
        (meta_len,) = struct.unpack("<I", tail[:4])
        if meta_len + 8 > size - 4:
            raise ParquetError("footer length overruns file")
        fh.seek(size - 8 - meta_len)
        meta = parse_footer(fh.read(meta_len))
        meta["_file_size"] = size
        return meta


def schema_leaves(meta: dict[str, Any]) -> list[_Leaf]:
    """Flatten the schema tree to leaf columns with resolved dotted paths
    and max definition/repetition levels (the page-decode inputs)."""
    schema = meta["schema"]
    if not schema:
        raise ParquetError("empty schema")
    leaves: list[_Leaf] = []
    idx = 1  # element 0 is the root

    def walk(path: tuple[str, ...], max_def: int, max_rep: int) -> None:
        nonlocal idx
        if idx >= len(schema):
            raise ParquetError("schema tree truncated")
        el = schema[idx]
        idx += 1
        rep = el.get("repetition_type", 0)
        d = max_def + (1 if rep in (1, 2) else 0)
        r = max_rep + (1 if rep == 2 else 0)
        p = path + (el["name"],)
        nch = el.get("num_children") or 0
        if nch == 0:
            if "type" not in el:
                raise ParquetError(f"leaf {'.'.join(p)} missing physical type")
            leaves.append(
                _Leaf(
                    ".".join(p),
                    PHYSICAL_TYPES.get(el["type"], f"UNKNOWN({el['type']})"),
                    el.get("type_length"),
                    d,
                    r,
                    el.get("logical_type"),
                    el.get("converted_type"),
                    el,
                )
            )
        else:
            for _ in range(nch):
                walk(p, d, r)

    root_children = schema[0].get("num_children") or 0
    for _ in range(root_children):
        walk((), 0, 0)
    if idx != len(schema):
        raise ParquetError("schema tree has unattached elements")
    return leaves


def duckdb_type_of(meta: dict[str, Any], top_name: str) -> str:
    """Map one TOP-LEVEL schema field to the DuckDB/SQL type name the same
    file produces through ``read_parquet`` — the cross-engine schema gate.
    Scalars map from (physical, logical); a LIST group maps to
    ``<element>[]``. Unsupported shapes refuse."""
    schema = meta["schema"]
    i = 1
    root_children = schema[0].get("num_children") or 0
    found = None
    for _ in range(root_children):
        el = schema[i]
        if el["name"] == top_name:
            found = i
        # advance past this subtree (pop exhausted groups, depth-first)
        stack = [el.get("num_children") or 0]
        i += 1
        while stack:
            if stack[-1] == 0:
                stack.pop()
                continue
            stack[-1] -= 1
            stack.append(schema[i].get("num_children") or 0)
            i += 1
        if found is not None:
            break
    if found is None:
        raise ParquetError(f"no top-level field {top_name}")
    el = schema[found]

    def scalar(el: dict[str, Any]) -> str:
        pt = PHYSICAL_TYPES.get(el.get("type"))
        lt = el.get("logical_type") or {}
        conv = el.get("converted_type")
        if "string" in lt or conv == 0:
            return "VARCHAR"
        if "timestamp" in lt or conv in (9, 10):
            ts = lt.get("timestamp", {})
            utc = ts.get("is_adjusted_to_utc", False)
            return "TIMESTAMP WITH TIME ZONE" if utc else "TIMESTAMP"
        if "date" in lt or conv == 6:
            return "DATE"
        if "decimal" in lt or conv == 5:
            sc = lt.get("decimal", {}).get("scale", el.get("scale", 0))
            pr = lt.get("decimal", {}).get("precision", el.get("precision", 0))
            return f"DECIMAL({pr},{sc})"
        if "integer" in lt:
            it = lt["integer"]
            bits, signed = it.get("bit_width", 32), it.get("is_signed", True)
            names = {8: "TINYINT", 16: "SMALLINT", 32: "INTEGER", 64: "BIGINT"}
            n = names.get(bits)
            if n is None:
                raise ParquetError(f"integer bit width {bits}")
            return n if signed else "U" + n
        if pt == "INT96":
            return "TIMESTAMP"
        if pt == "BOOLEAN":
            return "BOOLEAN"
        if pt == "INT32":
            return "INTEGER"
        if pt == "INT64":
            return "BIGINT"
        if pt == "FLOAT":
            return "FLOAT"
        if pt == "DOUBLE":
            return "DOUBLE"
        if pt == "BYTE_ARRAY":
            return "BLOB"
        if pt == "FIXED_LEN_BYTE_ARRAY":
            return "BLOB"
        raise ParquetError(f"unmapped scalar type {pt}/{lt}/{conv}")

    nch = el.get("num_children") or 0
    if nch == 0:
        return scalar(el)
    lt = el.get("logical_type") or {}
    if "list" in lt or el.get("converted_type") == 3:
        mid = schema[found + 1]
        if (mid.get("num_children") or 0) == 1 and mid.get("repetition_type") == 2:
            inner = schema[found + 2]
            if (inner.get("num_children") or 0) == 0:
                return scalar(inner) + "[]"
        # 2-level legacy list: repeated leaf directly under the list group
        if (mid.get("num_children") or 0) == 0 and mid.get("repetition_type") == 2:
            return scalar(mid) + "[]"
        raise ParquetError("unsupported LIST shape")
    raise ParquetError(f"unmapped group type for {top_name}")


def top_level_fields(meta: dict[str, Any]) -> list[str]:
    """Names of the root's direct children in schema order — the SQL-facing
    column list of the file."""
    schema = meta["schema"]
    out = []
    i = 1
    for _ in range(schema[0].get("num_children") or 0):
        out.append(schema[i]["name"])
        stack = [schema[i].get("num_children") or 0]
        i += 1
        while stack:
            if stack[-1] == 0:
                stack.pop()
                continue
            stack[-1] -= 1
            stack.append(schema[i].get("num_children") or 0)
            i += 1
    return out


def _decode_stat(raw: bytes | None, leaf: _Leaf):
    """Decode a min/max statistics value to its typed form."""
    if raw is None:
        return None
    pt = leaf.physical_type
    if pt == "INT32":
        return struct.unpack("<i", raw)[0]
    if pt == "INT64":
        return struct.unpack("<q", raw)[0]
    if pt == "FLOAT":
        return struct.unpack("<f", raw)[0]
    if pt == "DOUBLE":
        return struct.unpack("<d", raw)[0]
    if pt == "BOOLEAN":
        return bool(raw[0])
    if pt in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        lt = leaf.logical or {}
        if "string" in lt or leaf.converted_type == 0:
            return raw.decode("utf-8", "replace")
        return raw
    if pt == "INT96":
        # legacy INT96 stats are byte-wise, not value-ordered — never
        # trustworthy as bounds (parquet-mr stopped writing them); present
        # as absent rather than as a lying bound
        return None
    raise ParquetError(f"statistics for unsupported type {pt}")


def footer_meta_rows(path: str, meta: dict[str, Any] | None = None) -> list[dict[str, Any]]:
    """One dict per (row_group, column_chunk): the parquet_metadata() shape.
    Typed min/max come from ``min_value``/``max_value`` (falling back to the
    deprecated v1 fields only when the column order is the safe default).
    Pass an already-parsed ``meta`` (read_file_meta output) to avoid
    re-reading the footer — planning passes parse each footer exactly once
    (r10 ADVICE)."""
    if meta is None:
        meta = read_file_meta(path)
    leaves = {lf.path: lf for lf in schema_leaves(meta)}
    rows: list[dict[str, Any]] = []
    for rg_id, rg in enumerate(meta["row_groups"]):
        for col_id, cc in enumerate(rg["columns"]):
            cm = cc["meta_data"]
            pth = ".".join(cm["path_in_schema"])
            leaf = leaves.get(pth)
            if leaf is None:
                raise ParquetError(f"column chunk path {pth} not in schema")
            st = cm.get("statistics") or {}
            mn, mx = st.get("min_value"), st.get("max_value")
            if mn is None and mx is None and leaf.physical_type in (
                "BOOLEAN", "INT32", "INT64", "FLOAT", "DOUBLE"
            ):
                # the deprecated v1 fields used SIGNED comparison — correct
                # for these physical types only; byte-array/unsigned bounds
                # from legacy writers are order-unsafe and stay absent
                mn, mx = st.get("min_deprecated"), st.get("max_deprecated")
            rows.append(
                {
                    "file_name": path,
                    "row_group_id": rg_id,
                    "row_group_num_rows": rg["num_rows"],
                    "row_group_num_columns": len(rg["columns"]),
                    "row_group_bytes": rg["total_byte_size"],
                    "column_id": col_id,
                    "path_in_schema": pth,
                    "type": leaf.physical_type,
                    "num_values": cm["num_values"],
                    "compression": CODECS.get(cm["codec"], f"UNKNOWN({cm['codec']})"),
                    "encodings": ", ".join(
                        sorted(ENCODINGS.get(e, str(e)) for e in cm["encodings"])
                    ),
                    "dictionary_page_offset": cm.get("dictionary_page_offset"),
                    "data_page_offset": cm["data_page_offset"],
                    "total_compressed_size": cm["total_compressed_size"],
                    "total_uncompressed_size": cm["total_uncompressed_size"],
                    "stats_null_count": st.get("null_count"),
                    "stats_min": _decode_stat(mn, leaf),
                    "stats_max": _decode_stat(mx, leaf),
                    "bloom_filter_offset": cm.get("bloom_filter_offset"),
                }
            )
    return rows


# ---------------------------------------------------------------------------
# Page decode
# ---------------------------------------------------------------------------


def _decompress(codec: int, data: bytes, uncompressed_size: int) -> bytes:
    if codec == 0:
        out = data
    elif codec == 1:
        out = _snappy_decompress(data)
    elif codec == 2:
        out = zlib.decompress(data, 31)  # GZIP member framing
    elif codec == 7:  # LZ4_RAW: one LZ4 block per page (operators/lz4mini.py)
        from vectorflow_spark.operators.lz4mini import decompress as _lz4_decompress

        out = _lz4_decompress(data, uncompressed_size)
    else:
        # codec 5 (legacy Hadoop-framed LZ4) stays refused: deprecated,
        # framing ambiguity is why LZ4_RAW exists
        raise ParquetError(
            f"page codec {CODECS.get(codec, codec)} has no verifiable decoder here "
            "(no native library in this environment to pin against)"
        )
    if len(out) != uncompressed_size:
        raise ParquetError(
            f"page decompressed to {len(out)} bytes, header declared {uncompressed_size}"
        )
    return out


def _read_rle_hybrid(buf: bytes, pos: int, end: int, bit_width: int, n: int) -> tuple[list[int], int]:
    """RLE/bit-packed hybrid runs until ``n`` values are produced."""
    out: list[int] = []
    if bit_width == 0:
        return [0] * n, pos
    byte_w = (bit_width + 7) // 8
    mask = (1 << bit_width) - 1
    while len(out) < n:
        if pos >= end:
            raise ParquetError("rle-hybrid: truncated runs")
        hdr = 0
        shift = 0
        while True:
            if pos >= end:
                raise ParquetError("rle-hybrid: truncated run header")
            b = buf[pos]
            pos += 1
            hdr |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if hdr & 1:  # bit-packed: (hdr>>1) groups of 8 values
            groups = hdr >> 1
            nbytes = groups * bit_width
            if pos + nbytes > end:
                raise ParquetError("rle-hybrid: truncated bit-packed run")
            word = int.from_bytes(buf[pos : pos + nbytes], "little")
            pos += nbytes
            cnt = groups * 8
            for i in range(cnt):
                out.append((word >> (i * bit_width)) & mask)
        else:  # RLE run
            cnt = hdr >> 1
            if pos + byte_w > end:
                raise ParquetError("rle-hybrid: truncated rle value")
            val = int.from_bytes(buf[pos : pos + byte_w], "little") & mask
            pos += byte_w
            out.extend([val] * cnt)
    if len(out) > n:
        del out[n:]
    return out, pos


def _decode_plain(buf: bytes, pos: int, end: int, n: int, leaf: _Leaf) -> tuple[list, int]:
    pt = leaf.physical_type
    if pt == "INT32":
        need = 4 * n
        if pos + need > end:
            raise ParquetError("plain int32 values truncated")
        vals = list(struct.unpack_from(f"<{n}i", buf, pos))
        return vals, pos + need
    if pt == "INT64":
        need = 8 * n
        if pos + need > end:
            raise ParquetError("plain int64 values truncated")
        return list(struct.unpack_from(f"<{n}q", buf, pos)), pos + need
    if pt == "FLOAT":
        need = 4 * n
        if pos + need > end:
            raise ParquetError("plain float values truncated")
        return list(struct.unpack_from(f"<{n}f", buf, pos)), pos + need
    if pt == "DOUBLE":
        need = 8 * n
        if pos + need > end:
            raise ParquetError("plain double values truncated")
        return list(struct.unpack_from(f"<{n}d", buf, pos)), pos + need
    if pt == "BOOLEAN":
        need = (n + 7) // 8
        if pos + need > end:
            raise ParquetError("plain boolean values truncated")
        word = int.from_bytes(buf[pos : pos + need], "little")
        return [bool((word >> i) & 1) for i in range(n)], pos + need
    if pt == "BYTE_ARRAY":
        vals = []
        for _ in range(n):
            if pos + 4 > end:
                raise ParquetError("plain byte_array length truncated")
            (ln,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if pos + ln > end:
                raise ParquetError("plain byte_array value truncated")
            vals.append(buf[pos : pos + ln])
            pos += ln
        return vals, pos
    if pt == "FIXED_LEN_BYTE_ARRAY":
        tl = leaf.type_length
        if not tl:
            raise ParquetError("fixed_len_byte_array without type_length")
        need = tl * n
        if pos + need > end:
            raise ParquetError("plain flba values truncated")
        vals = [buf[pos + i * tl : pos + (i + 1) * tl] for i in range(n)]
        return vals, pos + need
    if pt == "INT96":
        # the legacy Spark/Impala timestamp: 8-byte LE nanos-of-day then
        # 4-byte LE Julian day. Decoded to epoch MICROS (sub-microsecond
        # precision truncates — documented, matches Spark's own reader
        # default of microsecond timestamps).
        need = 12 * n
        if pos + need > end:
            raise ParquetError("plain int96 values truncated")
        vals = []
        for i in range(n):
            o = pos + i * 12
            nanos = int.from_bytes(buf[o : o + 8], "little")
            jday = int.from_bytes(buf[o + 8 : o + 12], "little")
            vals.append((jday - 2440588) * 86_400_000_000 + nanos // 1000)
        return vals, pos + need
    raise ParquetError(f"PLAIN decode unsupported for {pt}")


def _read_ule_varint(buf: bytes, pos: int, end: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= end:
            raise ParquetError("delta: truncated varint")
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 70:
            raise ParquetError("delta: varint too long")


def _decode_delta_binary_packed(
    buf: bytes, pos: int, end: int, leaf_bits: int
) -> tuple[list[int], int]:
    """DELTA_BINARY_PACKED (parquet-format Encodings.md): header of
    (block_size, miniblocks_per_block, total_count, first_value), then
    blocks of (min_delta, per-miniblock bit widths, LSB-first bit-packed
    deltas). Values wrap at the physical width (two's complement)."""
    block_size, pos = _read_ule_varint(buf, pos, end)
    n_mini, pos = _read_ule_varint(buf, pos, end)
    total, pos = _read_ule_varint(buf, pos, end)
    if block_size <= 0 or block_size % 128 or n_mini <= 0 or block_size % n_mini:
        raise ParquetError("delta: invalid block geometry")
    per_mini = block_size // n_mini
    if per_mini % 32:
        raise ParquetError("delta: miniblock size not a multiple of 32")
    first_u, pos = _read_ule_varint(buf, pos, end)
    first = (first_u >> 1) ^ -(first_u & 1)
    out = [first]
    mod = 1 << leaf_bits
    half = mod >> 1
    cur = first
    while len(out) < total:
        md_u, pos = _read_ule_varint(buf, pos, end)
        min_delta = (md_u >> 1) ^ -(md_u & 1)
        if pos + n_mini > end:
            raise ParquetError("delta: truncated miniblock widths")
        widths = buf[pos : pos + n_mini]
        pos += n_mini
        for m in range(n_mini):
            if len(out) >= total:
                break  # trailing miniblocks of the last block carry no data
            bw = widths[m]
            if bw > leaf_bits + 1:
                raise ParquetError(f"delta: miniblock bit width {bw}")
            nbytes = per_mini * bw // 8
            if pos + nbytes > end:
                raise ParquetError("delta: truncated miniblock data")
            word = int.from_bytes(buf[pos : pos + nbytes], "little")
            pos += nbytes
            mask = (1 << bw) - 1
            take = min(per_mini, total - len(out))
            for i in range(take):
                d = ((word >> (i * bw)) & mask) + min_delta
                cur = cur + d
                # wrap to the physical width (the encoding is defined on
                # the two's-complement bit pattern)
                w = cur & (mod - 1)
                out.append(w - mod if w >= half else w)
            cur = out[-1]
    if total == 0:
        return [], pos
    return out[:total], pos


def _decode_delta_length_byte_array(
    buf: bytes, pos: int, end: int, n: int
) -> tuple[list[bytes], int]:
    lens, pos = _decode_delta_binary_packed(buf, pos, end, 32)
    if len(lens) < n:
        raise ParquetError("delta-length: fewer lengths than values")
    vals = []
    for ln in lens[:n]:
        if ln < 0 or pos + ln > end:
            raise ParquetError("delta-length: byte section truncated")
        vals.append(buf[pos : pos + ln])
        pos += ln
    return vals, pos


def _decode_delta_byte_array(
    buf: bytes, pos: int, end: int, n: int
) -> tuple[list[bytes], int]:
    prefixes, pos = _decode_delta_binary_packed(buf, pos, end, 32)
    if len(prefixes) < n:
        raise ParquetError("delta-byte-array: fewer prefixes than values")
    suffixes, pos = _decode_delta_length_byte_array(buf, pos, end, n)
    vals: list[bytes] = []
    prev = b""
    for pfx, sfx in zip(prefixes[:n], suffixes):
        if pfx < 0 or pfx > len(prev):
            raise ParquetError("delta-byte-array: prefix longer than previous value")
        prev = prev[:pfx] + sfx
        vals.append(prev)
    return vals, pos


def _decode_byte_stream_split(
    buf: bytes, pos: int, end: int, n: int, leaf: _Leaf
) -> tuple[list, int]:
    width = {"FLOAT": 4, "DOUBLE": 8, "INT32": 4, "INT64": 8}.get(leaf.physical_type)
    if width is None:
        if leaf.physical_type == "FIXED_LEN_BYTE_ARRAY" and leaf.type_length:
            width = leaf.type_length
        else:
            raise ParquetError(
                f"BYTE_STREAM_SPLIT unsupported for {leaf.physical_type}"
            )
    need = n * width
    if pos + need > end:
        raise ParquetError("byte-stream-split section truncated")
    streams = [buf[pos + k * n : pos + (k + 1) * n] for k in range(width)]
    pos += need
    raw = [bytes(streams[k][i] for k in range(width)) for i in range(n)]
    if leaf.physical_type == "FLOAT":
        return [struct.unpack("<f", b)[0] for b in raw], pos
    if leaf.physical_type == "DOUBLE":
        return [struct.unpack("<d", b)[0] for b in raw], pos
    if leaf.physical_type == "INT32":
        return [struct.unpack("<i", b)[0] for b in raw], pos
    if leaf.physical_type == "INT64":
        return [struct.unpack("<q", b)[0] for b in raw], pos
    return raw, pos


def _convert_logical(vals: list, leaf: _Leaf) -> list:
    """Apply the logical-type view: utf8 decode for strings; timestamps stay
    as raw epoch ints (callers choose the temporal presentation)."""
    lt = leaf.logical or {}
    if leaf.physical_type == "BYTE_ARRAY" and ("string" in lt or leaf.converted_type == 0):
        return [v if v is None else v.decode("utf-8") for v in vals]
    return vals


def iter_pages(chunk: bytes, codec: int) -> Iterator[tuple[dict[str, Any], bytes]]:
    """Walk the page stream of one column chunk, yielding
    ``(page_header, raw_page_bytes)`` — raw bytes still compressed; v2 pages
    carry their level sections uncompressed up front, handled by the caller."""
    pos = 0
    n = len(chunk)
    while pos < n:
        th = _Thrift(chunk, pos)
        hdr = th.read_struct(_PAGE_HEADER)
        pos = th.pos
        for req in ("type", "uncompressed_page_size", "compressed_page_size"):
            if req not in hdr:
                raise ParquetError(f"page header missing {req}")
        csize = hdr["compressed_page_size"]
        if pos + csize > n:
            raise ParquetError("page body overruns column chunk")
        body = chunk[pos : pos + csize]
        crc = hdr.get("crc")
        if crc is not None and zlib.crc32(body) != (crc & 0xFFFFFFFF):
            # spec: CRC-32 over the page bytes as written, header excluded
            raise ParquetError("page CRC mismatch (corrupt page body)")
        yield hdr, body
        pos += csize


def decode_column_chunk(chunk: bytes, cm: dict[str, Any], leaf: _Leaf) -> list:
    """Decode every value of one column chunk (dictionary + data pages) to a
    Python list with ``None`` for nulls. Flat columns only (max_rep_level
    0); nested columns refuse (the raw-scan contract covers scalars)."""
    if leaf.max_rep_level != 0:
        raise ParquetError("raw decode of repeated (nested) columns is not supported")
    codec = cm["codec"]
    n_total = cm["num_values"]
    dictionary: list | None = None
    out: list = []
    for hdr, body in iter_pages(chunk, codec):
        ptype = hdr["type"]
        if ptype == 2:  # dictionary page
            dph = hdr.get("dictionary_page_header")
            if dph is None:
                raise ParquetError("dictionary page without header struct")
            if dph.get("encoding") not in (0, 2):  # PLAIN / PLAIN_DICTIONARY
                raise ParquetError("non-PLAIN dictionary page encoding")
            data = _decompress(codec, body, hdr["uncompressed_page_size"])
            vals, pos = _decode_plain(data, 0, len(data), dph["num_values"], leaf)
            if pos != len(data):
                raise ParquetError("dictionary page has trailing bytes")
            dictionary = vals
            continue
        if ptype == 0:  # data page v1
            dh = hdr.get("data_page_header")
            if dh is None:
                raise ParquetError("data page v1 without header struct")
            nv = dh["num_values"]
            enc = dh["encoding"]
            data = _decompress(codec, body, hdr["uncompressed_page_size"])
            pos, end = 0, len(data)
            if leaf.max_def_level > 0:
                if dh.get("definition_level_encoding", 3) != 3:
                    raise ParquetError("non-RLE definition levels in v1 page")
                if pos + 4 > end:
                    raise ParquetError("def-level length truncated")
                (ll,) = struct.unpack_from("<I", data, pos)
                pos += 4
                if pos + ll > end:
                    raise ParquetError("def-level section truncated")
                bw = max(leaf.max_def_level.bit_length(), 1)
                defs, _ = _read_rle_hybrid(data, pos, pos + ll, bw, nv)
                pos += ll
            else:
                defs = [leaf.max_def_level] * nv
        elif ptype == 3:  # data page v2
            dh = hdr.get("data_page_header_v2")
            if dh is None:
                raise ParquetError("data page v2 without header struct")
            nv = dh["num_values"]
            enc = dh["encoding"]
            rl = dh.get("repetition_levels_byte_length", 0)
            dl = dh.get("definition_levels_byte_length", 0)
            if rl:
                raise ParquetError("repetition levels on a flat column")
            levels = body[: rl + dl]
            values_raw = body[rl + dl :]
            if dh.get("is_compressed", True):
                data = _decompress(
                    codec, values_raw, hdr["uncompressed_page_size"] - rl - dl
                )
            else:
                data = values_raw
            if leaf.max_def_level > 0:
                bw = max(leaf.max_def_level.bit_length(), 1)
                defs, _ = _read_rle_hybrid(levels, rl, rl + dl, bw, nv)
            else:
                defs = [leaf.max_def_level] * nv
            pos, end = 0, len(data)
        elif ptype == 1:  # index page: no values
            continue
        else:
            raise ParquetError(f"unsupported page type {ptype}")

        n_present = defs.count(leaf.max_def_level)
        if enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
            if dictionary is None:
                raise ParquetError("dictionary-encoded page before dictionary page")
            if n_present:
                if pos >= end:
                    raise ParquetError("dictionary index section truncated")
                bw = data[pos]
                pos += 1
                if bw > 32:
                    raise ParquetError(f"dictionary index bit width {bw}")
                idxs, pos = _read_rle_hybrid(data, pos, end, bw, n_present)
                try:
                    present = [dictionary[i] for i in idxs]
                except IndexError:
                    raise ParquetError("dictionary index out of range") from None
            else:
                present = []
        elif enc == 0:  # PLAIN
            present, pos = _decode_plain(data, pos, end, n_present, leaf)
        elif enc == 5:  # DELTA_BINARY_PACKED
            if leaf.physical_type not in ("INT32", "INT64"):
                raise ParquetError("DELTA_BINARY_PACKED on a non-integer column")
            bits = 32 if leaf.physical_type == "INT32" else 64
            if n_present:
                present, pos = _decode_delta_binary_packed(data, pos, end, bits)
                if len(present) != n_present:
                    raise ParquetError(
                        f"delta page decoded {len(present)} of {n_present} values"
                    )
            else:
                present = []
        elif enc == 6:  # DELTA_LENGTH_BYTE_ARRAY
            if leaf.physical_type != "BYTE_ARRAY":
                raise ParquetError("DELTA_LENGTH_BYTE_ARRAY on a non-byte-array column")
            present, pos = _decode_delta_length_byte_array(data, pos, end, n_present)
        elif enc == 7:  # DELTA_BYTE_ARRAY
            if leaf.physical_type not in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
                raise ParquetError("DELTA_BYTE_ARRAY on an unsupported column type")
            present, pos = _decode_delta_byte_array(data, pos, end, n_present)
        elif enc == 9:  # BYTE_STREAM_SPLIT
            present, pos = _decode_byte_stream_split(data, pos, end, n_present, leaf)
        elif enc == 3 and leaf.physical_type == "BOOLEAN":
            # RLE-encoded boolean values (the v2-page default): 4-byte LE
            # section length, then hybrid runs at bit width 1
            if pos + 4 > end:
                raise ParquetError("rle boolean section length truncated")
            (ll,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if pos + ll > end:
                raise ParquetError("rle boolean section truncated")
            bits, _ = _read_rle_hybrid(data, pos, pos + ll, 1, n_present)
            pos += ll
            present = [bool(b) for b in bits]
        else:
            raise ParquetError(f"unsupported data encoding {ENCODINGS.get(enc, enc)}")
        if n_present == len(defs):  # no nulls on this page: plain extend
            out.extend(present)
        else:
            it = iter(present)
            out.extend(next(it) if d == leaf.max_def_level else None for d in defs)
    if len(out) != n_total:
        raise ParquetError(f"chunk declared {n_total} values, decoded {len(out)}")
    return _convert_logical(out, leaf)


def read_page_index(path: str, meta: dict[str, Any], rg_id: int, column: str) -> list[dict[str, Any]]:
    """Parse the PAGE INDEX of one column chunk — the OffsetIndex (page
    offsets + first row indexes) zipped with the ColumnIndex (per-page
    null_pages / typed min / max / null_counts). This is the sub-row-group
    pruning granularity: a point lookup at 100 TB plans (file -> row group
    -> page) from these rows alone, reading zero data pages. Refuses when
    the file carries no index for the chunk."""
    leaves = {lf.path: lf for lf in schema_leaves(meta)}
    leaf = leaves.get(column)
    if leaf is None:
        raise ParquetError(f"unknown column {column}")
    rg = meta["row_groups"][rg_id]
    cc = None
    for cand in rg["columns"]:
        if ".".join(cand["meta_data"]["path_in_schema"]) == column:
            cc = cand
            break
    if cc is None:
        raise ParquetError(f"row group {rg_id} has no column {column}")
    oi_off, oi_len = cc.get("offset_index_offset"), cc.get("offset_index_length")
    ci_off, ci_len = cc.get("column_index_offset"), cc.get("column_index_length")
    if oi_off is None or ci_off is None:
        raise ParquetError(f"column {column} carries no page index")
    with open(path, "rb") as fh:
        fh.seek(oi_off)
        oi_raw = fh.read(oi_len)
        fh.seek(ci_off)
        ci_raw = fh.read(ci_len)
    if len(oi_raw) != oi_len or len(ci_raw) != ci_len:
        raise ParquetError("page index byte range overruns file")
    oi = _Thrift(oi_raw).read_struct(_OFFSET_INDEX)
    ci = _Thrift(ci_raw).read_struct(_COLUMN_INDEX)
    locs = oi.get("page_locations") or []
    nulls = ci.get("null_pages") or []
    mins = ci.get("min_values") or []
    maxs = ci.get("max_values") or []
    ncounts = ci.get("null_counts") or [None] * len(locs)
    if not (len(locs) == len(nulls) == len(mins) == len(maxs)):
        raise ParquetError("offset/column index page counts disagree")
    n_rg_rows = rg["num_rows"]
    out = []
    for i, loc in enumerate(locs):
        first = loc["first_row_index"]
        last = (
            locs[i + 1]["first_row_index"] - 1 if i + 1 < len(locs) else n_rg_rows - 1
        )
        out.append(
            {
                "page": i,
                "offset": loc["offset"],
                "compressed_page_size": loc["compressed_page_size"],
                "first_row_index": first,
                "last_row_index": last,
                "null_page": nulls[i],
                "min": None if nulls[i] else _decode_stat(mins[i], leaf),
                "max": None if nulls[i] else _decode_stat(maxs[i], leaf),
                "null_count": ncounts[i] if i < len(ncounts) else None,
                "boundary_order": ci.get("boundary_order"),
            }
        )
    return out


def _chunk_byte_range(cm: dict[str, Any]) -> tuple[int, int]:
    start = cm["data_page_offset"]
    dpo = cm.get("dictionary_page_offset")
    if dpo is not None and 0 < dpo < start:
        start = dpo
    return start, start + cm["total_compressed_size"]


def read_row_group(path: str, meta: dict[str, Any], rg_id: int, columns: list[str]) -> dict[str, list]:
    """Decode the requested columns of one row group via ranged reads —
    the executor-side task body of ``raw_scan``."""
    leaves = {lf.path: lf for lf in schema_leaves(meta)}
    rg = meta["row_groups"][rg_id]
    by_path = {".".join(cc["meta_data"]["path_in_schema"]): cc for cc in rg["columns"]}
    out: dict[str, list] = {}
    with open(path, "rb") as fh:
        for col in columns:
            cc = by_path.get(col)
            if cc is None:
                raise ParquetError(f"row group {rg_id} has no column {col}")
            cm = cc["meta_data"]
            start, end = _chunk_byte_range(cm)
            fh.seek(start)
            chunk = fh.read(end - start)
            if len(chunk) != end - start:
                raise ParquetError("column chunk byte range overruns file")
            out[col] = decode_column_chunk(chunk, cm, leaves[col])
    return out


# ---------------------------------------------------------------------------
# Writer: thrift compact encoder + PLAIN v1 pages
# ---------------------------------------------------------------------------


class _ThriftW:
    """Minimal Thrift Compact Protocol writer (the footer/page-header wire
    format). Mirrors _Thrift; every struct the reader parses, this can emit."""

    __slots__ = ("out",)

    def __init__(self):
        self.out = bytearray()

    def varint(self, v: int) -> None:
        while v >= 0x80:
            self.out.append((v & 0x7F) | 0x80)
            v >>= 7
        self.out.append(v)

    def zigzag(self, v: int) -> None:
        self.varint((v << 1) ^ (v >> 63) if v < 0 else v << 1)

    def field(self, last_id: int, field_id: int, ctype: int) -> int:
        delta = field_id - last_id
        if 1 <= delta <= 15:
            self.out.append((delta << 4) | ctype)
        else:
            self.out.append(ctype)
            self.zigzag(field_id)
        return field_id

    def i_field(self, last_id: int, field_id: int, v: int, ctype: int = _CT_I64) -> int:
        last_id = self.field(last_id, field_id, ctype)
        self.zigzag(v)
        return last_id

    def bool_field(self, last_id: int, field_id: int, v: bool) -> int:
        return self.field(last_id, field_id, _CT_TRUE if v else _CT_FALSE)

    def bin_field(self, last_id: int, field_id: int, v: bytes) -> int:
        last_id = self.field(last_id, field_id, _CT_BINARY)
        self.varint(len(v))
        self.out += v
        return last_id

    def list_header(self, size: int, etype: int) -> None:
        if size < 15:
            self.out.append((size << 4) | etype)
        else:
            self.out.append(0xF0 | etype)
            self.varint(size)

    def stop(self) -> None:
        self.out.append(_CT_STOP)


# writer column kinds -> (physical type id, converted_type, logical writer)
_W_KINDS = {"i64", "i32", "f64", "f32", "bool", "str", "bin", "ts_us"}


def _w_physical(kind: str) -> int:
    return {
        "bool": 0,
        "i32": 1,
        "i64": 2,
        "ts_us": 2,
        "f32": 4,
        "f64": 5,
        "str": 6,
        "bin": 6,
    }[kind]


def _w_logical(w: _ThriftW, last: int, kind: str) -> int:
    """Emit converted_type (6) and logical_type (10) for kinds that have
    one — the pair every mainstream reader agrees on."""
    if kind == "str":
        last = w.field(last, 6, _CT_I32)
        w.zigzag(0)  # UTF8
        last = w.field(last, 10, _CT_STRUCT)
        inner = _ThriftW()
        inner.field(0, 1, _CT_STRUCT)  # LogicalType.STRING
        inner.stop()  # empty StringType
        inner.stop()
        w.out += inner.out
    elif kind == "ts_us":
        last = w.field(last, 6, _CT_I32)
        w.zigzag(10)  # TIMESTAMP_MICROS
        last = w.field(last, 10, _CT_STRUCT)
        lt = _ThriftW()
        lt.field(0, 8, _CT_STRUCT)  # LogicalType.TIMESTAMP
        tlast = lt.bool_field(0, 1, False)  # isAdjustedToUTC
        tlast = lt.field(tlast, 2, _CT_STRUCT)  # unit
        lt.field(0, 2, _CT_STRUCT)  # TimeUnit.MICROS
        lt.stop()  # empty MicroSeconds
        lt.stop()  # TimeUnit
        lt.stop()  # TimestampType
        lt.stop()  # LogicalType union
        w.out += lt.out
    return last


def _plain_encode(vals: list, kind: str) -> bytes:
    if kind in ("i64", "ts_us"):
        return struct.pack(f"<{len(vals)}q", *vals)
    if kind == "i32":
        return struct.pack(f"<{len(vals)}i", *vals)
    if kind == "f64":
        return struct.pack(f"<{len(vals)}d", *vals)
    if kind == "f32":
        return struct.pack(f"<{len(vals)}f", *vals)
    if kind == "bool":
        word = 0
        for i, v in enumerate(vals):
            if v:
                word |= 1 << i
        return word.to_bytes((len(vals) + 7) // 8, "little")
    out = bytearray()
    for v in vals:
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        out += struct.pack("<I", len(b))
        out += b
    return bytes(out)


def _rle_bitpacked_defs(defs: list[int]) -> bytes:
    """Definition levels at bit width 1 (hybrid runs: all-present pages
    collapse to one 3-byte RLE run), with the v1 4-byte length prefix."""
    payload = _hybrid_encode(defs, 1)
    return struct.pack("<I", len(payload)) + payload


def _w_ule(out: bytearray, v: int) -> None:
    """Unsigned LEB128 (the DELTA_* header/varint form)."""
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _zz64(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _encode_delta_binary_packed(
    vals: list[int], *, block_size: int = 128, n_mini: int = 4
) -> bytes:
    """DELTA_BINARY_PACKED encoder (parquet-format Encodings.md), the
    inverse of _decode_delta_binary_packed: header of (block_size,
    miniblocks_per_block, total_count, zigzag first_value), then per
    block a zigzag min_delta, one bit-width byte per miniblock, and the
    LSB-first bit-packed (delta - min_delta) payloads. Partial final
    miniblocks are zero-padded to their full per-miniblock byte size;
    miniblocks wholly past the data get width 0 and no payload (the
    parquet-java convention both our decoder and pyarrow accept).
    Deltas wrap to signed 64-bit — the encoding is defined on the
    two's-complement bit pattern."""
    out = bytearray()
    _w_ule(out, block_size)
    _w_ule(out, n_mini)
    _w_ule(out, len(vals))
    first = vals[0] if vals else 0
    _w_ule(out, _zz64(first))
    per_mini = block_size // n_mini
    mod = 1 << 64
    half = mod >> 1
    prev = first
    i = 1
    while i < len(vals):
        block = vals[i : i + block_size]
        deltas = []
        for v in block:
            d = (v - prev) & (mod - 1)
            deltas.append(d - mod if d >= half else d)
            prev = v
        min_d = min(deltas)
        packed = [d - min_d for d in deltas]
        _w_ule(out, _zz64(min_d))
        widths = []
        payloads = []
        for m in range(n_mini):
            chunk = packed[m * per_mini : (m + 1) * per_mini]
            if not chunk:
                widths.append(0)
                payloads.append(b"")
                continue
            bw = max(x.bit_length() for x in chunk)
            widths.append(bw)
            if bw:
                word = 0
                for j, x in enumerate(chunk):
                    word |= x << (j * bw)
                payloads.append(word.to_bytes(per_mini * bw // 8, "little"))
            else:
                payloads.append(b"")
        out += bytes(widths)
        for p in payloads:
            out += p
        i += block_size
    return bytes(out)


def _encode_delta_byte_array(vals: list[bytes]) -> bytes:
    """DELTA_BYTE_ARRAY (incremental/front coding): shared-prefix lengths
    as DELTA_BINARY_PACKED, then the suffixes as DELTA_LENGTH_BYTE_ARRAY
    (suffix lengths DELTA_BINARY_PACKED + concatenated bytes). The
    encoding parquet-java picks for sorted string columns in v2 pages —
    adjacent sorted keys share long prefixes, so this is the layout a
    100 TB sorted-key corpus actually ships."""
    prefixes: list[int] = []
    suffixes: list[bytes] = []
    prev = b""
    for v in vals:
        p = 0
        lim = min(len(prev), len(v))
        while p < lim and prev[p] == v[p]:
            p += 1
        prefixes.append(p)
        suffixes.append(v[p:])
        prev = v
    return (
        _encode_delta_binary_packed(prefixes)
        + _encode_delta_binary_packed([len(s) for s in suffixes])
        + b"".join(suffixes)
    )


def _hybrid_encode(values: list[int], bit_width: int) -> bytes:
    """RLE/bit-packed hybrid encoder (the levels + dictionary-index wire
    format): repeats of >= 8 become RLE runs; everything else accumulates
    into bit-packed groups of 8 (padding only ever lands in the FINAL
    group, which readers never consume past the declared value count)."""
    out = bytearray()
    byte_w = max((bit_width + 7) // 8, 1)

    def put_varint(v: int) -> None:
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)

    def flush_groups(buf: list[int]) -> None:
        if not buf:
            return
        pad = (-len(buf)) % 8
        padded = buf + [0] * pad
        groups = len(padded) // 8
        put_varint((groups << 1) | 1)
        word = 0
        for i, v in enumerate(padded):
            word |= v << (i * bit_width)
        out.extend(word.to_bytes(groups * bit_width, "little"))
        buf.clear()

    i = 0
    n = len(values)
    lit: list[int] = []
    while i < n:
        j = i
        while j < n and values[j] == values[i]:
            j += 1
        run = j - i
        if run >= 8 and len(lit) % 8 == 0:
            flush_groups(lit)  # exact multiple of 8 — no mid-stream padding
            put_varint(run << 1)
            out.extend((values[i]).to_bytes(byte_w, "little"))
            i = j
        elif run >= 8:
            # top the literal buffer up to an 8-boundary from the run head,
            # then reconsider the (still >= 1) remaining run next pass
            take = 8 - (len(lit) % 8)
            lit.extend(values[i : i + take])
            flush_groups(lit)
            i += take
        else:
            lit.extend(values[i:j])
            keep = len(lit) % 8
            if len(lit) >= 8:
                head, lit = lit[: len(lit) - keep], lit[len(lit) - keep :]
                flush_groups(head)
            i = j
    flush_groups(lit)  # only the FINAL group may carry padding
    return bytes(out)


def _crc_i32(body: bytes) -> int:
    """Page CRC-32 (zlib polynomial, over the bytes as written) as the
    signed i32 the thrift field carries."""
    c = zlib.crc32(body)
    return c - (1 << 32) if c >= (1 << 31) else c


def _ci_encode(v, kind: str) -> bytes:
    """Typed bound encoding for ColumnIndex min/max (the chunk-statistics
    wire format). Strings compare as unsigned UTF-8 bytes under TYPE_ORDER,
    which python's str ordering matches for valid UTF-8."""
    if kind in ("i64", "ts_us"):
        return struct.pack("<q", v)
    if kind == "i32":
        return struct.pack("<i", v)
    if kind == "f64":
        return struct.pack("<d", v)
    if kind == "f32":
        return struct.pack("<f", v)
    if kind == "bool":
        return b"\x01" if v else b"\x00"
    if kind == "str":
        return v.encode("utf-8")
    return bytes(v)


def _w_stats(w: _ThriftW, last: int, vals_present: list, kind: str, n_nulls: int) -> int:
    """Statistics struct: null_count always; typed min/max for numeric and
    timestamp kinds (string/binary ordering is reader-defined, so omitted).
    Float bounds are VOIDED when any value is NaN — NaN is unordered, so
    Python's min/max would return position-dependent (possibly NaN) bounds
    and an external reader pruning on them could skip row groups that hold
    matching rows; same rule as the page index (_ci_encode caller) and the
    ORC writer."""
    last = w.field(last, 12, _CT_STRUCT)
    st = _ThriftW()
    slast = st.i_field(0, 3, n_nulls)
    if kind in ("f64", "f32") and any(v != v for v in vals_present):
        vals_present = []
    if vals_present and kind in ("i64", "i32", "ts_us", "f64", "f32"):
        mn, mx = min(vals_present), max(vals_present)
        fmt = {"i64": "<q", "ts_us": "<q", "i32": "<i", "f64": "<d", "f32": "<f"}[kind]
        slast = st.bin_field(slast, 5, struct.pack(fmt, mx))
        slast = st.bin_field(slast, 6, struct.pack(fmt, mn))
    st.stop()
    w.out += st.out
    return last


def encode_parquet(
    cols: dict[str, list],
    kinds: dict[str, str],
    *,
    codec: str = "snappy",
    use_dictionary: bool = True,
    write_page_index: bool = True,
    rows_per_page: int = 20000,
    created_by: str = "vectorflow-spark parquetmini",
    bloom_columns: list[str] | None = None,
    bloom_fpp: float = 0.01,
    delta_columns: list[str] | None = None,
) -> bytes:
    """Serialize one row group of named columns to a complete parquet file
    (v1 pages — dictionary-encoded when a column's distinct set is small,
    PLAIN otherwise — optional fields with RLE/bit-packed def levels, typed
    stats, our snappy or stdlib gzip page compression). Every column list must share
    one length; ``kinds[name]`` picks the physical/logical type from
    {i64,i32,f64,f32,bool,str,bin,ts_us} (ts_us takes epoch micros).

    ``delta_columns`` opts columns into DATA_PAGE_V2 pages with the
    modern DELTA encodings — DELTA_BINARY_PACKED for i64/i32/ts_us,
    DELTA_BYTE_ARRAY (front coding) for str/bin — the layout
    parquet-java v2 writers emit for sorted keys (v2 pages keep levels
    uncompressed with explicit byte lengths and compress only the values
    section).

    The output is read back by pyarrow, DuckDB, Spark's parquet-java reader
    AND this module's own decoder — the tests pin all four."""
    names = list(cols)
    if not names:
        raise ParquetError("encode_parquet needs at least one column")
    n_rows = len(cols[names[0]])
    for c in names:
        if len(cols[c]) != n_rows:
            raise ParquetError("ragged columns")
        if kinds.get(c) not in _W_KINDS:
            raise ParquetError(f"unsupported writer kind {kinds.get(c)} for {c}")
    codec_id = {
        "none": 0, "uncompressed": 0, "snappy": 1, "gzip": 2, "lz4": 7, "lz4_raw": 7
    }.get(codec)
    if codec_id is None:
        raise ParquetError(f"unsupported writer codec {codec}")
    if n_rows == 0:
        # an empty row group is a reader minefield; callers skip empty parts
        raise ParquetError("cannot encode zero rows")
    delta_set = set(delta_columns or ())
    for c in delta_set:
        if c not in cols:
            raise ParquetError(f"delta_columns names unknown column {c}")
        if kinds[c] not in ("i64", "i32", "ts_us", "str", "bin"):
            raise ParquetError(
                f"DELTA encodings undefined for kind {kinds[c]} (column {c})"
            )

    from vectorflow_spark.operators.snappymini import compress as _snappy_compress

    def compress(data: bytes) -> bytes:
        if codec_id == 1:
            return _snappy_compress(data)
        if codec_id == 2:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            return co.compress(data) + co.flush()
        if codec_id == 7:
            from vectorflow_spark.operators.lz4mini import compress as _lz4_compress

            return _lz4_compress(data)
        return data

    out = bytearray(MAGIC)
    chunk_meta: list[dict[str, Any]] = []
    for name in names:
        kind = kinds[name]
        vals = cols[name]
        offset = len(out)
        comp_total = 0
        uncomp_total = 0
        all_present = [v for v in vals if v is not None]
        n_nulls = n_rows - len(all_present)

        use_delta = name in delta_set
        # dictionary decision: hashable kinds with a small distinct set
        # (floats excluded — NaN breaks dict-key equality); delta columns
        # carry their own encoding and never dictionary-encode
        dict_vals: list | None = None
        if (
            use_dictionary
            and not use_delta
            and kind in ("i64", "i32", "ts_us", "str", "bin")
            and all_present
        ):
            seen: dict = {}
            for v in all_present:
                if v not in seen:
                    seen[v] = len(seen)
                    if len(seen) > 65536:
                        break
            if len(seen) <= 65536 and len(seen) <= max(1, len(all_present) // 2):
                dict_vals = list(seen)
                dict_idx = seen
        dict_page_offset = None
        if dict_vals is not None:
            dict_page_offset = offset
            body = _plain_encode(dict_vals, kind)
            comp = compress(body)
            hdr = _ThriftW()
            last = hdr.i_field(0, 1, 2, _CT_I32)  # PageType.DICTIONARY_PAGE
            last = hdr.i_field(last, 2, len(body), _CT_I32)
            last = hdr.i_field(last, 3, len(comp), _CT_I32)
            last = hdr.i_field(last, 4, _crc_i32(comp), _CT_I32)
            last = hdr.field(last, 7, _CT_STRUCT)
            dph = _ThriftW()
            dlast = dph.i_field(0, 1, len(dict_vals), _CT_I32)
            dlast = dph.i_field(dlast, 2, 2, _CT_I32)  # Encoding.PLAIN_DICTIONARY
            dph.stop()
            hdr.out += dph.out
            hdr.stop()
            out += hdr.out
            out += comp
            comp_total += len(hdr.out) + len(comp)
            uncomp_total += len(hdr.out) + len(body)

        data_page_offset = len(out)
        page_records: list[dict[str, Any]] | None = [] if write_page_index else None
        for start in range(0, n_rows, rows_per_page):
            page_start = len(out)
            page_vals = vals[start : start + rows_per_page]
            defs = [0 if v is None else 1 for v in page_vals]
            present = [v for v in page_vals if v is not None]
            if page_records is not None:
                if kind in ("f32", "f64") and any(v != v for v in present):
                    page_records = None  # NaN bounds lie; drop this column's index
                else:
                    page_records.append(
                        {
                            "offset": page_start,
                            "first_row": start,
                            "null_page": not present,
                            "min": min(present) if present else None,
                            "max": max(present) if present else None,
                            "null_count": len(page_vals) - len(present),
                        }
                    )
            if use_delta:
                # DATA_PAGE_V2: [def levels, UNcompressed, explicit length]
                # [values, DELTA-encoded, compressed] — the modern layout
                if kind in ("str", "bin"):
                    raw = [
                        v.encode("utf-8") if isinstance(v, str) else bytes(v)
                        for v in present
                    ]
                    values_bytes = _encode_delta_byte_array(raw)
                    page_enc = 7  # DELTA_BYTE_ARRAY
                else:
                    values_bytes = _encode_delta_binary_packed(present)
                    page_enc = 5  # DELTA_BINARY_PACKED
                dl_bytes = _hybrid_encode(defs, 1)  # no v1 length prefix
                comp_vals = compress(values_bytes)
                disk_body = dl_bytes + comp_vals
                hdr = _ThriftW()
                last = hdr.i_field(0, 1, 3, _CT_I32)  # PageType.DATA_PAGE_V2
                last = hdr.i_field(last, 2, len(dl_bytes) + len(values_bytes), _CT_I32)
                last = hdr.i_field(last, 3, len(disk_body), _CT_I32)
                # crc covers the serialized page: levels + compressed values
                last = hdr.i_field(last, 4, _crc_i32(disk_body), _CT_I32)
                last = hdr.field(last, 8, _CT_STRUCT)
                dph = _ThriftW()
                dlast = dph.i_field(0, 1, len(page_vals), _CT_I32)
                dlast = dph.i_field(dlast, 2, len(page_vals) - len(present), _CT_I32)
                dlast = dph.i_field(dlast, 3, len(page_vals), _CT_I32)  # num_rows (flat)
                dlast = dph.i_field(dlast, 4, page_enc, _CT_I32)
                dlast = dph.i_field(dlast, 5, len(dl_bytes), _CT_I32)
                dlast = dph.i_field(dlast, 6, 0, _CT_I32)  # rep levels: none
                dlast = dph.bool_field(dlast, 7, codec_id != 0)
                dph.stop()
                hdr.out += dph.out
                hdr.stop()
                out += hdr.out
                out += disk_body
                comp_total += len(hdr.out) + len(disk_body)
                uncomp_total += len(hdr.out) + len(dl_bytes) + len(values_bytes)
                if page_records is not None:
                    page_records[-1]["size"] = len(out) - page_start
                continue
            if dict_vals is not None:
                bw = max((len(dict_vals) - 1).bit_length(), 1)
                idx_bytes = _hybrid_encode([dict_idx[v] for v in present], bw)
                values_bytes = bytes([bw]) + idx_bytes
                page_enc = 2  # PLAIN_DICTIONARY (the v1 data-page id)
            else:
                values_bytes = _plain_encode(present, kind)
                page_enc = 0  # PLAIN
            body = _rle_bitpacked_defs(defs) + values_bytes
            comp = compress(body)
            hdr = _ThriftW()
            last = hdr.i_field(0, 1, 0, _CT_I32)  # PageType.DATA_PAGE
            last = hdr.i_field(last, 2, len(body), _CT_I32)
            last = hdr.i_field(last, 3, len(comp), _CT_I32)
            last = hdr.i_field(last, 4, _crc_i32(comp), _CT_I32)
            last = hdr.field(last, 5, _CT_STRUCT)
            dph = _ThriftW()
            dlast = dph.i_field(0, 1, len(page_vals), _CT_I32)
            dlast = dph.i_field(dlast, 2, page_enc, _CT_I32)
            dlast = dph.i_field(dlast, 3, 3, _CT_I32)  # def levels: RLE
            dlast = dph.i_field(dlast, 4, 3, _CT_I32)  # rep levels: RLE (absent)
            dph.stop()
            hdr.out += dph.out
            hdr.stop()
            out += hdr.out
            out += comp
            comp_total += len(hdr.out) + len(comp)
            uncomp_total += len(hdr.out) + len(body)
            if page_records is not None:
                page_records[-1]["size"] = len(out) - page_start
        chunk_meta.append(
            {
                "name": name,
                "kind": kind,
                "offset": offset,
                "dict_page_offset": dict_page_offset,
                "data_page_offset": data_page_offset,
                "comp": comp_total,
                "uncomp": uncomp_total,
                "n_nulls": n_nulls,
                "present": all_present,
                "dict": dict_vals is not None,
                "enc": (
                    (7 if kind in ("str", "bin") else 5)
                    if use_delta
                    else (2 if dict_vals is not None else 0)
                ),
                "pages": page_records,
            }
        )

    # page indexes: after all row-group data, before the footer
    # (ColumnIndex + OffsetIndex per chunk, referenced from ColumnChunk)
    for m in chunk_meta:
        pages = m["pages"]
        if not pages:
            m["ci"] = m["oi"] = None
            continue
        kind = m["kind"]
        ci = _ThriftW()
        cilast = ci.field(0, 1, _CT_LIST)
        ci.list_header(len(pages), _CT_TRUE)
        for p in pages:
            ci.out.append(1 if p["null_page"] else 2)  # bool list elements
        mins = [b"" if p["null_page"] else _ci_encode(p["min"], kind) for p in pages]
        maxs = [b"" if p["null_page"] else _ci_encode(p["max"], kind) for p in pages]
        nonnull = [i for i, p in enumerate(pages) if not p["null_page"]]
        # boundary order from ONE pairwise pass over typed keys (encoded
        # bytes for str/bin — unsigned lex — raw values otherwise)
        if kind in ("str", "bin"):
            keys = [(mins[i], maxs[i]) for i in nonnull]
        else:
            keys = [(pages[i]["min"], pages[i]["max"]) for i in nonnull]
        # componentwise (NOT lexicographic): asc iff mins AND maxs both
        # never decrease (parquet-format BoundaryOrder rules)
        asc = all(a[0] <= b[0] and a[1] <= b[1] for a, b in zip(keys, keys[1:]))
        desc = all(a[0] >= b[0] and a[1] >= b[1] for a, b in zip(keys, keys[1:]))
        for fid, blobs in ((2, mins), (3, maxs)):
            cilast = ci.field(cilast, fid, _CT_LIST)
            ci.list_header(len(blobs), _CT_BINARY)
            for b in blobs:
                ci.varint(len(b))
                ci.out += b
        cilast = ci.i_field(cilast, 4, 1 if asc else (2 if desc else 0), _CT_I32)
        cilast = ci.field(cilast, 5, _CT_LIST)
        ci.list_header(len(pages), _CT_I64)
        for p in pages:
            ci.zigzag(p["null_count"])
        ci.stop()
        ci_off = len(out)
        out += ci.out
        oi = _ThriftW()
        oi.field(0, 1, _CT_LIST)
        oi.list_header(len(pages), _CT_STRUCT)
        for p in pages:
            loc = _ThriftW()
            llast = loc.i_field(0, 1, p["offset"])
            llast = loc.i_field(llast, 2, p["size"], _CT_I32)
            llast = loc.i_field(llast, 3, p["first_row"])
            loc.stop()
            oi.out += loc.out
        oi.stop()
        oi_off = len(out)
        out += oi.out
        m["ci"] = (ci_off, len(ci.out))
        m["oi"] = (oi_off, len(oi.out))

    # split-block bloom filters: after the page indexes, before the footer.
    # Sized from the TRUE distinct count (we hold the whole chunk) instead
    # of a caller NDV hint; bitset bytes rounded up to a power of two with
    # the parquet-java floor of 32 B. Readers seek via ColumnMetaData
    # fields 14/15, so placement is free.
    for m in chunk_meta:
        m["bloom"] = None
        if not bloom_columns or m["name"] not in bloom_columns:
            continue
        kind = m["kind"]
        fmt = {"i64": "<q", "ts_us": "<q", "i32": "<i", "f64": "<d", "f32": "<f"}.get(kind)
        if fmt is None and kind not in ("str", "bin"):
            raise ParquetError(f"bloom filters unsupported for kind {kind}")
        from vectorflow_spark.functions.xxh import xxh64 as _xxh64

        distinct = set(m["present"])
        import math as _math

        n_bits = max(1, int(-len(distinct) * _math.log(bloom_fpp) / (_math.log(2) ** 2)))
        num_bytes = 32
        while num_bytes * 8 < n_bits and num_bytes < (1 << 22):
            num_bytes *= 2
        bitset = bytearray(num_bytes)
        n_blocks = num_bytes // 32
        for v in distinct:
            plain = (
                struct.pack(fmt, v)
                if fmt
                else (v.encode("utf-8") if isinstance(v, str) else bytes(v))
            )
            h = _xxh64(plain, 0)
            block = ((h >> 32) * n_blocks) >> 32
            x = h & 0xFFFFFFFF
            for i in range(8):
                bit = ((x * _BLOOM_SALT[i]) & 0xFFFFFFFF) >> 27
                woff = block * 32 + i * 4
                (w,) = struct.unpack_from("<I", bitset, woff)
                struct.pack_into("<I", bitset, woff, w | (1 << bit))
        bh = _ThriftW()
        blast = bh.i_field(0, 1, num_bytes, _CT_I32)
        for fid in (2, 3, 4):  # algorithm=block, hash=xxhash, compression=off
            blast = bh.field(blast, fid, _CT_STRUCT)
            union = _ThriftW()
            union.field(0, 1, _CT_STRUCT)  # union member 1
            union.stop()  # empty member struct
            union.stop()  # union
            bh.out += union.out
        bh.stop()
        bloom_off = len(out)
        out += bh.out
        out += bitset
        m["bloom"] = (bloom_off, len(bh.out) + num_bytes)

    # FileMetaData
    fm = _ThriftW()
    last = fm.i_field(0, 1, 1, _CT_I32)  # version
    last = fm.field(last, 2, _CT_LIST)
    fm.list_header(len(names) + 1, _CT_STRUCT)
    root = _ThriftW()
    rlast = root.bin_field(0, 4, b"schema")
    rlast = root.i_field(rlast, 5, len(names), _CT_I32)
    root.stop()
    fm.out += root.out
    for m in chunk_meta:
        el = _ThriftW()
        elast = el.i_field(0, 1, _w_physical(m["kind"]), _CT_I32)
        elast = el.i_field(elast, 3, 1, _CT_I32)  # OPTIONAL
        elast = el.bin_field(elast, 4, m["name"].encode("utf-8"))
        elast = _w_logical(el, elast, m["kind"])
        el.stop()
        fm.out += el.out
    last = fm.i_field(last, 3, n_rows)
    last = fm.field(last, 4, _CT_LIST)
    fm.list_header(1, _CT_STRUCT)
    rg = _ThriftW()
    rglast = rg.field(0, 1, _CT_LIST)
    rg.list_header(len(names), _CT_STRUCT)
    for m in chunk_meta:
        cc = _ThriftW()
        clast = cc.i_field(0, 2, m["offset"])  # file_offset
        clast = cc.field(clast, 3, _CT_STRUCT)
        cc_tail = _ThriftW()  # fields 4-7 must follow field 3's struct
        tlast = 3
        if m["oi"] is not None:
            tlast = cc_tail.i_field(tlast, 4, m["oi"][0])
            tlast = cc_tail.i_field(tlast, 5, m["oi"][1], _CT_I32)
            tlast = cc_tail.i_field(tlast, 6, m["ci"][0])
            tlast = cc_tail.i_field(tlast, 7, m["ci"][1], _CT_I32)
        cm = _ThriftW()
        mlast = cm.i_field(0, 1, _w_physical(m["kind"]), _CT_I32)
        mlast = cm.field(mlast, 2, _CT_LIST)
        cm.list_header(2, _CT_I32)
        cm.zigzag(m["enc"])  # PLAIN_DICTIONARY / PLAIN / DELTA_* (v2)
        cm.zigzag(3)  # RLE (levels)
        mlast = cm.field(mlast, 3, _CT_LIST)
        cm.list_header(1, _CT_BINARY)
        nb = m["name"].encode("utf-8")
        cm.varint(len(nb))
        cm.out += nb
        mlast = cm.i_field(mlast, 4, codec_id, _CT_I32)
        mlast = cm.i_field(mlast, 5, n_rows)
        mlast = cm.i_field(mlast, 6, m["uncomp"])
        mlast = cm.i_field(mlast, 7, m["comp"])
        mlast = cm.i_field(mlast, 9, m["data_page_offset"])
        if m["dict_page_offset"] is not None:
            mlast = cm.i_field(mlast, 11, m["dict_page_offset"])
        mlast = _w_stats(cm, mlast, m["present"], m["kind"], m["n_nulls"])
        if m.get("bloom") is not None:
            mlast = cm.i_field(mlast, 14, m["bloom"][0])
            mlast = cm.i_field(mlast, 15, m["bloom"][1], _CT_I32)
        cm.stop()
        cc.out += cm.out
        cc.out += cc_tail.out
        cc.stop()
        rg.out += cc.out
    rglast = rg.i_field(rglast, 2, sum(m["uncomp"] for m in chunk_meta))  # total_byte_size
    rglast = rg.i_field(rglast, 3, n_rows)
    rg.stop()
    fm.out += rg.out
    last = fm.bin_field(last, 6, created_by.encode("utf-8"))
    # column_orders: TYPE_ORDER for every column — without this, readers
    # must ignore min_value/max_value (parquet-format Statistics rules)
    last = fm.field(last, 7, _CT_LIST)
    fm.list_header(len(names), _CT_STRUCT)
    for _ in names:
        order = _ThriftW()
        order.field(0, 1, _CT_STRUCT)  # ColumnOrder.TYPE_ORDER
        order.stop()  # empty TypeDefinedOrder
        order.stop()  # union
        fm.out += order.out
    fm.stop()

    out += fm.out
    out += struct.pack("<I", len(fm.out))
    out += MAGIC
    return bytes(out)


def _pdf_column(series, kind: str) -> list:
    """pandas series -> writer value list. Arrow->pandas widens nullable
    int/bool columns to float64/object; coerce non-null values back to the
    declared kind so _plain_encode never sees a 1.0 where an int belongs.
    DOCUMENTED CONFLATION (per the pandas interchange convention): float
    NaN is written as NULL. Spark itself distinguishes NaN from NULL, but
    mapInPandas delivers float columns as numpy-backed pandas where NULL
    already arrives AS NaN — the distinction is lost one step upstream of
    this function, so treating NaN as a value here would corrupt every
    genuine NULL into NaN. Callers that must round-trip NaN should carry
    an explicit is_nan boolean column."""
    import pandas as pd

    out = []
    for v in series.tolist():
        if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
            out.append(None)
        elif kind in ("i64", "i32", "ts_us"):
            out.append(int(v))
        elif kind == "bool":
            out.append(bool(v))
        else:
            out.append(v)
    return out


def write_parquet_corpus(
    df,
    out_dir: str,
    kinds: dict[str, str],
    *,
    codec: str = "snappy",
    bloom_columns: list[str] | None = None,
    delta_columns: list[str] | None = None,
):
    """Distributed sink over OUR writer: each task serializes its partition
    to one part file with encode_parquet and commits via write-then-rename
    (the same crash-safe protocol as warcmini's corpus sink). Returns a
    manifest DataFrame of (part, n_rows, n_bytes); the written directory is
    readable by Spark/DuckDB/pyarrow — the gate has Spark itself read it
    back. 100-TB shape: one file per task, no driver data movement.
    ``delta_columns`` passes through to encode_parquet (DATA_PAGE_V2 +
    DELTA encodings for the named columns)."""
    import os as _os
    import uuid as _uuid

    import pandas as pd

    names = [f.name for f in df.schema.fields]
    for c in names:
        if c not in kinds:
            raise ParquetError(f"no writer kind declared for column {c}")
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
            cols = {c: _pdf_column(pdf[c], kinds[c]) for c in names}
            blob = encode_parquet(
                cols,
                {c: kinds[c] for c in names},
                codec=codec,
                bloom_columns=bloom_columns,
                delta_columns=delta_columns,
            )
            part = f"part-{_uuid.uuid4().hex}.parquet"
            tmp = _os.path.join(out_dir, f".uncommitted-{part}")
            with open(tmp, "wb") as fh:
                fh.write(blob)
            _os.replace(tmp, _os.path.join(out_dir, part))
            rows.append((part, len(pdf), len(blob)))
        yield pd.DataFrame(rows, columns=["part", "n_rows", "n_bytes"])

    return df.mapInPandas(sink, man_schema)


def footer_meta_scan(spark, paths: list[str]):
    """Distributed footer catalog: one task per file, each parsing ONLY the
    footer (two ranged reads). Output is the per-column-chunk stats table —
    the input to external row-group indexes and pruning audits."""
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from pyspark.sql.types import DoubleType

    schema = StructType(
        [
            StructField("file_name", StringType()),
            StructField("row_group_id", LongType()),
            StructField("row_group_num_rows", LongType()),
            StructField("column_id", LongType()),
            StructField("path_in_schema", StringType()),
            StructField("physical_type", StringType()),
            StructField("num_values", LongType()),
            StructField("compression", StringType()),
            StructField("encodings", StringType()),
            StructField("total_compressed_size", LongType()),
            StructField("total_uncompressed_size", LongType()),
            StructField("stats_null_count", LongType()),
            StructField("stats_min_str", StringType()),
            StructField("stats_max_str", StringType()),
            StructField("stats_min_num", DoubleType()),
            StructField("stats_max_num", DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                for r in footer_meta_rows(p):
                    rows.append(
                        {
                            "file_name": r["file_name"],
                            "row_group_id": r["row_group_id"],
                            "row_group_num_rows": r["row_group_num_rows"],
                            "column_id": r["column_id"],
                            "path_in_schema": r["path_in_schema"],
                            "physical_type": r["type"],
                            "num_values": r["num_values"],
                            "compression": r["compression"],
                            "encodings": r["encodings"],
                            "total_compressed_size": r["total_compressed_size"],
                            "total_uncompressed_size": r["total_uncompressed_size"],
                            "stats_null_count": r["stats_null_count"],
                            "stats_min_str": _stat_str(r["stats_min"]),
                            "stats_max_str": _stat_str(r["stats_max"]),
                            "stats_min_num": _stat_num(r["stats_min"]),
                            "stats_max_num": _stat_num(r["stats_max"]),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    pdf = spark.createDataFrame([(p,) for p in sorted(paths)], ["path"])
    return pdf.repartition(max(len(paths), 1), "path").mapInPandas(gen, schema)


def _stat_str(v) -> str | None:
    """Canonical string form for a typed stat (ints stay exact; floats use
    repr, which round-trips; raw bytes present as hex — a catalog row must
    never fail the whole file scan)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _stat_num(v) -> float | None:
    """Numeric view of a typed stat (None for strings/bytes): the input to
    min/max aggregation across row groups and to pruning predicates.
    Exact for ints < 2^53 — every key/epoch in scope."""
    if v is None or isinstance(v, (bytes, str)):
        return None
    if isinstance(v, bool):
        return float(v)
    return float(v)


def raw_scan(
    spark,
    path: str | list[str],
    columns: list[str],
    presentation: dict[str, Callable] | None = None,
):
    """Byte-level distributed column scan: footers parsed ONCE driver-side
    (each a 2-ranged-read fetch), then one task per (file, row_group), each
    reading only its chunks' byte ranges. This is the engine's own proof
    that it understands its storage format — and the 100-TB shape: at 1000
    executors the task list is (file × row_group), exactly how Spark's own
    parquet scan parallelizes. All files must share the leaf schema for the
    requested columns (mismatches refuse at plan time).

    ``presentation`` optionally maps column -> callable(list)->list applied
    after decode (e.g. epoch-micros -> pandas timestamps)."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    paths = [path] if isinstance(path, str) else sorted(path)
    if not paths:
        raise ParquetError("raw_scan needs at least one file")
    metas = {p: read_file_meta(p) for p in paths}
    meta = metas[paths[0]]
    leaves = {lf.path: lf for lf in schema_leaves(meta)}
    for c in columns:
        if c not in leaves:
            raise ParquetError(f"unknown column {c}")
    for p in paths[1:]:
        other = {lf.path: lf for lf in schema_leaves(metas[p])}
        for c in columns:
            if c not in other:
                raise ParquetError(f"{p}: missing column {c}")
            if (
                other[c].physical_type != leaves[c].physical_type
                or other[c].max_def_level != leaves[c].max_def_level
                or other[c].max_rep_level != leaves[c].max_rep_level
            ):
                raise ParquetError(f"{p}: column {c} has a different leaf shape")

    def spark_type(leaf: _Leaf):
        lt = leaf.logical or {}
        if "timestamp" in lt or leaf.converted_type in (9, 10) or leaf.physical_type == "INT96":
            return TimestampNTZType()
        pt = leaf.physical_type
        if pt == "BYTE_ARRAY" and ("string" in lt or leaf.converted_type == 0):
            return StringType()
        return {
            "BOOLEAN": BooleanType(),
            "INT32": IntegerType(),
            "INT64": LongType(),
            "FLOAT": FloatType(),
            "DOUBLE": DoubleType(),
        }.get(pt) or StringType()

    schema = StructType([StructField(c, spark_type(leaves[c])) for c in columns])
    tasks_list = [
        (p, i) for p in paths for i in range(len(metas[p]["row_groups"]))
    ]

    def default_presentation(leaf: _Leaf):
        lt = leaf.logical or {}
        if "timestamp" in lt or leaf.converted_type in (9, 10) or leaf.physical_type == "INT96":
            unit = "us"  # INT96 decodes to epoch micros
            ts = lt.get("timestamp") or {}
            tu = ts.get("unit") or {}
            # parsed TimeUnit union values are empty structs (None): test
            # KEY PRESENCE, never the value
            if "millis" in tu or leaf.converted_type == 9:
                unit = "ms"
            elif "nanos" in tu:
                # Spark surface is microsecond timestamps: truncate sub-µs
                # (the same documented rule as INT96 decode)
                return lambda vals: pd.to_datetime(
                    pd.Series(
                        [None if v is None else v // 1000 for v in vals],
                        dtype="float64" if any(v is None for v in vals) else "int64",
                    ),
                    unit="us",
                )
            return lambda vals: pd.to_datetime(pd.Series(vals, dtype="float64" if any(v is None for v in vals) else "int64"), unit=unit)
        return None

    def gen(batches):
        meta_cache: dict[str, dict] = {}
        for pdf in batches:
            for p, rg in zip(pdf["path"], pdf["rg"]):
                # executor-side footer read: tasks ship only (path, rg),
                # never the metadata object; memoized per path so a file's
                # k row-group tasks cost one footer fetch, not k
                m = meta_cache.get(p)
                if m is None:
                    m = meta_cache[p] = read_file_meta(p)
                cols = read_row_group(p, m, int(rg), columns)
                data = {}
                for c in columns:
                    vals = cols[c]
                    pres = (presentation or {}).get(c) or default_presentation(leaves[c])
                    data[c] = pres(vals) if pres else vals
                yield pd.DataFrame(data, columns=columns)

    tasks = spark.createDataFrame(tasks_list, ["path", "rg"])
    return tasks.repartition(max(len(tasks_list), 1), "path", "rg").mapInPandas(gen, schema)


def write_parquet_grouped(
    df,
    out_dir: str,
    kinds: dict[str, str],
    group_col: str,
    sort_cols: list[str],
    *,
    rows_per_page: int = 20000,
    codec: str = "snappy",
):
    """Group-wise sink over OUR writer: one parquet file per GROUP (not per
    partition), each sorted on ``sort_cols`` and paged at ``rows_per_page``
    with page indexes — the layout a page-level pruning plan wants
    (clustered files, ordered pages, tight per-page bounds). applyInPandas
    gives exactly-one-task-per-group; files commit via write-then-rename.
    Returns a manifest of (group, n_rows, n_bytes)."""
    import os as _os

    import pandas as pd

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    names = [f.name for f in df.schema.fields if f.name != group_col]
    for c in names:
        if c not in kinds:
            raise ParquetError(f"no writer kind declared for column {c}")
    _os.makedirs(out_dir, exist_ok=True)
    man_schema = StructType(
        [
            StructField("grp", StringType()),
            StructField("n_rows", LongType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def sink(key, pdf):
        g = key[0]
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        cols = {c: _pdf_column(pdf[c], kinds[c]) for c in names}
        blob = encode_parquet(
            cols, {c: kinds[c] for c in names}, codec=codec, rows_per_page=rows_per_page
        )
        part = f"{group_col}={g}.parquet"
        tmp = _os.path.join(out_dir, f".uncommitted-{part}")
        with open(tmp, "wb") as fh:
            fh.write(blob)
        _os.replace(tmp, _os.path.join(out_dir, part))
        return pd.DataFrame([(str(g), len(pdf), len(blob))], columns=["grp", "n_rows", "n_bytes"])

    return df.groupBy(group_col).applyInPandas(sink, man_schema)


def page_index_scan(spark, paths: list[str], column: str):
    """Distributed page-index catalog: one task per file, each parsing only
    the footer + the column's ColumnIndex/OffsetIndex (three ranged reads,
    zero data pages) — the planning read pattern for page-level pruning at
    100 TB."""
    import pandas as pd

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("file_name", StringType()),
            StructField("row_group_id", LongType()),
            StructField("page", LongType()),
            StructField("first_row_index", LongType()),
            StructField("last_row_index", LongType()),
            StructField("null_page", BooleanType()),
            StructField("null_count", LongType()),
            StructField("min_num", DoubleType()),
            StructField("max_num", DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                meta = read_file_meta(p)
                for rg in range(len(meta["row_groups"])):
                    for pg in read_page_index(p, meta, rg, column):
                        rows.append(
                            {
                                "file_name": p,
                                "row_group_id": rg,
                                "page": pg["page"],
                                "first_row_index": pg["first_row_index"],
                                "last_row_index": pg["last_row_index"],
                                "null_page": pg["null_page"],
                                "null_count": pg["null_count"],
                                "min_num": _stat_num(pg["min"]),
                                "max_num": _stat_num(pg["max"]),
                            }
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    pdf = spark.createDataFrame([(p,) for p in sorted(paths)], ["path"])
    return pdf.repartition(max(len(paths), 1), "path").mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# Split-block bloom filters (parquet-format BloomFilter.md)
# ---------------------------------------------------------------------------

_BLOOM_HEADER = {
    1: ("num_bytes", None),
    2: ("algorithm", {1: ("block", {})}),
    3: ("hash", {1: ("xxhash", {})}),
    4: ("compression", {1: ("uncompressed", {})}),
}

# the eight odd 32-bit salts of the split-block bloom spec
_BLOOM_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)


def read_bloom_filter(path: str, offset: int) -> bytes:
    """Read one column chunk's split-block bloom bitset from
    ``bloom_filter_offset``: a compact-thrift BloomFilterHeader followed by
    ``num_bytes`` of bitset. Refuses any algorithm/hash/compression other
    than (split-block, xxhash, uncompressed) — the only variants the spec
    defines today — so an unknown future variant can never be misread as
    an always-false filter."""
    with open(path, "rb") as f:
        f.seek(offset)
        head = f.read(64)  # header is a handful of bytes; 64 is generous
        t = _Thrift(head)
        hdr = t.read_struct(_BLOOM_HEADER)
        num_bytes = hdr.get("num_bytes")
        if not isinstance(num_bytes, int) or num_bytes <= 0 or num_bytes % 32:
            raise ParquetError("bloom: bad numBytes (must be a positive multiple of 32)")
        if "block" not in (hdr.get("algorithm") or {}):
            raise ParquetError("bloom: unsupported algorithm (not split-block)")
        if "xxhash" not in (hdr.get("hash") or {}):
            raise ParquetError("bloom: unsupported hash (not xxhash)")
        if "uncompressed" not in (hdr.get("compression") or {}):
            raise ParquetError("bloom: unsupported compression")
        f.seek(offset + t.pos)
        bitset = f.read(num_bytes)
    if len(bitset) != num_bytes:
        raise ParquetError("bloom: truncated bitset")
    return bitset


def bloom_plain_bytes(value, physical_type: str) -> bytes:
    """The bytes the spec hashes: the value's PLAIN encoding (without the
    BYTE_ARRAY length prefix)."""
    if physical_type == "INT64":
        return struct.pack("<q", int(value))
    if physical_type == "INT32":
        return struct.pack("<i", int(value))
    if physical_type == "DOUBLE":
        return struct.pack("<d", float(value))
    if physical_type == "FLOAT":
        return struct.pack("<f", float(value))
    if physical_type == "BYTE_ARRAY":
        return value.encode("utf-8") if isinstance(value, str) else bytes(value)
    raise ParquetError(f"bloom: unsupported physical type {physical_type}")


def bloom_maybe_contains(bitset: bytes, value, physical_type: str) -> bool:
    """Split-block membership probe: False = value DEFINITELY absent from
    the chunk (prune), True = maybe present (read). Block chosen by the
    top 32 hash bits scaled to the block count; within the 256-bit block,
    one bit per salt from the low 32 bits — both exactly as the public
    spec (and parquet-java, which wrote the filters our tests pin against)
    compute them."""
    from vectorflow_spark.functions.xxh import xxh64

    h = xxh64(bloom_plain_bytes(value, physical_type), 0)
    n_blocks = len(bitset) // 32
    block = ((h >> 32) * n_blocks) >> 32
    x = h & 0xFFFFFFFF
    words = struct.unpack_from("<8I", bitset, block * 32)
    for i in range(8):
        bit = ((x * _BLOOM_SALT[i]) & 0xFFFFFFFF) >> 27
        if not (words[i] >> bit) & 1:
            return False
    return True
