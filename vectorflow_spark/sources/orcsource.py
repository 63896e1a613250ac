"""``vf_raworc`` — the byte-level ORC reader as a Spark Python DataSource
with file-level stats pruning (the vf_rawpq twin, sources/pqsource.py).

``spark.read.format("vf_raworc").load("/dir/of/orc")`` plans one input
partition per (file, stripe) from tail reads alone, decodes each stripe
with sources/orcmini.py, and ships Arrow record batches. Comparison
filters on numeric columns reaching ``pushFilters`` prune whole FILES
whose footer-statistics [min, max] cannot satisfy them (ORC file footers
carry per-column stats; stripe-level stats live in the metadata section
this reader does not require). Every filter is returned to Spark for
exact re-application — pruning is work-avoidance, never approximation.

Timestamps surface as microsecond TIMESTAMP_NTZ (sub-microsecond ORC
nanos truncate — the parquet INT96 rule). Nested schemas refuse at plan
time.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from vectorflow_spark.sources.orcmini import (
    TYPE_KINDS,
    OrcError,
    _column_id,
    _decode_column,
    _read_stripe_streams,
    orc_stats_rows,
    read_orc_meta,
)

_DDL = {
    "BOOLEAN": "boolean",
    "BYTE": "int",
    "SHORT": "int",
    "INT": "int",
    "LONG": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "STRING": "string",
    "VARCHAR": "string",
    "CHAR": "string",
    "BINARY": "binary",
    "DATE": "date",
    "TIMESTAMP": "timestamp_ntz",
}


def _files_of(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "**", "*.orc"), recursive=True))
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise ValueError(f"vf_raworc: no orc files under {path}")
    return files


class _StripePartition(InputPartition):
    def __init__(self, path: str, stripe: int):
        self.path = path
        self.stripe = stripe  # -1 = sentinel: yield an empty typed batch


class VfRawOrcReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vf_raworc requires a load path: .load('/dir/or/file')")
        self.columns = [f.name for f in schema.fields]
        self._ranges: dict[str, tuple[float | None, float | None]] = {}
        # same shared-relation conflation escape hatch as vf_rawpq (the
        # KNOWN SPARK-SIDE LIMITATION in pqsource's module docstring):
        # a DataFrame reused under differently-filtered scans must set
        # .option("pushdown_prune", "false") or load per branch
        self._prune = str(options.get("pushdown_prune", "true")).lower() != "false"
        self._eqs: dict[str, object] = {}

    def pushFilters(self, filters):
        from pyspark.sql.datasource import EqualTo

        # reset per call: a reader instance can be reused across scans of
        # the same relation, and accumulating two scans' conjunctions
        # intersects them into over-pruning (see pqsource.pushFilters)
        self._ranges = {}
        self._eqs = {}
        for f in filters:
            attr = getattr(f, "attribute", None)
            value = getattr(f, "value", None)
            cname = attr[0] if isinstance(attr, tuple) and len(attr) == 1 else None
            kind = type(f).__name__
            if (
                cname in self.columns
                and isinstance(f, EqualTo)
                and isinstance(value, (int, float, str))
                and not isinstance(value, bool)
            ):
                # point lookups feed the per-stripe BLOOM probe (strings
                # too): orc.bloom.filter.columns indexes, kind 7/8 streams
                self._eqs[cname] = value
            if (
                cname in self.columns
                and isinstance(value, (int, float))
                and not isinstance(value, bool)
            ):
                lo, hi = self._ranges.get(cname, (None, None))
                if isinstance(f, EqualTo):
                    lo = value if lo is None else max(lo, value)
                    hi = value if hi is None else min(hi, value)
                elif kind in ("GreaterThan", "GreaterThanOrEqual"):
                    lo = value if lo is None else max(lo, value)
                elif kind in ("LessThan", "LessThanOrEqual"):
                    hi = value if hi is None else min(hi, value)
                else:
                    yield f
                    continue
                self._ranges[cname] = (lo, hi)
            yield f  # ALWAYS returned: pruning is advisory

    def _file_survives(self, path: str) -> bool:
        if not self._ranges:
            return True
        stats = {r["column"]: r for r in orc_stats_rows(path)}
        for c, (lo, hi) in self._ranges.items():
            r = stats.get(c)
            if r is None:
                continue
            # orc_stats_rows keeps int bounds as exact python ints — no
            # double truncation on the pruning path
            mn, mx = r["min_num"], r["max_num"]
            if mn is None or mx is None:
                continue  # no bounds: cannot prune, must read
            if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                return False
        return True

    def _stripe_bloom_survives(self, path: str, meta: dict, stripe: dict) -> bool:
        """Equality probes against the stripe's per-row-group bloom
        filters (orcmini.read_bloom_index): a stripe whose EVERY row
        group's filter rejects the value for some column cannot hold a
        match. Hashing follows orc-core exactly (pinned in
        tests/test_bloom.py): longs via Thomas Wang with SIGNED shifts,
        strings via Murmur3 hash64, doubles via the long bits."""
        import struct as _st

        from vectorflow_spark.sources.orcmini import (
            TYPE_KINDS,
            _column_id,
            murmur3_hash64,
            orc_bloom_test_hash,
            read_bloom_index,
            wang_long_hash,
        )

        for c, v in self._eqs.items():
            col = _column_id(meta, c)
            tkind = TYPE_KINDS.get(meta["types"][col].get("kind"), "?")
            is_string = False
            if tkind in ("BYTE", "SHORT", "INT", "LONG") and type(v) is int:
                h = wang_long_hash(v)
            elif tkind in ("STRING", "VARCHAR", "CHAR") and type(v) is str:
                h = murmur3_hash64(v.encode("utf-8"))
                is_string = True  # legacy kind-7 string hashing is unsafe
            elif tkind in ("DOUBLE", "FLOAT") and type(v) is float:
                h = wang_long_hash(_st.unpack("<q", _st.pack("<d", v))[0])
            else:
                continue  # type mismatch: never probe a coerced value
            blooms = read_bloom_index(path, meta, stripe, col, require_utf8=is_string)
            if not blooms:
                continue  # writer stored no filter: must read
            if not any(orc_bloom_test_hash(b, h) for b in blooms):
                return False
        return True

    def partitions(self):
        parts: list[_StripePartition] = []
        self.pruned_files = 0
        self.pruned_stripes = 0
        for p in _files_of(self.path):
            if self._prune and not self._file_survives(p):
                self.pruned_files += 1
                continue
            meta = read_orc_meta(p)
            for i, stripe in enumerate(meta["stripes"]):
                if (
                    self._prune
                    and self._eqs
                    and not self._stripe_bloom_survives(p, meta, stripe)
                ):
                    self.pruned_stripes += 1
                    continue
                parts.append(_StripePartition(p, i))
        if not parts:
            # everything pruned (or zero-stripe files): Spark needs >= 1
            # partition — yield one that produces an empty typed batch
            parts.append(_StripePartition(_files_of(self.path)[0], -1))
        return parts

    def read(self, partition: _StripePartition) -> Iterator:
        import pyarrow as pa

        meta = read_orc_meta(partition.path)
        if partition.stripe < 0:
            streams = encodings = None
        else:
            stripe = meta["stripes"][partition.stripe]
            with open(partition.path, "rb") as fh:
                streams, encodings = _read_stripe_streams(fh, meta, stripe)
        arrays = []
        for c in self.columns:
            col = _column_id(meta, c)
            kind = TYPE_KINDS.get(meta["types"][col].get("kind"), "?")
            vals = (
                []
                if streams is None
                else _decode_column(meta, streams, encodings, col, stripe["number_of_rows"])
            )
            if kind == "TIMESTAMP":
                # epoch nanos -> micros surface (sub-us truncates)
                vals = [None if v is None else v // 1000 for v in vals]
                arrays.append(pa.array(vals, pa.timestamp("us")))
            elif kind == "DATE":
                arrays.append(pa.array(vals, pa.date32()))
            else:
                pa_type = {
                    "boolean": pa.bool_(),
                    "int": pa.int32(),
                    "bigint": pa.int64(),
                    "float": pa.float32(),
                    "double": pa.float64(),
                    "string": pa.string(),
                    "binary": pa.binary(),
                }[_DDL[kind]]
                arrays.append(pa.array(vals, pa_type))
        yield pa.RecordBatch.from_arrays(arrays, names=self.columns)


class VfRawOrcDataSource(DataSource):
    """``spark.read.format("vf_raworc").load(path)``; register with
    ``orcsource.register(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "vf_raworc"

    def schema(self) -> str | StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("vf_raworc requires a load path")
        meta = read_orc_meta(_files_of(path)[0])
        fields = []
        for name in meta["field_names"]:
            kind = TYPE_KINDS.get(meta["types"][_column_id(meta, name)].get("kind"), "?")
            ddl = _DDL.get(kind)
            if ddl is None:
                raise OrcError(f"vf_raworc: unsupported column type {kind} for {name}")
            fields.append(f"{name} {ddl}")
        return ", ".join(fields)

    def reader(self, schema: StructType) -> DataSourceReader:
        return VfRawOrcReader(self.options, schema)


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VfRawOrcDataSource)
