"""``vf_rawpq`` — the byte-level Parquet reader as a Spark Python
DataSource with stats-based row-group pruning pushdown.

``spark.read.format("vf_rawpq").load("/dir/of/parquet")`` plans one input
partition per (file, row_group) from footers alone (two ranged reads per
file, driver-side), decodes each partition with sources/parquetmini.py's
pure-Python page decoder, and ships Arrow record batches to the JVM. With
``spark.sql.python.filterPushdown.enabled``, comparison filters on numeric
columns reach ``pushFilters`` and PRUNE row groups whose [min, max] stats
cannot satisfy them — the partition list shrinks at PLANNING time, the
Python-source analog of parquet row-group skipping. Equality filters
(numeric AND string) additionally probe each row group's split-block
BLOOM filter when the writer stored one (parquetmini.read_bloom_filter /
bloom_maybe_contains, xxhash64 seed 0 over the plain encoding): the
point-lookup case where min/max can never prune — hash-distributed keys
span every chunk's range — drops to the 1-2 row groups whose filter
admits the value, for a few hundred driver-side bytes per probe.

Pushdown semantics: pruning is work-avoidance, never approximation — every
filter is returned to Spark for exact re-application (footer stats select
a superset; the engine's q_parquet_prune gate proves the superset never
loses a matching row group). Unsupported shapes refuse loudly at plan
time: nested (repeated) leaf columns, and any file whose leaf shape for
the requested columns differs from the first file's (checked in
``partitions()``, so the refusal happens at planning, not as a per-task
decode error).

Scale shape: planning cost is (files x footer), execution is (file,
row_group) tasks reading only their chunk byte ranges — the same sharding
as Spark's native scan, but with OUR bytes-up decode path underneath,
and prune decisions auditable from footer_meta_scan's catalog rows.

KNOWN SPARK-SIDE LIMITATION (measured, round 10): when ONE loaded
DataFrame is reused under several differently-filtered scans in a single
query (``base.filter(A).union(base.filter(B))``), Spark 4.1's Python-
DataSource planner runs pushdown per branch but attaches the LAST
planned (partitions, read function) to the shared relation — every
branch then reads the last branch's pruned partition set, silently
dropping rows a different branch needed (observed: a two-point-lookup
self-union returned one row). The trace shows each pushFilters/
partitions pair computing correctly in isolation; the conflation is in
the JVM rule, and it affects ANY pruning (ranges as much as blooms).
Safe usages, both tested: one filtered scan per loaded DataFrame (load
again per branch — separate relations never conflate), or
``.option("pushdown_prune", "false")`` on a DataFrame that must be
reused, which keeps the full partition list so every branch sees a
superset and Spark's exact re-applied filters stay correct.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Any, Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from vectorflow_spark.sources.parquetmini import (
    ParquetError,
    _chunk_byte_range,
    _Leaf,
    bloom_maybe_contains,
    footer_meta_rows,
    read_bloom_filter,
    read_file_meta,
    read_row_group,
    schema_leaves,
)


def _spark_ddl_type(leaf: _Leaf) -> str | None:
    """DDL type for a flat leaf; None = unsupported (nested/exotic)."""
    if leaf.max_rep_level > 0:
        return None
    lt = leaf.logical or {}
    if "timestamp" in lt or leaf.converted_type in (9, 10) or leaf.physical_type == "INT96":
        return "timestamp_ntz"
    pt = leaf.physical_type
    if pt == "BYTE_ARRAY":
        return "string" if ("string" in lt or leaf.converted_type == 0) else "binary"
    return {
        "BOOLEAN": "boolean",
        "INT32": "int",
        "INT64": "bigint",
        "FLOAT": "float",
        "DOUBLE": "double",
    }.get(pt)


class _RgPartition(InputPartition):
    def __init__(self, path: str, rg: int):
        self.path = path
        self.rg = rg  # -1 = sentinel: yield an empty typed batch


class VfRawPqReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vf_rawpq requires a load path: .load('/dir/or/file')")
        self.columns = [f.name for f in schema.fields]
        self._ranges: dict[str, tuple[float | None, float | None]] = {}
        self._eqs: dict[str, object] = {}  # point lookups -> bloom probes
        self._bloom_cache: dict[tuple[str, int], bytes] = {}
        # escape hatch for the shared-relation conflation documented in
        # the module docstring: "false" keeps the full partition list
        self._prune = str(options.get("pushdown_prune", "true")).lower() != "false"

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            files = sorted(_glob.glob(os.path.join(self.path, "**", "*.parquet"), recursive=True))
        else:
            files = sorted(_glob.glob(self.path)) or [self.path]
        if not files:
            raise ValueError(f"vf_rawpq: no parquet files under {self.path}")
        return files

    def pushFilters(self, filters):
        """Accept nothing, learn everything: comparison filters on numeric
        columns tighten a per-column [lo, hi] window used to DROP row
        groups at planning time; every filter is yielded back so Spark
        re-applies exact semantics (stats select a superset).

        State RESETS on entry: Spark can reuse one reader instance across
        several scans of the same relation (observed with a self-union of
        two different point lookups), and accumulating each scan's
        conjunction would intersect them into a contradiction that prunes
        rows a branch needs. Each call describes exactly one scan."""
        from pyspark.sql.datasource import EqualTo

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
                # point lookups also feed the BLOOM probe (strings too —
                # bloom pruning needs no ordered stats, just the filter)
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
            yield f  # ALWAYS returned: pruning is advisory, Spark re-applies

    def partitions(self):
        parts: list[_RgPartition] = []
        self.pruned = 0
        ref: dict[str, tuple] | None = None
        for p in self._files():
            # ONE footer parse per file per planning pass (r10 ADVICE):
            # leaf shapes, stats rows, and the row-group count all derive
            # from this single read_file_meta result.
            meta = read_file_meta(p)
            # plan-time cross-file leaf-shape check (raw_scan's rule, the
            # docstring's contract): a mismatched file must refuse HERE,
            # not as a per-task ParquetError mid-read
            shape = {
                lf.path: (lf.physical_type, lf.max_def_level, lf.max_rep_level)
                for lf in schema_leaves(meta)
            }
            if ref is None:
                ref = shape
            else:
                for c in self.columns:
                    if shape.get(c) != ref.get(c):
                        raise ParquetError(
                            f"vf_rawpq: {p}: column {c} has a different leaf "
                            "shape than the first file"
                        )
            if self._prune and (self._ranges or self._eqs):
                stats: dict[int, dict[str, tuple]] = {}
                blooms: dict[int, dict[str, tuple]] = {}
                for r in footer_meta_rows(p, meta=meta):
                    # BOTH bounds must be numeric: a footer carrying
                    # min_value without max_value (or vice versa) would
                    # otherwise put a None into the comparisons below and
                    # raise TypeError at planning time
                    if (
                        r["path_in_schema"] in self._ranges
                        and isinstance(r["stats_min"], (int, float))
                        and isinstance(r["stats_max"], (int, float))
                    ):
                        stats.setdefault(r["row_group_id"], {})[r["path_in_schema"]] = (
                            r["stats_min"],
                            r["stats_max"],
                        )
                    if (
                        r["path_in_schema"] in self._eqs
                        and isinstance(r.get("bloom_filter_offset"), int)
                    ):
                        blooms.setdefault(r["row_group_id"], {})[r["path_in_schema"]] = (
                            r["bloom_filter_offset"],
                            r["type"],
                        )
                n_rg = len(meta["row_groups"])
                for rg in range(n_rg):
                    keep = True
                    for c, (lo, hi) in self._ranges.items():
                        mn_mx = stats.get(rg, {}).get(c)
                        if mn_mx is None:
                            continue  # no stats: cannot prune, must read
                        mn, mx = mn_mx
                        if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                            keep = False
                            break
                    if keep:
                        # bloom probe for point lookups: a few hundred bytes
                        # of driver-side read per (rg, col) buys dropping
                        # whole row groups a min/max range can never exclude
                        # (uuid-ish keys where every chunk spans the domain)
                        for c, v in self._eqs.items():
                            off_type = blooms.get(rg, {}).get(c)
                            if off_type is None:
                                continue  # no filter written: must read
                            off, ptype = off_type
                            # probe only on an exact Python/physical type
                            # match: a coerced value (int(3.5) -> 3) would
                            # probe the wrong key — Spark folds such casts
                            # before pushdown, but don't rely on it
                            expected = {
                                "INT64": int,
                                "INT32": int,
                                "DOUBLE": float,
                                "FLOAT": float,
                                "BYTE_ARRAY": str,
                            }.get(ptype)
                            if expected is None or type(v) is not expected:
                                continue
                            try:
                                bitset = self._bloom_cache[(p, off)]
                            except KeyError:
                                bitset = read_bloom_filter(p, off)
                                self._bloom_cache[(p, off)] = bitset
                            if not bloom_maybe_contains(bitset, v, ptype):
                                keep = False
                                break
                    if keep:
                        parts.append(_RgPartition(p, rg))
                    else:
                        self.pruned += 1
            else:
                for rg in range(len(meta["row_groups"])):
                    parts.append(_RgPartition(p, rg))
        if not parts:
            # everything pruned: Spark needs >= 1 partition — yield one
            # that produces an empty typed batch
            parts.append(_RgPartition(self._files()[0], -1))
        return parts

    def read(self, partition: _RgPartition) -> Iterator:
        import pyarrow as pa

        meta = read_file_meta(partition.path)
        leaves = {lf.path: lf for lf in schema_leaves(meta)}
        if partition.rg < 0:
            cols = {c: [] for c in self.columns}
        else:
            cols = read_row_group(partition.path, meta, partition.rg, self.columns)
        arrays = []
        for c in self.columns:
            leaf = leaves[c]
            ddl = _spark_ddl_type(leaf)
            vals = cols[c]
            if ddl == "timestamp_ntz":
                unit = "us"
                lt = leaf.logical or {}
                ts = lt.get("timestamp") or {}
                tu = ts.get("unit") or {}
                if "millis" in tu or leaf.converted_type == 9:
                    unit = "ms"
                elif "nanos" in tu:
                    vals = [None if v is None else v // 1000 for v in vals]
                arrays.append(pa.array(vals, pa.timestamp(unit)).cast(pa.timestamp("us")))
            else:
                pa_type = {
                    "boolean": pa.bool_(),
                    "int": pa.int32(),
                    "bigint": pa.int64(),
                    "float": pa.float32(),
                    "double": pa.float64(),
                    "string": pa.string(),
                    "binary": pa.binary(),
                }[ddl]
                arrays.append(pa.array(vals, pa_type))
        yield pa.RecordBatch.from_arrays(arrays, names=self.columns)


class VfRawPqDataSource(DataSource):
    """``spark.read.format("vf_rawpq").load(path)``; register with
    ``pqsource.register(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "vf_rawpq"

    def schema(self) -> str | StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("vf_rawpq requires a load path")
        if os.path.isdir(path):
            files = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        else:
            files = sorted(_glob.glob(path)) or [path]
        if not files:
            raise ValueError(f"vf_rawpq: no parquet files under {path}")
        meta = read_file_meta(files[0])
        fields = []
        for leaf in schema_leaves(meta):
            if "." in leaf.path:
                raise ParquetError(
                    f"vf_rawpq reads flat scalar schemas only; {files[0]} carries"
                    f" nested column {leaf.path}"
                )
            ddl = _spark_ddl_type(leaf)
            if ddl is None:
                raise ParquetError(f"vf_rawpq: unsupported leaf type for {leaf.path}")
            fields.append(f"{leaf.path} {ddl}")
        return ", ".join(fields)

    def reader(self, schema: StructType) -> DataSourceReader:
        return VfRawPqReader(self.options, schema)


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VfRawPqDataSource)
