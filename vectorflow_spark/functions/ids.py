"""Deterministic id generation (operator K1).

The reference derives every id with ``generate_uuid_from_tuple`` — RFC-4122
UUIDv5 (sha1) over namespace 6ba7b810-9dad-11d1-80b4-00c04fd430c8 with name
``"-".join(map(str, t))`` (reference src/shared/utils.py:5-10). "The id can be
used for deduplication and idempotency" (reference README.md:210); our sinks
rely on that via ``dropDuplicates`` + idempotent upserts.

Two id families, as in the reference:
  * content ids  — uuid5((chunk_text, offset, strategy)); used for chunks
  * position ids — uuid5((job_id, batch_id, i)); used for sink records
    (reference src/worker/vector_uploader.py:59,93,149)

``uuid5_udf`` is exact RFC-4122 parity (vectorized pandas UDF — sha1 is not a
DuckDB 1.0 builtin, so oracle checks for it are rows-only). ``content_id`` is
the JVM-only fast path: an md5-based deterministic id computed entirely with
built-in expressions (whole-stage codegen, no Python), SQL-checkable in the
DuckDB oracle. Both are stable across runs/partitions.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

VECTORFLOW_NAMESPACE = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")


def uuid5_from_parts(*parts) -> str:
    """Driver-side equivalent of the reference's generate_uuid_from_tuple."""
    return str(uuid.uuid5(VECTORFLOW_NAMESPACE, "-".join(map(str, parts))))


@F.pandas_udf(StringType())
def _uuid5_name_udf(name: pd.Series) -> pd.Series:
    ns = VECTORFLOW_NAMESPACE
    return name.map(lambda n: str(uuid.uuid5(ns, n)) if n is not None else None)


def uuid5_udf(*cols: Column | str) -> Column:
    """uuid5 over the '-'-joined string forms of the given columns.

    Matches the reference's tuple semantics: ints are rendered via str()
    (no padding), so callers must pass columns already cast appropriately.
    """
    joined = F.concat_ws("-", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols])
    return _uuid5_name_udf(joined)


def content_id(*cols: Column | str) -> Column:
    """md5-based deterministic id over '-'-joined column values.

    Pure built-ins (codegen'd, no Python round-trip) — the scale path for
    dedup/idempotency keys where RFC-4122 formatting is not required.
    """
    joined = F.concat_ws("-", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols])
    return F.md5(joined)
