"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

Parquet pruning is one-dimensional: sorting by ``a`` gives tight per-file
min/max for ``a`` and useless ranges for ``b``. Interleaving the bits of
several key columns into one Morton code and range-partitioning + sorting
by it gives every participating column LOCALLY NARROW ranges in every
file, so min/max (and partition-level) pruning works for predicates on ANY
of the dimensions — the standard lakehouse layout for a 100 TB fact table
queried by more than one key (same idea as Delta/Iceberg OPTIMIZE ZORDER,
built here from public Spark primitives only).

The z-value is a pure integer expression (shift/mask/or terms, one per
(column, bit) pair — all inside WholeStageCodegen); the layout write is
one ``repartitionByRange`` (range exchange with sampled bounds) plus an
in-partition sort, i.e. exactly the cost of a global sort by one column.

Inputs are masked to ``bits`` low bits so the expression is total; callers
bucketize wider domains first (e.g. epoch-days, id mod 2^bits, or a
quantile rank for skewed/continuous columns).
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zvalue",
    "zorder_write",
    "bucketed_write",
    "write_training_shards",
    "read_shards_by_budget",
    "compact_small_files",
]


def zvalue(cols: list[str], bits: int = 16) -> Column:
    """Morton code: bit ``j`` of column ``i`` lands at position
    ``j * n_cols + i``. Deterministic integer math — the same expression is
    writable in ANSI SQL, which is what q_zorder_key hash-checks."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if bits * n > 63:
        raise ValueError("bits * n_cols must fit in a signed 64-bit value")
    terms = [
        F.shiftleft(
            F.shiftright(F.col(c).cast("long"), j).bitwiseAND(F.lit(1).cast("long")),
            j * n + i,
        )
        for i, c in enumerate(cols)
        for j in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    normalize: bool = True,
) -> None:
    """Write ``df`` clustered by the Morton code of ``cols``: range-
    partition on the z-value (co-locates z-neighbors in the same file) and
    sort within each file (tightens row-group min/max). The z column
    itself is dropped — it exists to arrange rows, not to be stored.

    ``normalize`` (default on) first min-max-scales every column onto the
    full ``[0, 2^bits)`` range via one cheap agg job. Without it, a column
    whose domain uses fewer bits than the others contributes only LOW
    z-bits, so file splits (which cut on high bits) never localize it —
    interleaving is only fair when all dimensions have equal bit width.
    Inputs must fit ``(col - min) * 2^bits`` in a signed 64-bit long."""
    work = df
    zcols = list(cols)
    if normalize:
        stats = df.agg(
            *[F.min(c).alias(f"mn_{c}") for c in cols],
            *[F.max(c).alias(f"mx_{c}") for c in cols],
        ).first()
        top = (1 << bits) - 1
        zcols = []
        for c in cols:
            mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
            span = max(int(mx) - int(mn), 1)
            work = work.withColumn(
                f"_zn_{c}",
                F.expr(f"((`{c}` - {int(mn)}) * {top}) div {span}").cast("long"),
            )
            zcols.append(f"_zn_{c}")
    zed = work.withColumn("_z", zvalue(zcols, bits)).drop(
        *[c for c in zcols if c not in cols]
    )
    parts = (
        zed.repartitionByRange(num_files, "_z")
        if num_files
        else zed.repartitionByRange("_z")
    )
    parts.sortWithinPartitions("_z").drop("_z").write.mode("overwrite").parquet(path)


def bucketed_write(
    df,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sort-bucketed) table — the layout
    that makes repeated joins/aggregations on ``bucket_cols`` exchange-free.

    At 100 TB the dominant cost of a fact-fact join is the shuffle of both
    sides. Bucketing pre-shuffles AT WRITE TIME: rows land in
    ``hash(bucket_cols) % n_buckets`` files, so any join or aggregation on
    the bucket key between tables with matching bucket counts reads
    co-located buckets and skips the Exchange entirely (Spark's
    SortMergeJoin goes straight to sort/merge; with ``sort_cols`` == join
    key even the Sort disappears). The one-time write shuffle is amortized
    over every downstream consumption — the batch twin of a co-partitioned
    streaming state store.

    Uses ``saveAsTable`` (bucket metadata lives in the session catalog; a
    plain ``.parquet(path)`` write cannot record bucketing). Pick
    ``n_buckets`` once per subject area and reuse it everywhere: mismatched
    bucket counts reintroduce a shuffle on the smaller side."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    order_cols: list,
    token_col: str | None = None,
) -> DataFrame:
    """Materialize a training corpus as deterministic, size-bounded shards —
    the endgame of the pack -> shuffle -> shard pipeline (WebDataset/Arrow
    shard discipline): shard s holds EXACTLY rows (s*R, (s+1)*R] of the
    global ``order_cols`` order (the last shard holds the remainder), so a
    reader can address any shard independently and a re-run of the writer
    reproduces byte-identical assignment. Pass the seeded-shuffle hash as
    the order (operators/ranking + q_global_shuffle) to get the shuffled
    shards training wants.

    Plan: one range shuffle for the exact global rank (global_row_number —
    no single-partition window), one hash shuffle on shard id so each
    shard's rows sit in ONE task, then a partitionBy(shard) write — one
    file per shard directory. Returns the manifest read back from the
    WRITTEN files (shard -> rows, token sum): ground truth of what landed
    on disk, and itself the reader's index for budget-bounded loading."""
    from vectorflow_spark.operators.ranking import global_row_number

    ranked = global_row_number(df, order_cols, out_col="_rn")
    sharded = ranked.withColumn(
        "shard", ((F.col("_rn") - 1) / F.lit(rows_per_shard)).cast("int")
    ).drop("_rn")
    sharded.repartition("shard").write.mode("overwrite").partitionBy("shard").parquet(path)
    written = df.sparkSession.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("n_tokens"))
    return written.groupBy("shard").agg(*aggs)


def compact_small_files(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    order_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory's many small files into files of about
    ``target_bytes`` — the standard maintenance pass after streaming or
    fine-grained-partitioned ingest (thousands of KB-files make every
    downstream scan pay per-file open/footer costs and defeat row-group
    pruning). Returns the new file count.

    Sizing uses the FILES' aggregate bytes (input_file_name + one distinct
    pass over file metadata via the _metadata hidden columns), not a guess
    from row counts, so the target holds whatever the row width is.
    ``order_cols`` re-sorts while compacting (repartitionByRange) so the
    rewrite also restores clustering (min/max pruning) that tiny appends
    destroyed; without it the coalesce is a pure file-count fix with no
    extra sort.

    Swap protocol (local/POSIX filesystems — on an object store use the
    versioned store's manifest pointer in sinks/writers.py instead, since
    S3 has no atomic directory rename): write the rewrite to a staged
    temp dir, rename the original aside to ``path + '.old'``, move the
    staged tree into place, then delete the old copy. A crash at any
    point leaves the full dataset on disk — either still at ``path`` or
    recoverable from ``path.old`` — never a window where both are gone."""
    import math
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    sizes = (
        df.select(F.col("_metadata.file_path").alias("f"), F.col("_metadata.file_size").alias("sz"))
        .groupBy("f")
        .agg(F.first("sz").alias("sz"))
        .agg(F.sum("sz").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    n_out = max(1, math.ceil((sizes.total or 0) / target_bytes))
    staged = tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(path.rstrip("/")) or ".")
    out = (
        df.repartitionByRange(n_out, *order_cols)
        if order_cols
        else df.coalesce(n_out)
    )
    out.write.mode("overwrite").parquet(staged)
    old = path.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a previous crashed compaction
    os.replace(path.rstrip("/"), old)
    os.replace(staged, path.rstrip("/"))
    shutil.rmtree(old)
    return n_out


def read_shards_by_budget(
    spark,
    path: str,
    manifest: DataFrame,
    token_budget: int,
    budget_col: str = "n_tokens",
) -> DataFrame:
    """Load whole training shards in shard order until the NEXT shard would
    exceed ``token_budget`` — the reader half of write_training_shards.
    The decision runs on the manifest (n_shards rows, driver-side by
    design: it IS the index), and the selected shards reach the scan as a
    partition-column isin filter, so excluded shards are pruned at the
    directory level — a budget-bounded load of a 100 TB corpus reads only
    the bytes it returns, never scanning to discard."""
    rows = sorted(manifest.collect(), key=lambda r: r.shard)
    chosen: list[int] = []
    cum = 0
    for r in rows:
        tok = getattr(r, budget_col)
        if cum + tok > token_budget:
            break
        chosen.append(r.shard)
        cum += tok
    df = spark.read.parquet(path)
    return df.filter(F.col("shard").isin(chosen) if chosen else F.lit(False))
