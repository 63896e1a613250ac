"""Batching / partitioning operators (P1-P3) — the reference's "exchange".

The reference splits each document into 1000-line batches as its unit of
queueing, retry, and parallelism (split_file, reference src/api/app.py:278-281
and src/extract/extract.py:128-131) and slices chunks into <=2048-item
embedding minibatches (create_batches_for_embedding, src/worker/worker.py:
322-324). In Spark the queue disappears — partitions ARE the batches — but
the *numbering* is kept as data so that position-based ids (K1's
(job_id, batch_id, i) family) and job accounting stay reproducible.

Everything here is built-in expressions; the only shuffle is the optional
``repartition`` by (doc_id, batch_id), which is exactly the co-location a
1000-executor cluster wants before the chunk/embed stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_lines(df: DataFrame, text_col: str = "text", lines_per_batch: int = 1000) -> DataFrame:
    """P1: one row per line, numbered, with ``batch_id = floor(pos/n)``.

    Line semantics match Python ``str.splitlines`` for '\\n'-separated text:
    a trailing newline does not produce a final empty line (SURVEY.md §2.2
    edge note). Empty documents produce zero lines.
    """
    lines = F.expr(
        f"CASE WHEN length({text_col}) = 0 THEN CAST(array() AS array<string>) "
        f"WHEN substring({text_col}, -1, 1) = '\\n' "
        f"THEN slice(split({text_col}, '\\n'), 1, size(split({text_col}, '\\n')) - 1) "
        f"ELSE split({text_col}, '\\n') END"
    )
    carry = [c for c in df.columns if c != text_col]
    # posexplode_outer + null filter: plain posexplode lets the optimizer
    # infer size(_lines)>0 and push it below this projection with the whole
    # line-split expression inlined (evaluated twice per row). The outer
    # variant emits one null row per empty document, dropped by a cheap
    # attribute filter — identical output, single evaluation.
    return (
        df.withColumn("_lines", lines)
        .select(*carry, F.posexplode_outer("_lines").alias("line_pos", "line"))
        .filter(F.col("line").isNotNull())
        .withColumn("batch_id", (F.col("line_pos") / F.lit(lines_per_batch)).cast("long"))
    )


def batches(df: DataFrame, text_col: str = "text", lines_per_batch: int = 1000, doc_col: str = "doc_id") -> DataFrame:
    """P1+P2: collapse numbered lines back to one row per (doc, batch) with
    the lines as an array — the reference's Batch row (list[str] payload,
    src/models/batch.py:9-25). Aggregation is a map-side-combinable
    collect_list keyed by the same columns later stages join/group on."""
    return (
        split_lines(df, text_col, lines_per_batch)
        .groupBy(doc_col, "batch_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("line_pos", "line"))).alias("_ordered"),
        )
        .select(
            doc_col,
            "batch_id",
            F.col("_ordered.line").alias("lines"),
            F.size("_ordered").alias("line_count"),
        )
    )


def batch_counts(df: DataFrame, text_col: str = "text", lines_per_batch: int = 1000, doc_col: str = "doc_id") -> DataFrame:
    """Per-document total_batches (the reference's update_job_total_batches,
    src/api/app.py:259-276) without materializing lines: ceil(lines/n) from
    newline counts — a pure projection, no explode, no shuffle."""
    n_lines = F.expr(
        f"CASE WHEN length({text_col}) = 0 THEN 0 "
        f"WHEN substring({text_col}, -1, 1) = '\\n' "
        f"THEN size(split({text_col}, '\\n')) - 1 "
        f"ELSE size(split({text_col}, '\\n')) END"
    )
    return df.select(
        doc_col,
        n_lines.alias("line_count"),
        F.ceil(n_lines / F.lit(lines_per_batch)).cast("long").alias("total_batches"),
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    doc_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_groups: int = 64,
) -> DataFrame:
    """LM-pretraining sequence packing: concatenate the token stream in
    deterministic doc order and cut it every ``budget_tokens`` — each doc
    gets (pack_id, offset_in_pack); a doc straddling a cut continues into
    the next pack (standard concat-then-chunk packing; no padding waste).

    Scale shape: a GLOBAL running sum would serialize onto one task, so
    the corpus is sharded into ``n_groups`` deterministic hash groups
    (pack_group = doc_id % n_groups) packed independently — the exact
    trade real pipelines make, since packs need determinism, not a global
    order. One shuffle on pack_group; the window's running sum streams."""
    g = (F.col(doc_col) % n_groups).cast("int")
    w = (
        Window.partitionBy("pack_group")
        .orderBy(doc_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return (
        docs.withColumn("pack_group", g)
        .withColumn("tokens_before", before)
        .withColumn(
            "pack_id", F.floor(F.col("tokens_before") / F.lit(budget_tokens)).cast("long")
        )
        .withColumn(
            "offset_in_pack", (F.col("tokens_before") % F.lit(budget_tokens)).cast("long")
        )
    )


def minibatch_ids(df: DataFrame, group_cols: list[str], order_col: str, max_batch_size: int = 2048) -> DataFrame:
    """P3: assign embedding-minibatch numbers within each group —
    ``floor(row_number/max)`` over a deterministic order. The physical embed
    stage does its own in-UDF slicing (embed/backends.py); this column exists
    for accounting parity (A2) and the oracle checks."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    return df.withColumn(
        "minibatch_id",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(max_batch_size)).cast("long"),
    )


def length_bucketed_batches(
    df: DataFrame,
    token_col: str = "n_tok",
    id_col: str = "doc_id",
    batch_size: int = 8,
    shards: int = 16,
) -> DataFrame:
    """Length-bucketed training-batch assignment (extension family:
    training-batch shaping; no reference counterpart — the standard
    padding-efficiency technique for packed LM/seq2seq batches).

    Rows are bucketed by token-length magnitude (bucket = bit-length of
    the token count — pure integer expression, no float log2 whose libm
    rounding could differ across engines), sharded by ``id % shards``,
    then batch ids are assigned by a row_number window over
    (bucket, shard): batches group near-equal-length rows, so per-batch
    padding (batch_max - row_len) stays small.

    Scale shape: the only shuffle is the (bucket, shard) window; shards
    bound each window task at rows/(buckets*shards) regardless of data
    size — a single-bucket corpus still parallelizes. Emits per-row
    ``bucket``, ``shard``, ``batch_id``, plus ``batch_max`` /
    ``pad_waste`` via one second window over the SAME partitioning (no
    extra exchange; Spark reuses the hash partitioning)."""
    nbits = F.length(F.bin(F.col(token_col)))
    shard = (F.col(id_col) % F.lit(shards)).cast("int")
    with_keys = df.withColumn("bucket", nbits.cast("int")).withColumn("shard", shard)
    w = Window.partitionBy("bucket", "shard").orderBy(F.col(token_col), F.col(id_col))
    assigned = with_keys.withColumn(
        "batch_id", ((F.row_number().over(w) - F.lit(1)) / F.lit(batch_size)).cast("long")
    )
    wb = Window.partitionBy("bucket", "shard", "batch_id")
    return assigned.withColumn("batch_max", F.max(token_col).over(wb)).withColumn(
        "pad_waste", (F.col("batch_max") - F.col(token_col)).cast("long")
    )
