"""Structured Streaming deployment of the pipeline (SURVEY.md §2.9, §7 M8).

The reference's always-on deployment is RabbitMQ consumers with manual acks
(at-least-once, src/worker/worker.py:374-395) and idempotent upserts keyed by
deterministic ids. The idiomatic Spark equivalent keeps exactly those
semantics with less machinery:

  * the queue -> a file/kafka stream source with checkpointed offsets
  * basic_ack -> checkpoint commit after each micro-batch
  * at-least-once + uuid5-idempotent sink -> effectively-once (U6)
  * the extractor/worker stages -> the SAME batch stage functions applied
    inside foreachBatch — one code path for batch and streaming

Plus the streaming-native operators the reference lacks: watermarked
event-time windows and stateful sessionization (applyInPandasWithState).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectorflow_spark.config import PipelineConfig
from vectorflow_spark.pipeline import run_pipeline


def run_streaming_pipeline(
    spark: SparkSession,
    input_path: str,
    checkpoint: str,
    output_path: str,
    cfg: PipelineConfig,
    schema: str = "doc_id long, text string, source string",
    trigger_available_now: bool = True,
):
    """File-source streaming ingest -> the batch pipeline per micro-batch ->
    idempotent parquet sink. availableNow=True drains the backlog and stops
    (the test/cron mode); False runs continuously."""
    stream = spark.readStream.schema(schema).json(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        records = run_pipeline(batch_df, cfg)
        # overwrite-by-id idempotency: at-least-once delivery composes with
        # deterministic ids; duplicate re-deliveries rewrite the same rows
        records.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(output_path)

    writer = stream.writeStream.option("checkpointLocation", checkpoint).foreachBatch(process)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_manifest_pipeline(
    spark: SparkSession,
    manifest_dir: str,
    checkpoint: str,
    output_path: str,
    cfg: PipelineConfig,
    errors_path: str | None = None,
    allowed_schemes: str = "http,https",
    io: str = "auto",
    urls_per_task: int = 256,
    trigger_available_now: bool = True,
):
    """The reference's FULL ingestion cycle (upload -> fetch -> extract ->
    chunk -> embed -> sink) as ONE continuous stream over dropped URL
    manifests: the ``vf_docs`` streaming source fetches each new
    manifest's URLs on executors (checkpointed seen-manifest offsets =
    exactly-once per manifest), txt payloads run the SAME batch pipeline
    (run_pipeline: chunk -> uuid5 ids -> embed -> canonical payload) per
    micro-batch into an idempotent parquet sink, and fetch failures ride
    a DEAD-LETTER channel (``errors_path``) instead of failing the
    stream — the reference's per-file accounting (A4) made continuous.
    The micro-batch is persisted so the URL fetch happens once even
    though two sinks (records + errors) consume it."""
    from vectorflow_spark.sources import datasource

    datasource.register(spark)
    stream = (
        spark.readStream.format("vf_docs")
        .option("manifestDir", manifest_dir)
        .option("allowedSchemes", allowed_schemes)
        .option("io", io)
        .option("urlsPerTask", str(urls_per_task))
        .load()
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            docs = batch_df.filter(F.col("kind") == "txt").select("url", "source", "text")
            records = run_pipeline(docs, cfg)
            records.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(
                output_path
            )
            if errors_path:
                errs = batch_df.filter(F.col("kind") == "error").select(
                    "url", "source", "error"
                )
                errs.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(
                    errors_path
                )
        finally:
            batch_df.unpersist()

    writer = stream.writeStream.option("checkpointLocation", checkpoint).foreachBatch(process)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint: str,
    glob: str | None = None,
    markdown_mode: str = "raw",
    trigger_available_now: bool = True,
):
    """Continuous raw-file ingest through the S1-S5 extraction dispatch:
    ``binaryFile`` as a STREAMING source (checkpointed file offsets, so
    each file extracts exactly once across restarts) -> the same
    ``extract_documents`` projection the batch path uses — txt/md/html
    decode JVM-side, pdf/docx through the pandas-UDF parsers (PyMuPDF /
    python-docx when installed, the stdlib pdfmini/docxmini fallbacks
    otherwise) -> append-only parquet of (source, kind, text).

    This is the drop-a-file-in-a-bucket deployment of the reference's
    extractor service (reference src/extract/extract.py consumes a
    RabbitMQ queue of staged files): the directory IS the queue, the
    checkpoint IS the ack. Extraction is a pure per-row projection, so
    the stream needs no state store, no watermark, and scales by file
    partitioning alone; maxFilesPerTrigger bounds micro-batch size in
    continuous mode."""
    from vectorflow_spark.sources.readers import extract_documents

    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(input_dir).select(
        F.col("path"),
        F.element_at(F.split("path", "/"), -1).alias("source"),
        F.col("length"),
        F.col("content"),
    )
    docs = extract_documents(raw, markdown_mode=markdown_mode)
    writer = (
        docs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming form of
    q_events_window. Late rows beyond the watermark are dropped; state is
    bounded by watermark horizon * cardinality(event_type)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    stream: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Effectively-once within the stream itself: drop re-deliveries of the
    same deterministic id (K1 uuid5) arriving within the watermark horizon.
    ``dropDuplicatesWithinWatermark`` bounds state to the horizon — a plain
    streaming dropDuplicates would keep every id ever seen and OOM on an
    unbounded stream. This composes with (does not replace) the idempotent
    sink: the sink handles re-deliveries across restarts beyond the
    horizon."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (small) static
    dimension, which Spark broadcasts — no stream-side shuffle, no state.
    The static side is re-read per micro-batch, so a dim table updated
    in-place (e.g. a Delta/parquet overwrite) is picked up without
    restarting the query. For a LARGE dimension, pre-bucket both sides on
    the key instead; for stream-stream, watermarked interval joins apply."""
    return stream.join(F.broadcast(dim), on, how)


def join_streams_interval(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    watermark: str = "1 hour",
    within_seconds: int = 900,
) -> DataFrame:
    """Watermarked stream-stream inner join: right-side rows match a
    left-side row with the same key arriving within ``within_seconds``
    AFTER it (click->conversion attribution shape). Both sides carry
    watermarks and the join condition bounds event-time distance, so
    Spark can expire buffered state once the watermark passes the
    interval — without the time bound the state store would grow
    without limit. Column names must already be disjoint apart from the
    key (rename the right side's ts before calling)."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.{right_ts} >= l.{left_ts} "
        f"AND r.{right_ts} <= l.{left_ts} + INTERVAL {within_seconds} SECONDS"
    )
    return l.join(r, cond).drop(r[key])


def sessionize_events(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Stateful sessionization with applyInPandasWithState: per-user
    sessions close after ``gap_seconds`` of inactivity. State per key is one
    (start, last, count) tuple — O(active users), watermark-bounded.

    Batch analog (for oracles/tests): a session id via the classic
    gap > threshold window trick — see q_sessionize_batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{user_col} long, session_start timestamp, session_end timestamp, n_events long"
    )
    state_schema = "start long, last long, n long"

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    user_col: [user],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        ts = rows[ts_col].astype("int64") // 1_000_000_000
        ts = ts.sort_values()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = int(ts.iloc[0]), int(ts.iloc[0]), 0
        closed = []
        for t in ts:
            t = int(t)
            if t - last > gap_seconds:
                closed.append((start, last, n))
                start, n = t, 0
            last = max(last, t)
            n += 1
        state.update((start, last, n))
        state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    user_col: [user] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return (
        events.withWatermark(ts_col, f"{2 * gap_seconds} seconds")
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Batch sessionization (same semantics, windowed): new session when the
    gap from the previous event exceeds the threshold; session id is the
    running count of session starts. One shuffle on user_id."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    with_gap = events.withColumn(
        "_new_session",
        F.when(
            F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long"), 1).over(w)
            > gap_seconds,
            1,
        ).otherwise(0),
    )
    with_sid = with_gap.withColumn(
        "session_id", F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def streaming_cms(
    stream: DataFrame,
    key_col: str,
    sketch_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 64,
):
    """Maintain a count-min sketch over a stream: each micro-batch writes
    its own sketch DELTA to ``sketch_dir/batch_id=N`` (overwrite — replays
    of the same batch after a failure land on the same path, so
    at-least-once delivery still yields exactly-once counts), and readers
    merge deltas by summing cells. Mergeability is the whole point of the
    sketch: the per-batch write is bounded by d*w cells regardless of
    batch size, and no read-modify-write of global state ever happens —
    the commutative merge replaces transactional state.

    Returns the started StreamingQuery (availableNow trigger is the
    caller's choice via .trigger on the returned query's writeStream —
    here we start with whatever the default trigger is)."""
    from vectorflow_spark.operators.sketches import cms_build

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        delta = cms_build(batch_df, key_col, depth, width)
        delta.write.mode("overwrite").parquet(f"{sketch_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cms(spark, sketch_dir: str) -> DataFrame:
    """Merge all per-batch sketch deltas into the current global sketch:
    one sum over <= n_batches * d * w tiny rows."""
    return (
        spark.read.parquet(sketch_dir)
        .groupBy("row_id", "col_id")
        .agg(F.sum("cnt").alias("cnt"))
    )


def streaming_hll(
    stream: DataFrame,
    group_col: str,
    key_col: str,
    sketch_dir: str,
    checkpoint_dir: str,
):
    """Maintain per-group HyperLogLog registers over a stream: each
    micro-batch writes its own (grp, j, m_j) register DELTA to
    ``sketch_dir/batch_id=N``; readers merge deltas by MAX per register.

    Stronger replay story than the count-min twin: max-merge is
    IDEMPOTENT, not merely commutative, so a replayed batch could not
    corrupt the total even if its delta landed on a fresh path — the
    batch_id=N overwrite discipline is kept anyway for the shared GC /
    manifest conventions. Per-batch write is <= 64 rows per group
    regardless of batch size; running distinct-count over a day of
    ingest costs one max-merge over n_batches * 64 tiny rows."""
    from vectorflow_spark.operators.sketches import hll_registers

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        delta = hll_registers(batch_df, group_col, key_col)
        delta.write.mode("overwrite").parquet(f"{sketch_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_hll(spark, sketch_dir: str, group_col: str = "grp") -> DataFrame:
    """Current per-group distinct estimate from the streamed register
    deltas: max-merge registers, then the shared estimate step — numbers
    identical to a batch hll_distinct_estimate over the same rows
    (asserted in tests/test_streaming.py)."""
    from vectorflow_spark.operators.sketches import hll_estimate_from_registers

    regs = (
        spark.read.parquet(sketch_dir)
        .groupBy("grp", "j")
        .agg(F.max("m_j").alias("m_j"))
    )
    return hll_estimate_from_registers(regs, group_col)


def streaming_scd2(
    update_stream: DataFrame,
    dim_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    compare_cols: list[str],
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
):
    """Maintain a slowly-changing-dimension type-2 table from a stream of
    update batches: each micro-batch applies ``scd2_apply`` (operators/
    diff.py) against the current snapshot and writes the next version to
    ``dim_dir/version=N`` (N = streaming batch id). Version directories
    make replays idempotent under at-least-once delivery — a re-fired
    batch overwrites ITS OWN version path, never a later one — and give
    readers time travel for free (read the max version, or any prior).

    Each update row must carry an ``effective_ts`` timestamp column; the
    batch's effective time is its max (deterministic under replay, unlike
    wall clock). The per-batch cost is one digest-compressed full-outer
    join of snapshot x batch — the same plan shape as the batch operator,
    just driven by the scheduler."""
    from vectorflow_spark.operators.diff import scd2_apply

    spark = update_stream.sparkSession

    def prior_version(batch_id: int) -> int | None:
        """Largest COMMITTED version STRICTLY below this batch id — correct
        both live (prior batch) and on replay (re-fired batch N must not
        read its own or any later output; empty batches may leave holes in
        the version sequence, so "batch_id - 1" would be wrong). Versions
        come from the store's manifest (sinks/writers.list_versions), not
        a directory listing, so a version directory whose batch crashed
        before the manifest commit is invisible — S3-listing-consistency
        safe and replay-correct in the same stroke."""
        from vectorflow_spark.sinks.writers import list_versions

        below = [x for x in list_versions(dim_dir, prefix="version") if x < batch_id]
        return max(below) if below else None

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            eff = batch_df.agg(F.max("effective_ts")).collect()[0][0]
            prior = prior_version(batch_id)
            if prior is None:
                current = (
                    batch_df.sparkSession.createDataFrame(
                        [],
                        batch_df.select(
                            *key_cols, *compare_cols, "effective_ts"
                        ).schema,
                    )
                    .select(
                        *key_cols,
                        *compare_cols,
                        F.col("effective_ts").alias(valid_from_col),
                    )
                    .withColumn(valid_to_col, F.lit(None).cast("timestamp"))
                    .drop("effective_ts")
                )
                keep = [*key_cols, *compare_cols, valid_from_col, valid_to_col]
                current = current.select(*keep)
            else:
                current = batch_df.sparkSession.read.parquet(
                    f"{dim_dir}/version={prior}"
                )
            updates = batch_df.select(*key_cols, *compare_cols)
            nxt = scd2_apply(
                current,
                updates,
                key_cols,
                compare_cols,
                F.lit(eff),
                valid_from_col,
                valid_to_col,
            )
            nxt.write.mode("overwrite").parquet(f"{dim_dir}/version={batch_id}")
            # commit AFTER the data write: a crash in between leaves an
            # uncommitted orphan the replay overwrites; a re-fired batch
            # re-adds its own id (set semantics, idempotent)
            from vectorflow_spark.sinks.writers import _commit_manifest, list_versions

            _commit_manifest(dim_dir, set(list_versions(dim_dir, prefix="version")) | {batch_id})
        finally:
            batch_df.unpersist()

    return (
        update_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_scd2(spark, dim_dir: str, version: int | None = None) -> DataFrame:
    """Read an SCD2 dimension maintained by ``streaming_scd2`` — the
    latest COMMITTED version by default, or any retained prior version
    (time travel). Committed = present in the store manifest; uncommitted
    orphans from crashed batches are invisible."""
    from vectorflow_spark.sinks.writers import list_versions

    versions = list_versions(dim_dir, prefix="version")
    if not versions:
        raise FileNotFoundError(f"no versions under {dim_dir}")
    v = version if version is not None else versions[-1]
    if v not in set(versions):
        raise ValueError(f"version {v} is not committed under {dim_dir}")
    return spark.read.parquet(f"{dim_dir}/version={v}")


def streaming_line_frequencies(
    stream: DataFrame,
    line_dir: str,
    checkpoint_dir: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
):
    """Maintain corpus line frequencies over a document stream — the
    incremental half of CCNet-style boilerplate removal
    (operators/lines.py): each micro-batch writes its own (line, n_docs,
    n_occurrences) DELTA to ``line_dir/batch_id=N`` (overwrite — a
    replayed batch lands on its own path, so at-least-once delivery still
    yields exactly-once counts) and readers merge deltas by summing.
    Same replay-idempotent commutative-merge shape as ``streaming_cms``;
    unlike the sketch the delta is distinct-line-sized, which is exactly
    what makes boilerplate detectable: the lines worth catching are the
    ones that combine hard.

    n_docs sums per-batch distinct-doc counts, so it is exact while a
    document's lines never straddle batches (one row per doc, as in the
    ingest pipeline). Nightly boilerplate updates then read the merged
    frequencies and feed ``drop_frequent_lines``'s frequent set."""
    from vectorflow_spark.operators.lines import line_frequencies

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        delta = line_frequencies(batch_df, doc_col=doc_col, text_col=text_col)
        delta.write.mode("overwrite").parquet(f"{line_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_line_frequencies(spark, line_dir: str) -> DataFrame:
    """Merge all per-batch line-frequency deltas: one map-side-combinable
    sum keyed on the line."""
    return (
        spark.read.parquet(line_dir)
        .groupBy("line")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_occurrences").alias("n_occurrences"),
        )
    )


def read_boilerplate_lines(spark, line_dir: str, min_doc_count: int = 10) -> DataFrame:
    """The current frequent-line (boilerplate) set from the merged stream
    state — drop-in as the frequent set for batch-side line stripping."""
    return read_line_frequencies(spark, line_dir).filter(
        F.col("n_docs") >= min_doc_count
    ).select("line")


def streaming_kmv_distinct(
    stream: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 128,
):
    """Running distinct-count per group over an unbounded stream in O(k)
    state: a KMV sketch (the k smallest distinct key hashes — see
    operators/sketches.py) lives in the per-group GroupState; each
    micro-batch folds its new hashes into the sketch and emits the
    refreshed (k-1) * 2^28 / h_(k) estimate (exact count while the sketch
    is short). Because the KMV merge is commutative and idempotent,
    replayed micro-batches (at-least-once delivery) cannot move the
    estimate — the state converges to the same sketch no matter how input
    is batched, and it is checkpointed/restored across restarts like any
    streaming state.

    Implemented on ``applyInPandasWithState``; the Spark-4 successor
    (``transformWithStateInPandas``, SPARK-49048) would hold the sketch in
    a named ValueState instead, but its state protocol requires the
    protobuf package, absent from this environment — a single-tuple
    GroupState carries the array just as well.

    The key hash is computed JVM-side BEFORE the stateful operator — the
    portable md5-substring integer — so the Python function only merges
    int64 arrays; per-group state never exceeds k * 8 bytes regardless of
    stream cardinality. Returns an update-mode stream of
    (group, est_distinct)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    space = float(1 << 28)
    out_schema = f"{group_col} string, est_distinct double"
    state_schema = "hs array<bigint>"

    def fn(key, pdfs, state: GroupState):
        merged = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            merged.update(int(h) for h in pdf["h"])
        hs = sorted(merged)[:k]
        state.update((hs,))
        est = float(len(hs)) if len(hs) < k else round((k - 1) * space / hs[-1], 3)
        yield pd.DataFrame({group_col: [key[0]], "est_distinct": [est]})

    hashed = stream.select(
        F.col(group_col).cast("string").alias(group_col),
        F.conv(
            F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|kmv"))), 1, 7),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    return hashed.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_incremental_dedup(
    stream_docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    bands: int = 4,
    num_hashes: int = 16,
):
    """Continuous-ingest near-dup dedup: each micro-batch of new documents
    is deduplicated WITHIN the batch (LSH band collisions keep the lowest
    id) and AGAINST the persisted corpus index built by all prior batches,
    then appends its survivors' (band, bucket) postings to the index —
    the streaming twin of ``operators/dedup.incremental_dedup`` and the
    shape a 100 TB corpus actually grows by (nightly/hourly crawl drops,
    never a full-corpus re-minhash).

    Replay-idempotent the same way streaming_cms/scd2 are: both the
    survivor output and the index delta land at ``.../batch_id=N`` with
    overwrite, so an at-least-once re-fire of batch N rewrites its own
    files and the union view is unchanged — no transactional read-modify-
    write of global state. The index join reads the CURRENT union of
    deltas at batch time; because replays see at least the index state
    they saw before, a replayed batch can only re-drop the same rows.

    Index scale: postings are (band, bucket) longs — 4 rows per surviving
    document at the defaults — and the per-batch join is
    new-batch-bands x index, an equi-join on uniform 8-byte keys.
    ``compact_dedup_index`` folds committed deltas into one ``base_id=W``
    directory periodically (below) so the delta count stays bounded.
    Delta discovery here is a driver-side ``os.listdir``
    (local paths, matching this environment); a cluster deployment lists
    the same ``batch_id=N`` layout through the Hadoop FileSystem client —
    foreachBatch runs on the driver, where that client exists. Returns
    the started StreamingQuery (availableNow)."""
    import os

    from vectorflow_spark.operators.dedup import (
        lsh_band_buckets,
        minhash_signatures,
    )

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bb = lsh_band_buckets(
            minhash_signatures(batch_df, doc_col, text_col, n, num_hashes),
            doc_col,
            bands,
            num_hashes,
        ).localCheckpoint()  # batch_df is a one-shot micro-batch frame: it
        # feeds the within-batch dedup AND the index join AND the delta
        # write; the cut keeps minhash from re-running per consumer
        # within-batch: keep the lowest doc id per colliding bucket
        keeper = bb.groupBy("band", "bucket").agg(F.min(doc_col).alias("_keep"))
        dropped_within = (
            bb.join(keeper, ["band", "bucket"])
            .filter(F.col(doc_col) != F.col("_keep"))
            .select(doc_col)
            .distinct()
        )
        batch_unique = batch_df.join(dropped_within, doc_col, "left_anti")
        # against the persisted corpus index (empty on the first batch) —
        # probing with the CHECKPOINTED bb postings, not incremental_dedup
        # directly: that operator would re-shingle + re-minhash the batch,
        # doubling the dominant per-doc cost for a bit-identical result
        # (signatures are deterministic)
        # the CURRENT index = the compacted base (batch_id=-1, if any) +
        # deltas, minus this batch's own delta (a replayed batch must not
        # collide with its own postings — compact_dedup_index only ever
        # folds COMMITTED batches into the base, which never re-fire, so
        # base postings are always genuinely prior; streaming batch ids
        # are >= 0, so the exclusion can never match the base)
        prior = [
            d for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else [])
            if d.startswith("batch_id=") and d != f"batch_id={batch_id}"
        ]
        if prior:
            idx = spark.read.parquet(*[os.path.join(index_dir, d) for d in prior])
            suspects = (
                bb.join(idx.select("band", "bucket"), ["band", "bucket"], "left_semi")
                .select(doc_col)
                .distinct()
            )
            survivors = batch_unique.join(suspects, doc_col, "left_anti")
        else:
            survivors = batch_unique
        survivors = survivors.localCheckpoint()  # two writes below
        survivors.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        bb.join(survivors.select(doc_col), doc_col, "left_semi").select(
            "band", "bucket"
        ).write.mode("overwrite").parquet(f"{index_dir}/batch_id={batch_id}")

    return (
        stream_docs.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_dedup_index(
    spark,
    index_dir: str,
    checkpoint_dir: str | None = None,
    upto_batch_id: int | None = None,
    n_files: int = 8,
) -> int | None:
    """Retention/compaction for ``streaming_incremental_dedup``'s index:
    fold every COMMITTED ``batch_id=N`` delta (N <= watermark) plus any
    prior base into one distinct base directory, then drop the folded
    deltas — the delta count stays bounded while the stream runs
    forever. Bases live at NEGATIVE batch ids (``batch_id=-1``, then
    ``-2``, ... — each compaction installs a fresh versioned base):
    streaming batch ids are non-negative, so bases stay inside the
    partition-column namespace (whole-root parquet reads keep working)
    while the per-batch replay exclusion can never match them.

    Replay-idempotency is preserved by construction: the watermark is the
    newest batch id in the streaming checkpoint's ``commits`` log (derived
    automatically from ``checkpoint_dir``; pass ``upto_batch_id`` only if
    you track commits yourself). Structured Streaming never re-executes a
    committed batch, so no replayed batch can ever meet its OWN postings
    inside the base — the property the per-batch
    ``d != f"batch_id={batch_id}"`` exclusion provides for deltas.
    Postings are semantically a SET (the probe is a left-semi join on
    (band, bucket)), so the distinct fold changes no decision — new
    batches dedup byte-identically against base+deltas vs the original
    delta pile. Crash-safe: the new base is written to a dot-temp dir and
    renamed in AT A FRESH NAME before the old base or any folded delta is
    removed; every intermediate state is a superset union that is
    decision-identical (duplicate postings are harmless under semi-join),
    and a re-run folds whatever coexists again.

    Returns the watermark folded up to, or None when there is nothing to
    fold (fewer than two directories at/below the watermark)."""
    import os
    import shutil

    def _bid(d: str) -> int:
        return int(d.split("=", 1)[1])

    if upto_batch_id is None:
        if checkpoint_dir is None:
            raise ValueError("compact_dedup_index needs checkpoint_dir or upto_batch_id")
        commits = os.path.join(checkpoint_dir, "commits")
        ids = (
            [int(f) for f in os.listdir(commits) if f.isdigit()]
            if os.path.isdir(commits)
            else []
        )
        if not ids:
            return None
        upto_batch_id = max(ids)
    entries = os.listdir(index_dir) if os.path.isdir(index_dir) else []
    fold = [
        (_bid(d), d)
        for d in entries
        if d.startswith("batch_id=") and _bid(d) <= upto_batch_id
    ]  # prior bases (negative ids), when present, fold in automatically
    if len(fold) < 2:
        return None
    new_w = max(n for n, _ in fold)
    merged = (
        spark.read.parquet(*[os.path.join(index_dir, d) for _, d in fold])
        .select("band", "bucket")
        .distinct()
        .coalesce(n_files)
    )
    tmp = os.path.join(index_dir, ".tmp_base")
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)  # reads all sources HERE
    # Install the new base at a FRESH versioned name (next id below every
    # existing base) BEFORE removing anything: at no instant does a
    # concurrent micro-batch listing miss a posting — between install and
    # cleanup the union is a superset (duplicates harmless under the
    # semi-join probe), and a crash anywhere leaves a state a re-run
    # simply folds again. Never delete-then-install (the old base held
    # postings whose deltas were removed by prior compactions — a crash
    # in a delete-first window would lose them permanently).
    new_base_id = min([n for n, _ in fold if n < 0] or [0]) - 1
    os.replace(tmp, os.path.join(index_dir, f"batch_id={new_base_id}"))
    for _, d in fold:
        shutil.rmtree(os.path.join(index_dir, d), ignore_errors=True)
    return new_w


def read_dedup_survivors(spark, out_dir: str) -> DataFrame:
    """All surviving documents across batches (union of per-batch dirs)."""
    return spark.read.parquet(out_dir)
