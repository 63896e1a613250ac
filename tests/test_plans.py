"""Physical-plan shape assertions — the scale-design contract.

These tests pin the *plan*, not the output: pushdown reaches the scan,
declared-shuffle-free operators stay shuffle-free (only the explicit input
repartition is allowed), small-side joins broadcast, and top-k never sorts
the world. A regression here is a 100 TB incident that sf0.01 correctness
tests would never catch.
"""

import pytest

import __spark_entry__ as entry


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def n_exchanges(df) -> int:
    # count shuffle exchanges; broadcast exchanges are counted separately
    return physical(df).count("Exchange hashpartitioning") + physical(df).count(
        "Exchange RoundRobinPartitioning"
    ) + physical(df).count("Exchange rangepartitioning")


@pytest.fixture(scope="module")
def Q():
    return entry.queries()


def test_filter_pushdown_reaches_scan(spark, sf_dir, Q):
    plan = physical(Q["q_filter_nonempty"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    # the length predicate itself is not pushable, but the scan must not
    # read columns the query never uses
    assert "lang" not in plan.split("ReadSchema")[-1]


def test_scan_projection_prunes_columns(spark, sf_dir, Q):
    plan = physical(Q["q_scan_documents"](spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[-1]
    assert "text" in read_schema and "lang" not in read_schema and "source" not in read_schema


@pytest.mark.parametrize(
    "name",
    [
        "q_minhash_signatures",
        "q_simhash",
        "q_rolling_fingerprint",
        "q_token_counts",
        "q_quality_scores",
        "q_lang_id",
    ],
)
def test_projection_operators_are_shuffle_free(spark, sf_dir, Q, name):
    """Declared single-projection operators: the only shuffle allowed is the
    explicit round-robin input split (scan partitions -> CPU partitions)."""
    df = Q[name](spark, sf_dir)
    plan = physical(df)
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Exchange rangepartitioning") == 0, plan


@pytest.mark.parametrize("name", ["q_lsh_buckets", "q_ivf_assign"])
def test_histogram_queries_partial_aggregate_map_side(spark, sf_dir, Q, name):
    """Bucket/cluster assignment is shuffle-free; the histogram groupBy is
    the one exchange, and it must combine map-side (partial_count)."""
    plan = physical(Q[name](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_count" in plan, plan


def test_sink_payload_broadcasts_dimension(spark, sf_dir, Q):
    assert "BroadcastHashJoin" in physical(Q["q_sink_payload"](spark, sf_dir))


def test_knn_broadcasts_query_side(spark, sf_dir, Q):
    assert "BroadcastNestedLoopJoin" in physical(Q["q_knn_batch"](spark, sf_dir))


def test_semijoin_is_left_semi(spark, sf_dir, Q):
    assert "LeftSemi" in physical(Q["q_semijoin_valid_chunks"](spark, sf_dir))


def test_anti_join_is_left_anti(spark, sf_dir, Q):
    assert "LeftAnti" in physical(Q["q_anti_join"](spark, sf_dir))


def test_topk_is_partial_not_global_sort(spark, sf_dir, Q):
    plan = physical(Q["q_topk_cosine"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # a global sort would range-partition


def test_e2e_pipeline_is_one_stage_after_split(spark, sf_dir):
    """chunk -> embed -> sink projection must fuse into the partitions the
    explicit repartition creates: exactly one shuffle in the whole plan."""
    df = entry.entry(spark)
    plan = physical(df)
    assert plan.count("Exchange RoundRobinPartitioning") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan


def test_regional_revenue_broadcasts_all_dims(spark, sf_dir, Q):
    """TPC-H Q5 shape: every dimension (customer/supplier/nation/region)
    broadcasts; the only shuffle joins lineitem to orders on orderkey."""
    plan = physical(Q["q_regional_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan


def test_big_orders_semi_join_broadcasts_keys(spark, sf_dir, Q):
    """Q18 shape: the HAVING-qualified key set is small and must broadcast
    into the semi join (not shuffle the fact table a second time)."""
    plan = physical(Q["q_big_orders"](spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan.split("LeftSemi")[0] or "LeftSemi, BuildRight" in plan, plan


def test_price_band_join_is_broadcast_nested_loop(spark, sf_dir, Q):
    """Non-equi band join: tiny interval dim broadcasts; the fact side must
    not shuffle at all for the join itself."""
    plan = physical(Q["q_price_band_join"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_tfidf_partial_aggregates_and_topk_pushdown(spark, sf_dir, Q):
    """TF-IDF at scale: the tf aggregation must combine map-side
    (partial_count before the (doc_id, term) shuffle), and the per-doc
    top-5 must push a partial WindowGroupLimit below the doc_id exchange so
    each map task ships at most 5 rows per doc, not the whole vocabulary.
    (The df side broadcasts here only because sf-scale size estimates say
    it fits; with real table stats Catalyst flips it to a shuffle join —
    that decision is size-driven, not plan-coded.)"""
    plan = physical(Q["q_tfidf_topterms"](spark, sf_dir))
    assert "partial_count" in plan, plan
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_extract_documents_triggers_no_jobs(spark, tmp_path_factory):
    """S2/S3 dispatch is plan-only: r1 probed the data with two
    limit(1).count() jobs to decide whether to attach the pdf/docx UDF
    columns; now the whole extract builds with ZERO Spark jobs — the
    caller's action is the first job."""
    from vectorflow_spark.sources.readers import extract_documents, read_raw_files

    d = tmp_path_factory.mktemp("extract_probe")
    (d / "a.txt").write_text("hello")
    (d / "b.pdf").write_bytes(b"%PDF-FAKE\nx")
    sc = spark.sparkContext
    sc.setJobGroup("extract_probe_group", "plan-only probe")
    try:
        extract_documents(read_raw_files(spark, str(d)))
        jobs = sc.statusTracker().getJobIdsForGroup("extract_probe_group")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(jobs) == []


def test_minhash_pairs_single_bucket_exchange(spark, sf_dir, Q):
    """Pair generation self-joins the localCheckpointed capped (doc, band,
    bucket) frame (r11 optimization: the signature pipeline runs once into
    the checkpoint; the clique expansion is a codegen'd join, not an
    interpreted posting-list lambda). The final plan must scan the
    checkpointed RDD — not re-run the signature pipeline per join side —
    and the only hash exchange after it is the output distinct (the join
    build side broadcasts at driver scale)."""
    plan = physical(Q["q_minhash_band_pairs"](spark, sf_dir))
    assert "ExistingRDD" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_connected_components_edges_checkpointed_once(spark):
    """The iteration join must scan the materialized edge set, not re-run
    the candidate-pair pipeline: localCheckpoint leaves Scan ExistingRDD
    nodes in the final plan and the per-iteration plans stay flat."""
    from vectorflow_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3)], "doc_id long")
    out = connected_components(edges, verts)
    assert "ExistingRDD" in physical(out)


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir, Q):
    """The benchmark shingle set must broadcast (eval sets are small by
    definition); the corpus side joins without an exchange. Allowed
    shuffles: the benchmark-side distinct (tiny) and the per-doc overlap
    count — the CORPUS shingle rows themselves are never exchanged."""
    plan = physical(Q["q_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "SortMergeJoin" not in plan, plan


@pytest.mark.parametrize(
    "name",
    ["q_repetition_scores", "q_gopher_quality", "q_pii_scrub", "q_markdown_extract"],
)
def test_curation_projections_are_shuffle_free(spark, sf_dir, Q, name):
    plan = physical(Q[name](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 0, plan


def test_enhance_chunks_no_chunk_text_shuffle(spark, sf_dir, Q):
    """With the documents DataFrame supplied, the context dimension builds
    straight from the source table and broadcasts — chunk rows never hash-
    shuffle (the r1 version reassembled doc text via groupBy+collect_list
    over chunk text, the fattest column in the pipeline)."""
    plan = physical(Q["q_enhance_chunks"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "collect_list" not in plan, plan


def test_no_inferred_filter_reevaluates_generators(spark, sf_dir, Q):
    """The posexplode_outer discipline: no optimizer-inferred size()>0
    filter may sit below the chunk/shingle projections (it would inline and
    re-evaluate the whole generator expression per row)."""
    for name in ("q_chunk_exact_chars", "q_ngram_jaccard_pairs"):
        plan = optimized(Q[name](spark, sf_dir))
        for line in plan.splitlines():
            if line.strip().startswith("Filter"):
                assert "transform(" not in line, (name, line)


def test_topk_per_group_uses_window_group_limit(spark, sf_dir, Q):
    """rn <= k must be rewritten to WindowGroupLimit so each map task
    prunes to its local top-k per group BEFORE the exchange."""
    plan = physical(Q["q_topk_per_group"](spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_forecast_revenue_pushes_all_predicates(spark, sf_dir, Q):
    """TPC-H Q6 shape: shipdate/discount/quantity filters must reach the
    parquet scan as PushedFilters — the scan is the whole query."""
    plan = physical(Q["q_forecast_revenue"](spark, sf_dir))
    scan = plan.split("Scan parquet")[1][:2000]
    assert "PushedFilters" in scan, plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan.split("ReadSchema")[0], f"{col} not pushed:\n{scan}"


def test_waiting_suppliers_shares_orderkey_partitioning(spark, sf_dir, Q):
    """Q21 shape: the two per-order aggregates and the joins all key on
    orderkey; supplier broadcasts. No more than the orderkey exchanges."""
    plan = physical(Q["q_waiting_suppliers"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    # lineitem-sized exchanges must all key on orderkey; the only other
    # hash exchange allowed is the final tiny s_name group-by.
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([a-z_#0-9]+)", plan):
        key = m.group(1)
        assert "orderkey" in key or "ok" in key or "s_name" in key, m.group(0)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime-filter pushdown, the third leg of the scale toolkit next to
    broadcast and AQE skew handling: a selective dimension filter injects
    a bloom filter into the fact side (bloom_filter_agg on the dim,
    might_contain above the fact scan), so fact rows that cannot join die
    at the scan instead of shuffling. Thresholds are lowered because the
    injection is size-gated (at sf-scale the dim is tiny and the fact scan
    under the default 10 GB application-side gate)."""
    from pyspark.sql import functions as F

    keys = [
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        spark.conf.set(keys[0], "true")
        spark.conf.set(keys[1], "10GB")
        spark.conf.set(keys[2], "0")
        spark.conf.set(keys[3], "-1")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderstatus") == "F"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_parquet_aggregate_pushdown_answers_from_footers(spark, sf_dir):
    """COUNT(*)/MIN/MAX without filters can be answered from parquet
    row-group footers — at 100 TB that's the difference between a
    metadata read and a full scan for table-stats queries. The V2 parquet
    source (parquet removed from useV1SourceList) + aggregatePushdown
    must show the aggregates in PushedAggregation and return the same
    values the V1 scan computes. Both confs are dynamic; restored after."""
    from pyspark.sql import functions as F

    keys = ["spark.sql.sources.useV1SourceList", "spark.sql.parquet.aggregatePushdown"]
    old = {k: spark.conf.get(k) for k in keys}
    path = f"{sf_dir}/lineitem.parquet"
    expected = spark.read.parquet(path).agg(
        F.count("*").alias("n"), F.min("l_orderkey").alias("mn"), F.max("l_orderkey").alias("mx")
    ).collect()[0]
    try:
        spark.conf.set(keys[0], "avro,csv,json,kafka,orc,text")
        spark.conf.set(keys[1], "true")
        agg = spark.read.parquet(path).agg(
            F.count("*").alias("n"), F.min("l_orderkey").alias("mn"), F.max("l_orderkey").alias("mx")
        )
        plan = physical(agg)
        seg = plan.split("PushedAggregation: [")[1].split("]")[0]
        assert "COUNT(*)" in seg and "MIN(l_orderkey)" in seg and "MAX(l_orderkey)" in seg, plan
        [got] = agg.collect()
        assert (got.n, got.mn, got.mx) == (expected.n, expected.mn, expected.mx)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_kmv_sketch_exchanges_are_sketch_sized(spark, sf_dir, Q):
    """The KMV build must cap state BEFORE its one merge shuffle: the
    mapInPandas bottom-k sits BELOW the single hashpartitioning exchange of
    the sketch aggregation. q_kmv_overlap adds only a broadcast pair join
    on top — 1 hash exchange total; q_kmv_distinct adds the exact-side
    ground-truth distinct+count (2 more); neither may sort-merge join."""
    pairs = Q["q_kmv_overlap"](spark, sf_dir)
    ppln = physical(pairs)
    # the sketch frame is checkpointed before the self-join: the query plan
    # reads the materialized sketch (no rebuild per side, no exchange)
    assert ppln.count("Exchange hashpartitioning") == 0, ppln
    assert "BroadcastNestedLoopJoin" in ppln and "Scan ExistingRDD" in ppln, ppln
    est = Q["q_kmv_distinct"](spark, sf_dir)
    plan = physical(est)
    assert plan.count("Exchange hashpartitioning") == 3, plan
    # truncation below the exchange: the Python stage feeds the merge agg
    assert plan.index("MapInPandas") > plan.index("Exchange hashpartitioning"), plan
    assert "SortMergeJoin" not in plan and "SortMergeJoin" not in ppln, plan


@pytest.mark.parametrize("name", ["q_flac_roundtrip", "q_lowdepth_roundtrip"])
def test_codec_roundtrips_are_shuffle_free(spark, sf_dir, Q, name):
    """Round-7 codec gates are embarrassingly-parallel per-row projections:
    one Arrow-batched MapInPandas, and the only exchange allowed is the
    explicit round-robin input split."""
    plan = physical(Q[name](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Exchange rangepartitioning") == 0, plan
    assert plan.count("MapInPandas") == 1, plan


@pytest.mark.parametrize("name", ["q_image_neardup_pairs", "q_audio_fingerprint_dedup"])
def test_perceptual_neardup_uses_banded_exchanges_only(spark, sf_dir, Q, name):
    """The re-shaped (r7 ground-truth) perceptual gates: one Arrow decode
    pass, then the generic Hamming-ball bander — pairs come from per-bucket
    posting aggregation on uniform band keys (exactly two hash exchanges),
    never a join; any join operator here would be the all-pairs plan that
    dies at 100 TB."""
    plan = physical(Q[name](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


@pytest.mark.parametrize("name", ["q_id3_meta", "q_exif_orientation"])
def test_r9_metadata_gates_are_shuffle_free(spark, sf_dir, Q, name):
    """Round-9 metadata gates (ID3v2, EXIF) are per-row projections: one
    Arrow-batched MapInPandas, only the explicit input split."""
    plan = physical(Q[name](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Exchange rangepartitioning") == 0, plan
    assert plan.count("MapInPandas") == 1, plan


def test_albumart_dedup_joins_on_hash_equality(spark, sf_dir, Q):
    """Cross-modal album-art dedup must pair via an EQUALITY join on the
    pixel dHash — a nested-loop or cartesian here would be the pairwise
    scan that dies at 100 TB. Either equi-join family is acceptable
    (AQE/stats pick broadcast vs sort-merge); what is pinned is the
    absence of any non-equi join."""
    plan = physical(Q["q_albumart_dedup"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan
    # build + dhash stages on each side: (builder, hasher) x (audio, image)
    assert plan.count("MapInPandas") == 4, plan


@pytest.mark.parametrize(
    "name", ["q_aiff_au_roundtrip", "q_au_g711", "q_adpcm_roundtrip", "q_epub_roundtrip", "q_rtf_roundtrip"]
)
def test_r9_container_gates_are_shuffle_free(spark, sf_dir, Q, name):
    """Round-9 container gates (AIFF/AU/ADPCM audio, EPUB, RTF) are
    per-row projections: one Arrow-batched MapInPandas, only the
    explicit input split."""
    plan = physical(Q[name](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Exchange rangepartitioning") == 0, plan
    assert plan.count("MapInPandas") == 1, plan


def test_smart_metadata_is_pure_codegen_projection(spark, sf_dir, Q):
    """The smart metadata extractor must stay entirely JVM-side: no
    Python boundary of any kind and no exchange beyond the input split
    — at 100 TB it rides the extraction scan for free."""
    plan = physical(Q["q_smart_metadata"](spark, sf_dir))
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan
    # pre-AQE explain shows no codegen labels; the Python-free + single
    # Project shape is the codegen guarantee
    assert plan.count("Project") >= 1, plan


def test_mmr_candidates_are_takeordered_then_one_group(spark, sf_dir, Q):
    """MMR: the corpus is only touched by the candidate
    TakeOrderedAndProject; the greedy selection is ONE bounded
    FlatMapGroupsInPandas group — never a pairwise join or global
    sort."""
    plan = physical(Q["q_mmr_diversify"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_c4_filters_single_clean_evaluation(spark, sf_dir, Q):
    """The C4 cleaning lambda pipeline must be computed ONCE per row:
    a collapsed projection re-evaluates the split-trim-filter-join chain
    for clean_text, n_sentences AND keep_page — a tripled regex cost at
    100 TB. Also: zero Python, zero shuffles beyond the input split."""
    df = Q["q_c4_filters"](spark, sf_dir)
    plan_opt = optimized(df)
    assert plan_opt.count("array_join") == 1, plan_opt
    plan = physical(df)
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan


def test_label_prop_edges_checkpointed_once(spark, sf_dir, Q):
    """The unrolled LPA loop must reference a CHECKPOINTED edge set: an
    uncut lineage re-derives the orders x lineitem join every round.
    Three rounds = three dst joins + per-round (src,lbl)+src aggs; the
    scan of the raw fact tables must appear zero times in the final
    plan (the checkpoint replaces it)."""
    plan = physical(Q["q_label_prop"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan, plan  # the localCheckpoint
    assert "lineitem" not in plan, plan


def test_indexed_lookup_prunes_files(spark, Q):
    """The index-driven lookup must decode only files whose stats range
    intersects the probe — at sf0.01 the bucketed corpus has ~8 files
    and the [1024, 1400] range lives in exactly one."""
    import glob

    from vectorflow_spark.queries.storage import _bucketed_orders_dir, _fixture_files

    sf = "/root/testdata/sf0.01"
    files = _fixture_files(_bucketed_orders_dir(spark, sf))
    assert len(files) >= 4
    df = Q["q_parquet_indexed_lookup"](spark, sf)
    plan = physical(df)
    # the raw_scan task list is built from the surviving files only: the
    # physical plan's task-source RDD row count equals 1 (file,rg) task
    rows = df.collect()
    assert rows and all(1024 <= r.o_orderkey <= 1400 for r in rows)
    # prune effectiveness is observable from the operator itself
    from vectorflow_spark.sources.parquetmini import footer_meta_scan
    import pyspark.sql.functions as F

    stats = (
        footer_meta_scan(spark, files)
        .filter(F.col("path_in_schema") == "o_orderkey")
        .groupBy("file_name")
        .agg(F.min("stats_min_num").alias("mn"), F.max("stats_max_num").alias("mx"))
        .filter((F.col("mx") >= 1024) & (F.col("mn") <= 1400))
    )
    assert stats.count() == 1


@pytest.mark.parametrize("name", ["q_orc_rawscan", "q_snappy_roundtrip"])
def test_storage_scan_gates_are_shuffle_free(spark, sf_dir, Q, name):
    """Byte-level storage scans are per-(file,stripe|row) projections: one
    Arrow-batched python stage, no hash/range exchange beyond the task or
    input repartition."""
    plan = physical(Q[name](spark, sf_dir))
    assert plan.count("Exchange rangepartitioning") == 0, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_parquet_meta_aggregation_is_partial(spark, sf_dir, Q):
    """The footer catalog rollup must map-side combine: partial_sum/min/max
    below the exchange, final above — the property that keeps the catalog
    crawl's shuffle proportional to (files x columns), not rows."""
    plan = physical(Q["q_parquet_meta"](spark, sf_dir))
    assert "partial_" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
