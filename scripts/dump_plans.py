"""Dump `.explain("formatted")` for the headline queries to PLANS.md.

An auditable snapshot of the physical plans behind the scale claims in
README.md (pushdown at the scan, shuffle-free projections, broadcast joins,
TakeOrderedAndProject top-k, single-stage e2e pipeline). Regenerate with:

    python scripts/dump_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

HEADLINERS = [
    ("q_filter_nonempty", "pushed filters + pruned ReadSchema at the parquet scan"),
    ("q_minhash_signatures", "shuffle-free array-native minhash (one input split, no hash exchange)"),
    ("q_sink_payload", "broadcast hash join of the document dimension"),
    ("q_topk_cosine", "brute-force top-k as TakeOrderedAndProject (no global sort)"),
    ("q_knn_batch", "broadcast nested-loop kNN + per-query window rank"),
    ("q_ngram_jaccard_pairs", "inverted-index self-join on 8-byte hashed shingles"),
    ("q_asof_join", "as-of join as union + single-key shuffle + last(ignorenulls) window"),
    ("q_revenue_topn", "3-table join with broadcast dimension + windowed top-n"),
    ("q_events_rollup", "ROLLUP grouping sets in one hash aggregate (expand, no rescan)"),
    ("q_regional_revenue", "TPC-H Q5 shape: all four dims broadcast, one fact shuffle"),
    ("q_big_orders", "Q18 shape: HAVING keys broadcast into the left-semi join"),
    ("q_price_band_join", "non-equi band join as broadcast nested loop (no fact shuffle)"),
    ("q_tfidf_topterms", "TF-IDF: partial aggs + WindowGroupLimit top-k below the exchange"),
    ("q_kmeans_step", "k-means update: literal-folded assign + one (cluster,dim) shuffle"),
    ("q_salted_join", "salted skew join: exploded dim replicas, (key,salt) shuffle"),
    ("q_brand_premium", "correlated scalar subquery decorrelated to aggregate + join"),
    ("q_minhash_band_pairs", "LSH pairs: one (band,bucket) exchange reused by the cap window + posting agg"),
    ("q_decontaminate", "8-gram decontamination: benchmark side broadcast, corpus never joins via exchange"),
    ("q_validate_webhook", "webhook validation: mapInPandas batch POSTs, no shuffle"),
    ("q_token_histogram", "integer-space log2 histogram: one map-side-combinable aggregation"),
    ("q_equidepth_bins", "global ranking via range-sort + partition offsets (no single-partition window)"),
    ("q_waiting_suppliers", "Q21 shape: one fact pass — stacked (orderkey,suppkey)/orderkey aggs, no join-back"),
    ("q_topk_per_group", "per-group top-k with WindowGroupLimit pruning below the exchange"),
    ("q_fuzzy_name_pairs", "edit distance on distinct (block,name) pairs, salted self-join, expand-back joins"),
    ("q_semantic_dedup", "SemDeDup: literal-folded cluster assign + cluster-confined pair join + anti join"),
    ("q_pagerank3", "quantized PageRank: per-iteration src join + dst sum, integral DIV only"),
    ("q_rolling_dau", "rolling distinct actives via explode-to-target-days, two uniform-key shuffles"),
    ("q_kmv_distinct", "KMV sketch: Arrow-side bottom-k cap BELOW the single merge exchange"),
    ("q_kmv_overlap", "pairwise overlap from checkpointed sketches: broadcast pair join, zero exchange"),
    ("q_bigram_perplexity", "corpus-fit bigram LM: map-side-combined count tables, broadcast N, pinned-order fold"),
    ("q_merge_upsert", "MERGE INTO: one full-outer join on the key, all four row fates as filters over it"),
    ("q_remove_dup_spans", "substring dedup removal: zero-shuffle span hashing, keep-first window on the span-hash exchange, broadcast-back cut"),
    ("q_rrf_fusion", "rank fusion: TakeOrderedAndProject per list, windows over 50-row frames, k-sized groupBy"),
    ("q_url_canonical", "crawl-manifest canonicalization: single whole-stage-codegen projection, no UDF"),
    ("q_skew_autojoin", "auto-skew join: profiled heavy keys broadcast, salted heavy path unioned with untouched light path"),
    ("q_warc_scan", "vf_warc DataSource scan: one partition per segment file, records streamed (no whole-file rows)"),
    ("q_warc_scan_mount", "vf_warc object-store scan: s3://-style paths through the injectable mount/fsspec opener, same streamed-record plan"),
    ("q_video_neardup_pairs", "video near-dup: frame explode + dHash + Hamming bander + aligned-frame rollup"),
    ("q_maxsim_rerank", "late-interaction MaxSim: broadcast query batch, one HOF fold per pair, WindowGroupLimit top-k"),
    ("q_curation_funnel", "staged curation accounting: five 1-row partial aggs over a shrinking lineage"),
    ("q_mp3_meta", "MP3 header classification: one mapInPandas pass, no shuffle, no sample decode"),
    ("q_ogg_meta", "Ogg/Opus/Vorbis header classification: CRC-verified page walk, one mapInPandas pass, no sample decode"),
    ("q_jpeg_arith_roundtrip", "arithmetic-coded JPEG (SOF9) QM-coder roundtrip: one mapInPandas projection, no shuffle"),
    ("q_wat_outlinks", "WAT sidecar graph: engine-side JSON envelope, warc_type pushdown scan, one aggregate shuffle"),
    ("q_webdataset_scan", "WebDataset cycle: tar-shard sink, vf_tar scan, zero-shuffle sample assembly"),
    ("q_wds_caption_leg", "selective-leg WebDataset read: ext pushdown + indexed seek partitions, images never materialize"),
    ("q_cdx_lookup", "wayback-style CDX lookup: URL pushdown plans one record-range partition per hit"),
    ("q_docs_bulk_fetch", "vf_docs bulk-URL fetch: manifest partitions, Arrow batches, executor-side GETs"),
    ("q_split_leakage_audit", "split-leakage audit: banded minhash pairs, boundary filter + rollup on the tiny pair set"),
    ("q_jpeg_optimize_recompress", "two-pass optimized-Huffman recompression: one mapInPandas projection, no shuffle"),
    ("q_webp_roundtrip", "WebP VP8L roundtrip: one mapInPandas projection, no shuffle"),
    ("q_tiff_roundtrip", "baseline TIFF roundtrip: one mapInPandas projection, no shuffle"),
    ("q_flac_roundtrip", "FLAC encode->decode roundtrip (rice/LPC + MD5 self-verify): one mapInPandas projection, no shuffle"),
    ("q_lowdepth_roundtrip", "sub-8-bit raster roundtrips (1/4-bit TIFF + palette BMP): one mapInPandas projection, no shuffle"),
    ("q_image_neardup_pairs", "perceptual image near-dup (r7 ground-truth shape): one Arrow decode pass + two band-key exchanges, no join"),
    ("q_audio_fingerprint_dedup", "audio fingerprint dedup across WAV/G.711/FLAC (r7 ground-truth shape): same two-exchange Hamming-bander plan"),
    ("q_albumart_dedup", "cross-modal album-art dedup: equality join on the 63-bit pixel dHash — no pairwise scan, broadcast/bucket-ready at scale"),
    ("q_cdx_prefix_scan", "domain-prefix wayback scan (r9 cached-fixture shape): consolidated _url_index prefix range + residual re-apply, flat across four decades"),
    ("q_smart_metadata", "smart metadata extraction: ONE whole-stage-codegen regex projection, zero Python, zero shuffle"),
    ("q_mmr_diversify", "MMR diverse selection: candidate TakeOrderedAndProject + one bounded FlatMapGroupsInPandas group"),
    ("q_aiff_au_roundtrip", "AIFF/AU container roundtrip: one mapInPandas projection over a pruned doc_id scan, no shuffle"),
    ("q_epub_roundtrip", "EPUB spine-walk roundtrip: one mapInPandas projection, no shuffle"),
    ("q_rtf_roundtrip", "RTF control-word roundtrip: one mapInPandas projection, no shuffle"),
    ("q_parquet_meta", "footer catalog crawl: one mapInPandas task per file (2 ranged reads), map-side-combinable stat rollup"),
    ("q_parquet_rawscan", "byte-level raw scan: (file,row_group) task list, Arrow-batched decode, no shuffle past the task repartition"),
    ("q_parquet_indexed_lookup", "index-driven lookup: stats harvest -> driver-bounded file prune -> targeted decode + residual filter"),
    ("q_c4_filters", "C4 cleaning: ONE whole-stage-codegen lambda-array projection, zero Python, zero shuffle"),
    ("q_label_prop", "label propagation: per-round dst join + two combinable aggs over a checkpointed edge set"),
    ("q_orc_rawscan", "byte-level ORC scan: (file,stripe) task list, Arrow-batched decode, no shuffle past the task repartition"),
    ("q_orc_write_roundtrip", "our ORC bytes through Spark's reader: one distributed serialize + one native scan"),
]


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    from vectorflow_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("plans", cpus=4)
    sf_dir = "/root/testdata/sf0.001"
    Q = entry.queries()

    out = [
        "# Physical plans of the headline queries",
        "",
        "Generated by `scripts/dump_plans.py` (sf0.001, local[4]); the shapes are",
        "scale-invariant — partition counts change with the cluster, operators do not.",
        "Assertions over these shapes live in `tests/test_plans.py`.",
        "",
    ]
    for name, why in HEADLINERS:
        df = Q[name](spark, sf_dir)
        plan = _formatted(df)
        out.append(f"## {name}\n\n*{why}*\n\n```\n{plan.strip()}\n```\n")

    df = entry.entry(spark)
    plan = _formatted(df)
    out.append(
        "## entry() — end-to-end pipeline\n\n*scan -> filters -> split -> chunk ->"
        " embed -> sink projection fused into one stage after the explicit CPU"
        " repartition*\n\n```\n" + plan.strip() + "\n```\n"
    )

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
