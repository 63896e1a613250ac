"""Line-level dedup (operators/lines.py), global_running_sum
(operators/ranking.py), and the hashed-BoW scorer invariants.

The reference only roadmaps dedup (SURVEY.md §2.11 X4); these extend the
cleaning family with CCNet-shaped line operations. Invariants:

- within-doc keep-first dedup preserves first occurrences in order and is
  idempotent;
- corpus-level frequent-line removal strips exactly the lines above the
  document-frequency threshold, rebuilds in original order, and reports
  fully-boilerplate documents instead of dropping them;
- global_running_sum equals the single-partition window cumsum for a total
  order, under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vectorflow_spark.operators.lines import (
    dedup_lines_in_doc_expr,
    drop_frequent_lines,
    line_frequencies,
)
from vectorflow_spark.operators.ranking import global_running_sum


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_lines_in_doc_keep_first(spark):
    df = _docs(
        spark,
        [
            (1, "a\nb\na\nc\nb\na"),
            (2, "x"),
            (3, "same\nsame\nsame"),
        ],
    )
    out = {
        r["doc_id"]: r["clean"]
        for r in df.select(
            "doc_id", dedup_lines_in_doc_expr("text").alias("clean")
        ).collect()
    }
    assert out == {1: "a\nb\nc", 2: "x", 3: "same"}


def test_dedup_lines_idempotent(spark):
    df = _docs(spark, [(1, "a\nb\na\nb")])
    once = df.select(dedup_lines_in_doc_expr("text").alias("t"))
    twice = once.select(dedup_lines_in_doc_expr("t").alias("t"))
    assert once.collect() == twice.collect()


def test_drop_frequent_lines_threshold_and_order(spark):
    # 'BOILER' in 3 docs (>= threshold 3), 'semi' in 2 (< threshold, kept)
    df = _docs(
        spark,
        [
            (1, "BOILER\nalpha\nsemi"),
            (2, "beta\nBOILER\nsemi"),
            (3, "BOILER\ngamma"),
        ],
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in drop_frequent_lines(df, min_doc_count=3).collect()
    }
    assert out[1] == ("alpha\nsemi", 2, 1)
    assert out[2] == ("beta\nsemi", 2, 1)
    assert out[3] == ("gamma", 1, 1)


def test_drop_frequent_lines_reports_emptied_docs(spark):
    df = _docs(spark, [(i, "ONLY") for i in range(5)])
    out = drop_frequent_lines(df, min_doc_count=5).collect()
    assert len(out) == 5
    assert all(r["clean_text"] == "" and r["n_lines_kept"] == 0 for r in out)


def test_line_frequencies_counts_docs_and_occurrences(spark):
    df = _docs(spark, [(1, "a\na\nb"), (2, "a\nc")])
    freq = {r["line"]: (r["n_docs"], r["n_occurrences"]) for r in line_frequencies(df).collect()}
    assert freq["a"] == (2, 3)
    assert freq["b"] == (1, 1)
    assert freq["c"] == (1, 1)


def test_global_running_sum_matches_window(spark):
    df = spark.range(0, 1777).select(
        F.col("id"), ((F.col("id") * 13) % 97).alias("v")
    ).repartition(7)
    got = global_running_sum(df, [F.col("v"), F.col("id")], "v", out_col="run")
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("run", F.sum("v").over(w))
    assert (
        got.select("id", "run").orderBy("id").collect()
        == want.select("id", "run").orderBy("id").collect()
    )


def test_global_running_sum_no_global_window(spark):
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 7).alias("v"))
    plan = global_running_sum(df, [F.col("v"), F.col("id")], "v")._jdf.queryExecution().executedPlan().toString()
    # structural check: the data-sized window is keyed on _pid — the only
    # orderBy-without-partitionBy window is over the numPartitions-row
    # offsets table
    assert "partitionBy=[_pid" in plan or "_pid" in plan


def test_hashed_bow_score_exactness(spark):
    from vectorflow_spark.queries import QUERIES, _bow_weights
    import hashlib

    out = QUERIES["q_hashed_bow_score"](spark, "/root/testdata/sf0.001").collect()
    w = _bow_weights(64)
    # independent Python recomputation for a few rows
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(2000)
        .collect()
    }
    checked = 0
    for r in out:
        if r["doc_id"] not in docs or checked >= 10:
            continue
        toks = [t for t in __import__("re").split(r"\s+", docs[r["doc_id"]]) if t]
        score = sum(
            w[int(hashlib.md5(t.encode()).hexdigest()[:6], 16) % 64] for t in toks
        )
        assert r["score"] == score
        assert r["decision"] == ("keep" if score >= 0 else "drop")
        checked += 1
    assert checked == 10


def test_bucketed_write_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts join
    without ANY Exchange (and, being sort-bucketed, without a Sort): the
    write-time shuffle is the only one that ever happens."""
    from vectorflow_spark.operators.layout import bucketed_write

    a = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") % 97).alias("va"))
    b = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") % 89).alias("vb"))
    for name, df in (("bt_a", a), ("bt_b", b)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        bucketed_write(df, name, ["k"], n_buckets=8, sort_cols=["k"])
    ta, tb = spark.table("bt_a"), spark.table("bt_b")
    joined = ta.hint("shuffle_merge").join(tb, "k").select("k", "va", "vb")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() == 5000
    for name in ("bt_a", "bt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_versioned_vector_store_roundtrip_and_time_travel(spark, tmp_path):
    """X4 'vector version control': immutable v=N directories + pointer.
    Writing never mutates an old version; readers follow the pointer or
    pin a version; a re-embed (v2) is instantly revertible."""
    import os
    from vectorflow_spark.sinks.writers import (
        read_latest_version,
        read_versioned,
        versioned_write,
    )

    root = str(tmp_path / "vecs")
    os.makedirs(root)
    v1 = spark.range(0, 100).select(F.col("id").alias("vec_id"), F.lit("m1").alias("model"))
    v2 = spark.range(0, 100).select(F.col("id").alias("vec_id"), F.lit("m2").alias("model"))
    assert versioned_write(v1, root) == 1
    assert versioned_write(v2, root) == 2
    assert read_latest_version(root) == 2
    assert read_versioned(spark, root).select("model").distinct().collect()[0][0] == "m2"
    # time travel to the pre-upgrade embedding set
    assert read_versioned(spark, root, version=1).select("model").distinct().collect()[0][0] == "m1"
    # immutability: writing v3 does not touch v1/v2 files
    files_before = set(read_versioned(spark, root, version=1).inputFiles())
    versioned_write(v1, root)
    assert set(read_versioned(spark, root, version=1).inputFiles()) == files_before


def test_streaming_line_frequencies_matches_batch_and_replay_idempotent(spark, tmp_path):
    """Streamed line-frequency deltas merged over micro-batches equal the
    batch computation; replaying a batch overwrites its own delta path so
    totals do not change."""
    import json as _json

    from vectorflow_spark.operators.lines import line_frequencies
    from vectorflow_spark.streaming.pipeline import (
        read_boilerplate_lines,
        read_line_frequencies,
        streaming_line_frequencies,
    )

    inp = tmp_path / "docs"
    inp.mkdir()
    for fno in range(3):
        with open(inp / f"f{fno}.json", "w") as f:
            for i in range(20):
                did = fno * 100 + i
                f.write(
                    _json.dumps({"doc_id": did, "text": f"BOILER\nbody {did}\nBOILER"})
                    + "\n"
                )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = streaming_line_frequencies(
        stream, str(tmp_path / "lines"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        r["line"]: (r["n_docs"], r["n_occurrences"])
        for r in read_line_frequencies(spark, str(tmp_path / "lines")).collect()
    }
    batch = spark.read.schema("doc_id long, text string").json(str(inp))
    want = {
        r["line"]: (r["n_docs"], r["n_occurrences"])
        for r in line_frequencies(batch).collect()
    }
    assert got == want
    assert got["BOILER"] == (60, 120)

    # replay batch 0's delta: overwrite the same path, totals unchanged
    first = spark.read.schema("doc_id long, text string").json(str(inp / "f0.json"))
    line_frequencies(first).write.mode("overwrite").parquet(
        str(tmp_path / "lines" / "batch_id=0")
    )
    again = {
        r["line"]: (r["n_docs"], r["n_occurrences"])
        for r in read_line_frequencies(spark, str(tmp_path / "lines")).collect()
    }
    assert again == got

    boiler = [r["line"] for r in read_boilerplate_lines(spark, str(tmp_path / "lines"), 30).collect()]
    assert boiler == ["BOILER"]


def test_write_training_shards_deterministic_and_bounded(spark, tmp_path):
    """Shards hold exact rank ranges of the seeded order, one file per
    shard directory, and a second writer run reproduces the assignment."""
    import glob

    from vectorflow_spark.operators.layout import write_training_shards

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
        F.conv(F.substring(F.md5(F.concat(F.col("id"), F.lit("|shard"))), 1, 7), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    p1 = str(tmp_path / "shards1")
    m1 = write_training_shards(df, p1, 128, ["h", "doc_id"], token_col="n_tokens")
    rows = {r.shard: (r.n_rows, r.n_tokens) for r in m1.collect()}
    assert set(rows) == set(range(8))  # ceil(1000/128) = 8 shards
    assert all(rows[s][0] == 128 for s in range(7)) and rows[7][0] == 1000 - 7 * 128
    assert sum(t for _, t in rows.values()) == sum(
        i % 7 + 1 for i in range(1000)
    )
    # one data file per shard directory
    for s in range(8):
        files = glob.glob(f"{p1}/shard={s}/*.parquet")
        assert len(files) == 1, files
    # deterministic assignment: same rows land in the same shard on re-run
    p2 = str(tmp_path / "shards2")
    write_training_shards(df, p2, 128, ["h", "doc_id"], token_col="n_tokens")
    a = {r.doc_id: r.shard for r in spark.read.parquet(p1).collect()}
    b = {r.doc_id: r.shard for r in spark.read.parquet(p2).collect()}
    assert a == b
    # shard s is exactly ranks (s*128, (s+1)*128] of the (h, doc_id) order
    order = [d for _, d in sorted((r.h, r.doc_id) for r in df.collect())]
    want = {d: i // 128 for i, d in enumerate(order)}
    assert a == want


def test_compact_small_files(spark, tmp_path):
    """64 tiny files -> a handful of target-sized ones, identical rows,
    clustering restored when order_cols is given."""
    import glob

    from vectorflow_spark.operators.layout import compact_small_files

    p = str(tmp_path / "frag")
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    df.repartition(64).write.parquet(p)
    assert len(glob.glob(f"{p}/*.parquet")) == 64
    before = sorted((r.k, r.v) for r in spark.read.parquet(p).collect())
    total = sum(
        spark.read.parquet(p)
        .select(F.col("_metadata.file_size").alias("sz"), F.col("_metadata.file_path").alias("f"))
        .groupBy("f").agg(F.first("sz").alias("sz"))
        .agg(F.sum("sz").alias("t")).collect()[0].t for _ in [0]
    )
    n_out = compact_small_files(spark, p, target_bytes=(total + 3) // 4, order_cols=["k"])
    files = glob.glob(f"{p}/*.parquet")
    assert len(files) == n_out <= 6
    after_df = spark.read.parquet(p)
    after = sorted((r.k, r.v) for r in after_df.collect())
    assert after == before
    # range-compaction restored clustering: per-file k ranges are disjoint
    ranges = sorted(
        (r.mn, r.mx)
        for r in after_df.select("k", F.col("_metadata.file_path").alias("f"))
        .groupBy("f").agg(F.min("k").alias("mn"), F.max("k").alias("mx"))
        .collect()
    )
    for (_, amx), (bmn, _) in zip(ranges, ranges[1:]):
        assert amx < bmn
    # crash-safety bookkeeping: the rename-aside copy is cleaned up on
    # success, and a stale .old left by a crashed prior run is tolerated
    import os
    import shutil

    assert not os.path.exists(p + ".old")
    shutil.copytree(p, p + ".old")  # simulate debris from a crashed swap
    compact_small_files(spark, p, target_bytes=(total + 3) // 4)
    assert not os.path.exists(p + ".old")
    assert sorted((r.k, r.v) for r in spark.read.parquet(p).collect()) == before


def test_read_shards_by_budget_prunes_directories(spark, tmp_path):
    from vectorflow_spark.operators.layout import (
        read_shards_by_budget,
        write_training_shards,
    )

    p = str(tmp_path / "budget_shards")
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.lit(10).alias("n_tokens"),
        F.conv(F.substring(F.md5(F.concat(F.col("id"), F.lit("|b"))), 1, 7), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    manifest = write_training_shards(df, p, 100, ["h", "doc_id"], token_col="n_tokens")
    # 10 shards x 1000 tokens; budget 3500 -> exactly shards 0..2
    got = read_shards_by_budget(spark, p, manifest, 3500)
    assert got.count() == 300
    assert {r.shard for r in got.select("shard").distinct().collect()} == {0, 1, 2}
    # pruning reaches the scan: the shard isin filter is a PartitionFilter
    # (inputFiles() lists the pre-pruning index, so inspect the plan)
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "shard" in pf, plan
    # degenerate budget -> empty frame, same schema
    assert read_shards_by_budget(spark, p, manifest, 5).count() == 0


def test_fold_homoglyphs_kernel(spark):
    """Confusable folding: Cyrillic/Greek lookalikes -> Latin, fullwidth
    -> ASCII, zero-width chars deleted, plain ASCII untouched."""
    from vectorflow_spark.operators.textstats import (
        HOMOGLYPH_FROM,
        HOMOGLYPH_TO,
        fold_homoglyphs,
    )

    assert len(HOMOGLYPH_FROM) == len(HOMOGLYPH_TO) + 5  # 5 deletions
    cyr_apple = chr(0x0430) + "pple"  # Cyrillic а
    fw = "".join(chr(0xFF21 + i) for i in range(3))  # ＡＢＣ
    zw = "a" + chr(0x200B) + "b" + chr(0xFEFF) + "c"
    rows = spark.createDataFrame(
        [(1, cyr_apple), (2, fw), (3, zw), (4, "plain ascii")], "id long, t string"
    )
    out = {r.id: r.f for r in rows.select("id", fold_homoglyphs("t").alias("f")).collect()}
    assert out[1] == "apple"
    assert out[2] == "ABC"
    assert out[3] == "abc"
    assert out[4] == "plain ascii"


def test_c4_clean_kernel(spark):
    from vectorflow_spark.operators.lines import c4_clean

    rows = [
        (1, "One two three.\nTwo words.\nends without punct\nHas some JavaScript inside."),
        (2, "Good first sentence here. \nSmart quote ending line here”"),
        (3, "a { b\nFive words ending with period."),
        (4, "lorem ipsum\nAnother fine sentence right here."),
        (5, "Buy viagra now please.\nMore text follows after that line."),
        (6, "\n".join(f"Sentence number {i} is fine." for i in range(6))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in c4_clean(df).collect()}
    # line rules: >=3 words, terminal punct, no javascript (case-insensitive)
    assert out[1].clean_text == "One two three."
    # trailing whitespace trimmed before the punct check; ” counts as terminal
    assert out[2].clean_text == "Good first sentence here.\nSmart quote ending line here”"
    # page rules
    assert not out[3].keep_page  # curly brace
    assert not out[4].keep_page  # lorem ipsum
    assert not out[5].keep_page  # blocklist word
    assert out[6].keep_page and out[6].n_sentences == 6
    assert not out[1].keep_page  # fewer than 5 sentences post-clean


def test_global_running_sum_total_col(spark):
    """total_col (r12) must equal the exact grand total on every row and
    leave the running sum itself unchanged."""
    df = spark.range(0, 501).select("id", ((F.col("id") * 13) % 97).alias("v"))
    out = global_running_sum(
        df, [F.col("v"), F.col("id")], "v", out_col="run", total_col="tot"
    ).collect()
    want_total = sum((i * 13) % 97 for i in range(501))
    assert all(r.tot == want_total for r in out)
    assert max(r.run for r in out) == want_total
