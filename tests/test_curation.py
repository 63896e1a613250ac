"""Training-data curation operator tests — planted-fixture behavioral
checks the hash-match oracles can't express (does the repetition score
actually fire on boilerplate? does the scrubber actually remove the
email? does decontamination flag the overlapping doc and ONLY it?)."""

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.operators.dedup import decontaminate
from vectorflow_spark.operators.textstats import (
    gopher_quality_rules,
    pii_scrub,
    repetition_scores,
    token_length_histogram,
)
from vectorflow_spark.sources.readers import strip_markdown_expr


class TestRepetition:
    def test_boilerplate_scores_high_clean_scores_low(self, spark):
        clean = " ".join(f"unique word number {i} appears here" for i in range(20))
        spam = "click here to subscribe now\n" * 30 + "one real line"
        df = spark.createDataFrame([(1, clean), (2, spam)], "doc_id long, text string")
        out = {r.doc_id: r for r in repetition_scores(df).collect()}
        assert out[2].dup_line_ratio > 0.9
        assert out[2].top_line_count == 30
        assert out[1].dup_line_ratio == 0.0
        assert out[2].dup_2gram_ratio > out[1].dup_2gram_ratio


class TestGopherRules:
    def test_keep_and_reject_reasons(self, spark):
        good = " ".join(["solid sentence with normal words here today"] * 10)
        too_short = "tiny doc"
        symbols = " ".join(["@#$% ^&*! 1234 ...."] * 30)
        df = spark.createDataFrame(
            [(1, good), (2, too_short), (3, symbols)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in gopher_quality_rules(df).collect()}
        assert out[1].keep is True
        assert out[2].keep is False and out[2].n_words < 50
        assert out[3].keep is False and out[3].alpha_word_ratio < 0.8


class TestPiiScrub:
    def test_planted_pii_removed_and_counted(self, spark):
        text = (
            "contact alice.smith+work@example.co.uk or call 415 555-0199 x99; "
            "card 4111 1111 1111 1111 stays out of the corpus"
        )
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = pii_scrub(df).first()
        assert r.n_emails == 1
        assert r.n_digit_runs >= 2
        assert "<EMAIL>" in r.scrubbed_text and "<NUMBER>" in r.scrubbed_text
        assert "example.co.uk" not in r.scrubbed_text
        assert "4111" not in r.scrubbed_text

    def test_clean_text_untouched(self, spark):
        df = spark.createDataFrame([(1, "no pii here at all")], "doc_id long, text string")
        r = pii_scrub(df).first()
        assert r.n_emails == 0 and r.n_digit_runs == 0
        assert r.scrubbed_text == "no pii here at all"


class TestTokenHistogram:
    def test_power_of_two_edges_are_exact(self, spark):
        # 1 token -> bucket 1; 2,3 -> 2; 4..7 -> 3; 8 -> 4
        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([1, 2, 3, 4, 7, 8])]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.log2_bucket: r for r in token_length_histogram(df).collect()}
        assert out[1].n_docs == 1
        assert out[2].n_docs == 2
        assert out[3].n_docs == 2 and out[3].max_tokens == 7
        assert out[4].min_tokens == 8


class TestDecontamination:
    def test_flags_exact_ngram_overlap_only(self, spark):
        secret = "the quick brown fox jumps over the lazy dog tonight"  # 10 words
        bench = spark.createDataFrame([(100, secret)], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [
                (1, f"prefix words then {secret} and a suffix"),  # contains the 8-gram
                (2, "completely unrelated text about spark shuffle partitions today ok"),
                (3, "the quick brown fox jumps over nothing else here"),  # only 6-gram
            ],
            "doc_id long, text string",
        )
        flagged = {r.doc_id: r.n_shared_ngrams for r in decontaminate(corpus, bench, n=8).collect()}
        assert 1 in flagged and flagged[1] >= 1
        assert 2 not in flagged
        assert 3 not in flagged


class TestSequencePacking:
    def test_pack_ids_and_offsets(self, spark):
        """Within one group: docs of 1000/1500/600 tokens at budget 2048 ->
        cumulative starts 0/1000/2500 -> packs 0/0/1, offsets 0/1000/452."""
        rows = [(64, 1000), (128, 1500), (192, 600)]  # all % 64 == 0 -> one group
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        from vectorflow_spark.operators.batching import pack_sequences

        out = {r.doc_id: r for r in pack_sequences(df, budget_tokens=2048).collect()}
        assert (out[64].pack_id, out[64].offset_in_pack) == (0, 0)
        assert (out[128].pack_id, out[128].offset_in_pack) == (0, 1000)
        assert (out[192].pack_id, out[192].offset_in_pack) == (1, 2500 - 2048)

    def test_groups_pack_independently(self, spark):
        df = spark.createDataFrame([(0, 100), (1, 100)], "doc_id long, n_tokens long")
        from vectorflow_spark.operators.batching import pack_sequences

        out = {r.doc_id: r for r in pack_sequences(df, budget_tokens=2048).collect()}
        assert out[0].tokens_before == 0 and out[1].tokens_before == 0
        assert out[0].pack_group != out[1].pack_group


class TestInt8Quantization:
    def test_roundtrip_error_bounded_by_half_scale(self, spark):
        from vectorflow_spark.functions.vector import (
            dequantize_max_err,
            int8_scale,
            quantize_int8,
        )

        df = spark.createDataFrame(
            [(1, [0.5, -1.0, 0.25, 0.127]), (2, [0.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        out = (
            df.withColumn("scale", int8_scale("embedding"))
            .withColumn("qv", quantize_int8("embedding", F.col("scale")))
            .withColumn("err", dequantize_max_err("embedding", F.col("qv"), F.col("scale")))
            .collect()
        )
        r = {row.vec_id: row for row in out}
        assert r[1].qv[1] == -127  # max-magnitude element hits the rail
        assert all(-127 <= v <= 127 for v in r[1].qv)
        assert r[1].err <= r[1].scale / 2 + 1e-12  # half-step quantization bound
        assert r[2].scale == 0.0 and r[2].qv == [0, 0, 0, 0]


class TestPackingRandomInvariants:
    def test_seeded_corpus_invariants(self, spark):
        """Seeded random token counts, one Spark job: within every group
        the running total is exactly the sum of prior docs in id order,
        offsets stay under the budget, and pack ids are the floor
        quotient — the packing contract a trainer depends on."""
        import numpy as np

        from vectorflow_spark.operators.batching import pack_sequences

        rng = np.random.default_rng(7)
        rows = [(int(i), int(rng.integers(0, 5000))) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = pack_sequences(df, budget_tokens=1024, n_groups=16).collect()
        assert len(out) == 500
        want = dict(rows)
        by_group: dict[int, list] = {}
        for r in out:
            assert r.pack_group == r.doc_id % 16
            by_group.setdefault(r.pack_group, []).append(r)
        for rs in by_group.values():
            running = 0
            for r in sorted(rs, key=lambda r: r.doc_id):
                assert r.tokens_before == running
                assert r.pack_id == running // 1024
                assert r.offset_in_pack == running % 1024 < 1024
                running += want[r.doc_id]


class TestQuantizeRandomInvariants:
    def test_seeded_vectors_bounds(self, spark):
        import numpy as np

        from vectorflow_spark.functions.vector import (
            dequantize_max_err,
            int8_scale,
            quantize_int8,
        )

        rng = np.random.default_rng(11)
        rows = [(int(i), [float(x) for x in rng.uniform(-2, 2, 16)]) for i in range(200)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = (
            df.withColumn("scale", int8_scale("embedding"))
            .withColumn("qv", quantize_int8("embedding", F.col("scale")))
            .withColumn("err", dequantize_max_err("embedding", F.col("qv"), F.col("scale")))
            .collect()
        )
        for r in out:
            assert all(-127 <= v <= 127 for v in r.qv)
            assert r.err <= r.scale / 2 + 1e-9
            assert abs(r.scale * 127 - max(abs(v) for v in r.embedding)) < 1e-6


class TestMarkdownExtract:
    def test_strips_syntax_keeps_prose(self, spark):
        md = (
            "# Title\n\nSome **bold** and _em_ text with `inline code` and "
            "a [link](http://example.com) plus\n```\nfenced code block\n```\n"
            "and an image ![alt](img.png) end"
        )
        df = spark.createDataFrame([(1, md)], "doc_id long, text string")
        out = df.select(strip_markdown_expr(F.col("text")).alias("t")).first().t
        assert "Title" in out and "bold" in out and "em" in out and "link" in out
        assert "```" not in out and "fenced code block" not in out
        assert "http://example.com" not in out
        assert "![" not in out and "#" not in out


class TestUrlCanonicalization:
    CASES = [
        ("https://WWW.Example.COM/Path/Sub/?utm_source=x&b=2&a=1#frag",
         "https://example.com/Path/Sub?a=1&b=2", "example.com"),
        ("http://example.com", "http://example.com/", "example.com"),
        ("https://example.com/", "https://example.com/", "example.com"),
        ("https://sub.example.com/A/B?fbclid=123", "https://sub.example.com/A/B", "sub.example.com"),
        ("https://example.com/p?gclid=9&z=1&a=2&utm_campaign=c",
         "https://example.com/p?a=2&z=1", "example.com"),
        ("https://example.com/p/", "https://example.com/p", "example.com"),
        ("ftp://Files.example.org/data.bin", "ftp://files.example.org/data.bin", "files.example.org"),
        ("https://example.com/?utm_x=1", "https://example.com/", "example.com"),
    ]

    def test_rules(self, spark):
        from vectorflow_spark.operators.urls import canonical_url_expr, url_host_expr

        df = spark.createDataFrame([(u,) for u, _, _ in self.CASES], "url string")
        out = {
            r.url: (r.c, r.h)
            for r in df.select(
                "url",
                canonical_url_expr(F.col("url")).alias("c"),
                url_host_expr(F.col("url")).alias("h"),
            ).collect()
        }
        for u, want_c, want_h in self.CASES:
            assert out[u] == (want_c, want_h), u

    def test_variants_collapse_to_one_key(self, spark):
        """The dedup property: www/case/tracking/fragment/slash variants
        of one page all canonicalize to a single key."""
        from vectorflow_spark.operators.urls import canonical_url_expr

        variants = [
            "https://www.example.com/page",
            "https://WWW.EXAMPLE.COM/page",
            "https://example.com/page/",
            "https://example.com/page?utm_source=tw",
            "https://example.com/page#section-2",
            "https://example.com/page?fbclid=abc#x",
        ]
        df = spark.createDataFrame([(u,) for u in variants], "url string")
        keys = {r.c for r in df.select(canonical_url_expr(F.col("url")).alias("c")).collect()}
        assert keys == {"https://example.com/page"}
