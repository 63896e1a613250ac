"""Chunker tests — ports of the reference's unit suite
(reference src/worker/tests/test_worker.py:221-346) plus Spark-side checks
that the built-in-expression chunkers agree with the Python forms.

Char-based tests keep the reference's exact expected counts. Token-based
tests are asserted in tokenizer-independent invariant form (window k covers
tokens [k*stride, k*stride+size)) because tiktoken is not installed here —
see vectorflow_spark/functions/tokenizer.py.
"""

import math

import pytest

from vectorflow_spark.config import ChunkStrategy, PipelineConfig
from vectorflow_spark.functions import tokenizer
from vectorflow_spark.operators.chunkers import (
    py_chunk_exact_chars,
    py_chunk_exact_tokens,
    py_chunk_paragraph_chars,
    py_chunk_paragraph_tokens,
    py_chunk_sentence_chars,
    py_chunk_sentence_tokens,
)

PARA = "This is an example paragraph. With a second example sentence.\n\n"
SENTENCES = (
    "I am a sentence. I am a sentence but with a question? "
    "I am still a sentence! Can I consider myself a sentence..."
)


class TestExactTokens:
    def test_window_coverage(self):
        # reference test_chunk_data_exact, invariant form
        text = "testtext" * 192
        tokens = tokenizer.encode(text)
        chunks = py_chunk_exact_tokens(text, 256, 128)
        assert len(chunks) == max(1, math.ceil(len(tokens) / 128))
        for k, (chunk_text, offset, tag) in enumerate(chunks):
            assert offset == k * 128
            assert tag == "exact"
            assert chunk_text == tokenizer.decode(tokens[k * 128 : k * 128 + 256])

    def test_spaced_words(self):
        # with the fallback tokenizer each ' word' is one token
        text = "word" + " word" * 383  # 384 tokens
        tokens = tokenizer.encode(text)
        if not tokenizer.HAVE_TIKTOKEN:
            assert len(tokens) == 384
        chunks = py_chunk_exact_tokens(text, 256, 128)
        assert len(chunks) == math.ceil(len(tokens) / 128)


class TestExactChars:
    def test_reference_counts(self):
        # reference test_chunk_data_exact_by_characters: 384 chars -> 3
        text = "thisistest" * 38 + "test"
        assert len(text) == 384
        chunks = py_chunk_exact_chars(text, 256, 128)
        assert len(chunks) == 3
        assert len(chunks[2][0]) == 128

    def test_overlap_prefix(self):
        text = "abcdefghij" * 10
        chunks = py_chunk_exact_chars(text, 40, 20)
        for k in range(1, len(chunks)):
            # each chunk starts exactly at stride offset
            assert chunks[k][1] == k * 20
            assert text[k * 20 : k * 20 + 40] == chunks[k][0]

    def test_empty(self):
        assert py_chunk_exact_chars("", 10, 0) == []


class TestParagraphTokens:
    def test_four_paragraphs(self):
        # reference test_chunk_paragraph: merged runs under bound stay whole
        text = PARA * 3 + PARA.rstrip("\n")
        chunks = py_chunk_paragraph_tokens(text, 16, 0)
        n_tok = len(tokenizer.encode(PARA.rstrip("\n")))
        if n_tok >= int(0.75 * 16) and n_tok <= 16:
            assert len(chunks) == 4

    def test_bound(self):
        # reference test_chunk_paragraph_bound: both paragraphs merge into one
        text = "This is \n\n a very early paragraph."
        chunks = py_chunk_paragraph_tokens(text, 10, 0, bound=0.5)
        if not tokenizer.HAVE_TIKTOKEN:
            assert len(chunks) == 1


class TestParagraphChars:
    def test_reference_counts(self):
        text = "This is an example paragraph.\n\n" * 4
        chunks = py_chunk_paragraph_chars(text, 35, 0)
        assert len(chunks) == 4

    def test_overlap(self):
        text = "This is an example paragraph.\n\n" * 2
        chunks = py_chunk_paragraph_chars(text, 35, 15)
        assert chunks[0][0][:15] == "This is an exam"
        # second chunk starts at the cut (31), includes overlap past its end
        assert chunks[1][1] == 31

    def test_bound(self):
        text = "This is \n\n a very early paragraph."
        chunks = py_chunk_paragraph_chars(text, 35, 0, bound=0.75)
        assert len(chunks) == 1

    def test_cut_at_paragraph(self):
        text = "This is an example paragraph.\n\n" * 4
        chunks = py_chunk_paragraph_chars(text, 35, 0)
        # every chunk ends exactly after a '\n\n' delimiter
        for chunk_text, offset, _ in chunks:
            assert chunk_text.endswith("\n\n")


class TestSentence:
    def test_four_sentences(self):
        chunks = py_chunk_sentence_tokens(SENTENCES, 50, 0)
        assert len(chunks) == 4
        assert [c[2] for c in chunks] == ["sentence"] * 4

    def test_too_big_chars(self):
        # reference test_chunk_sentence_by_characters_too_big -> exactly 6
        text = SENTENCES + " Blahblah Blahblah Blahblah Blahblah Blahblah Blahblah ."
        chunks = py_chunk_sentence_chars(text, 50, 0)
        assert len(chunks) == 6

    def test_sentence_ids_use_index(self):
        chunks = py_chunk_sentence_chars(SENTENCES, 200, 100)
        offsets = [c[1] for c in chunks]
        assert offsets == list(range(len(chunks)))


class TestMinibatching:
    def test_create_openai_batches(self):
        # reference test_create_openai_batches: 4*2048 items -> 4 batches
        items = ["test"] * (2048 * 4)
        slices = [items[i : i + 2048] for i in range(0, len(items), 2048)]
        assert len(slices) == 4


@pytest.mark.usefixtures("spark")
class TestSparkChunkers:
    """Built-in-expression chunkers must agree with the Python forms."""

    DOCS = [
        (1, "Hello world. This is a test! Short."),
        (2, "a" * 550),
        (3, ""),
        (4, "line one\nline two\n\npara two. sentence two? end…  tail"),
        (5, "Exactly.  Two  spaces. " + "x" * 300),
    ]

    def _spark_chunks(self, spark, strategy, size, overlap):
        from vectorflow_spark.operators.chunkers import chunk

        cfg = PipelineConfig(chunk_strategy=strategy, chunk_size=size, chunk_overlap=overlap)
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        rows = chunk(df, cfg, with_ids=False).collect()
        return sorted((r.doc_id, r.chunk_offset, r.chunk_tag, r.text) for r in rows)

    def _py_chunks(self, fn, size, overlap):
        out = []
        for doc_id, text in self.DOCS:
            for chunk_text, offset, tag in fn(text, size, overlap):
                out.append((doc_id, offset, tag, chunk_text))
        return sorted(out)

    def test_exact_chars_expr_matches_python(self, spark):
        assert self._spark_chunks(spark, ChunkStrategy.EXACT_BY_CHARACTERS, 200, 100) == self._py_chunks(
            py_chunk_exact_chars, 200, 100
        )

    def test_sentence_chars_expr_matches_python(self, spark):
        assert self._spark_chunks(spark, ChunkStrategy.SENTENCE_BY_CHARACTERS, 40, 20) == self._py_chunks(
            py_chunk_sentence_chars, 40, 20
        )

    def test_pandas_udf_strategies(self, spark):
        for strategy, fn in [
            (ChunkStrategy.EXACT, py_chunk_exact_tokens),
            (ChunkStrategy.PARAGRAPH, py_chunk_paragraph_tokens),
            (ChunkStrategy.PARAGRAPH_BY_CHARACTERS, py_chunk_paragraph_chars),
            (ChunkStrategy.SENTENCE, py_chunk_sentence_tokens),
        ]:
            assert self._spark_chunks(spark, strategy, 40, 10) == self._py_chunks(fn, 40, 10), strategy

    def test_custom_chunker(self, spark):
        from vectorflow_spark.operators.chunkers import chunk

        def my_chunker(text):
            return [{"text": p, "kind": "para"} for p in text.split("\n\n") if p]

        cfg = PipelineConfig(chunk_strategy=ChunkStrategy.CUSTOM)
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        rows = chunk(df, cfg, custom_chunker=my_chunker).collect()
        assert all(r.chunk_tag == "custom" for r in rows)
        assert all(r.metadata["kind"] == "para" for r in rows)
        assert all(r.chunk_id for r in rows)


class TestSmartChunker:
    def test_splits_at_similarity_drops_and_size_cap(self, spark):
        """With the deterministic embedder, identical sentences are
        maximally similar and distinct ones are uncorrelated, so chunks
        break exactly at repetition boundaries; the char cap forces a cut
        even inside a similar run."""
        from vectorflow_spark.operators.chunkers import py_chunk_smart, smart_chunk
        from vectorflow_spark.embed.backends import deterministic_embedding

        text = "aaa. aaa. aaa. bbb. bbb. zzzz zzz zz z. aaa."
        fn = lambda s: deterministic_embedding(s, 16)  # noqa: E731
        got = py_chunk_smart(text, 200, fn, threshold=0.99)
        assert [(t, o) for t, o, _ in got] == [
            ("aaa. aaa. aaa.", 0),
            ("bbb. bbb.", 3),
            ("zzzz zzz zz z.", 5),
            ("aaa.", 6),
        ]
        # size cap: the run of identical sentences still cuts at max_chars
        capped = py_chunk_smart("x. " * 9 + "x.", 8, fn, threshold=0.99)
        assert all(len(t) <= 8 for t, _, _ in capped)
        assert len(capped) == 4  # 10 sentences, 3 per 8-char chunk + remainder

        docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        rows = smart_chunk(docs, threshold=0.99).orderBy("chunk_seq").collect()
        assert [(r.text, r.chunk_offset, r.chunk_tag) for r in rows] == [
            (t, o, "smart") for t, o, _ in got
        ]
        assert rows[0].chunk_seq == 0 and len({r.chunk_id for r in rows}) == len(rows)
