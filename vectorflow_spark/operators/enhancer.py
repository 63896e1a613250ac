"""Chunk-enhancement operators (SURVEY.md §2.10, L1-L6) — the reference's
client-side LLM pre-upload stage re-expressed as Spark stages.

Reference semantics (client/src/vectorflow_client/chunk_enhancer.py):
  L1 enhance_chunks    orchestrate L2-L5 over all chunks; append the document
                       summary as one extra chunk (:91-102)
  L2 questions         one completion call per pipeline -> {questions: [...]}
  L3 document context  per-document completion -> {entities, keywords,
                       sections, themes, labels, other}
  L4 enhance_chunk     per-chunk completion picks <=5 relevant context items;
                       result = chunk + ", " + joined items (:104-151)
  L5 summarize         per-document 5-8 sentence summary (:289-338)
  L6 token-budget fit  truncate document to remaining_tokens*3 chars (:265-287)

The LLM itself is an injectable ``complete(prompt) -> str`` callable — the
external-service boundary, exactly like the embedding backends. The default
is a deterministic extractive fake (keyword scoring), so the whole stage is
runnable and testable offline; swapping in a real provider changes one
argument, not the plan. All per-document calls run inside one
``mapInPandas`` pass; the summary union is `unionByName`.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_CHAR_RATIO = 3  # the reference's 1:3 token:char heuristic (:265-268)

Completion = Callable[[str], str]


def deterministic_completion(prompt: str) -> str:
    """Extractive stand-in for a chat model: returns the most frequent
    non-stopword terms of the prompt payload, comma-joined. Deterministic,
    offline, and shaped like the JSON-ish fragments the reference's
    function-calling prompts expect."""
    words = re.findall(r"[a-z]{4,}", prompt.lower())
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    top = sorted(counts, key=lambda w: (-counts[w], w))[:5]
    return ", ".join(top)


def fit_to_token_budget(text: str, budget_tokens: int) -> str:
    """L6: the reference's char-budget truncation."""
    return text[: budget_tokens * TOKEN_CHAR_RATIO]


def generate_questions(usecase: str, complete: Completion = deterministic_completion, n: int = 3) -> list[str]:
    """L2: driver-side, once per pipeline (not per row — the reference calls
    it once per upload)."""
    seed = complete(f"Generate use-case questions for: {usecase}")
    return [f"What about {t.strip()}?" for t in seed.split(",")[:n] if t.strip()]


def document_context(
    docs: DataFrame,
    complete: Completion = deterministic_completion,
    text_col: str = "text",
    budget_tokens: int = 1000,
) -> DataFrame:
    """L3: per-document context extraction -> ``context: array<string>``
    column. One mapInPandas pass; the completion callable is the only
    external boundary."""
    fields = [f.name for f in docs.schema.fields]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema.fields)
    schema += ", context array<string>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ctx = [
                [t.strip() for t in complete(
                    "Extract entities/keywords/themes from: "
                    + fit_to_token_budget(t or "", budget_tokens)
                ).split(",") if t.strip()]
                for t in pdf[text_col]
            ]
            yield pdf[fields].assign(context=pd.Series(ctx, index=pdf.index, dtype=object))

    return docs.mapInPandas(run, schema=schema)


def summarize_documents(
    docs: DataFrame,
    complete: Completion = deterministic_completion,
    doc_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 1000,
) -> DataFrame:
    """L5: per-document summary -> (doc_id, summary)."""
    out = document_context(
        docs.select(doc_col, text_col), complete, text_col, budget_tokens
    )
    return out.select(
        doc_col,
        F.concat_ws(". ", F.col("context")).alias("summary"),
    )


def enhance_chunks(
    chunks: DataFrame,
    complete: Completion = deterministic_completion,
    doc_col: str = "doc_id",
    text_col: str = "text",
    max_items: int = 5,
    documents: DataFrame | None = None,
) -> DataFrame:
    """L1+L4: attach per-document context (broadcast dimension join — the
    context table is one short row per document), enhance each chunk with
    ``text + ", " + joined items`` (the reference's literal concat,
    chunk_enhancer.py:104-151), and append one summary row per document
    (chunk_tag='summary') via unionByName.

    ``documents``: the (doc_col, text) source the chunks came from. The
    caller almost always still has it — pass it, and the context dimension
    is built straight from it with NO shuffle of chunk text. Only without
    it does the operator fall back to REASSEMBLING document text by
    ``groupBy(doc).collect_list(chunk_text)`` — a shuffle of the fattest
    column in the pipeline, kept only as the orphan-chunks escape hatch.

    Shuffle profile (documents supplied): context/summary dimension is a
    mapInPandas projection over documents, then broadcasts — chunk rows
    never shuffle."""
    if documents is not None:
        docs = documents.select(F.col(doc_col), F.col(text_col).alias("_doc_text"))
    else:
        docs = chunks.select(doc_col, text_col).groupBy(doc_col).agg(
            F.concat_ws("\n", F.collect_list(text_col)).alias("_doc_text")
        )
    ctx = document_context(docs.withColumnRenamed("_doc_text", "text"), complete)
    dim = ctx.select(
        doc_col,
        F.slice("context", 1, max_items).alias("_items"),
        F.concat_ws(". ", F.col("context")).alias("_summary"),
    )
    enhanced = (
        chunks.join(F.broadcast(dim), doc_col, "left")
        .withColumn(
            "enhanced_text",
            F.when(
                F.size("_items") > 0,
                F.concat(F.col(text_col), F.lit(", "), F.array_join("_items", ", ")),
            ).otherwise(F.col(text_col)),
        )
        .drop("_items", "_summary")
    )
    summaries = dim.select(
        doc_col,
        F.col("_summary").alias(text_col),
        F.col("_summary").alias("enhanced_text"),
    ).withColumn("chunk_tag", F.lit("summary"))
    return enhanced.unionByName(summaries, allowMissingColumns=True)
