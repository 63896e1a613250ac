"""Text analysis operators for training-data pipelines.

Everything here is a projection — single pass, no shuffle, codegen'd
built-ins — because at 100 TB a per-document score must cost one scan:

  token_count_*     whitespace tokens + a BPE-ish regex token estimate
  quality features  length / punctuation / stopword / digit / upper ratios
                    and a fixed-weight composite score
  language id       stopword-hit voting over fixed per-language word lists
  fingerprint       whitespace-normalized md5 (exact-dup key robust to
                    formatting); rolling-hash winnowing lives in dedup.py's
                    shingle machinery

Ratios divide exact integers in double, so scores are bit-reproducible
across engines (the DuckDB oracles mirror each expression 1:1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed stopword lists; enough signal for language voting on synthetic
# corpora and cheap to evaluate as a single regexp per language.
STOPWORDS = {
    "en": ["the", "and", "is", "of", "to", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "una"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "une"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "ein"],
}

# GPT-2-flavored pre-tokenizer shape (see functions/tokenizer.py)
BPE_ISH_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+"


def _word_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count_ws(text_col: str) -> Column:
    """Whitespace token count (the reference's implicit 'line of words'
    unit)."""
    return F.size(F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')")).cast("bigint")


def token_count_bpe_ish(text_col: str) -> Column:
    """Regex token-count estimate matching the fallback tokenizer exactly."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_TOKEN_RE), F.lit(0))).cast(
        "bigint"
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns. Every feature is one regexp or length
    expression over the row — a single projection."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    words = token_count_ws(text_col)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0))).cast("bigint")
    n_digits = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), F.lit(0))).cast("bigint")
    n_upper = F.size(F.regexp_extract_all(t, F.lit(r"[A-Z]"), F.lit(0))).cast("bigint")
    n_stop_en = F.size(
        F.regexp_extract_all(F.lower(t), F.lit(_word_pattern(STOPWORDS["en"])), F.lit(0))
    ).cast("bigint")
    safe = F.when(n_chars > 0, n_chars)
    # one withColumns call, not a chain: every withColumn re-analyzes the
    # whole (regex-heavy) plan eagerly, so the 8-step chain paid 8 analyzer
    # passes of driver time per construction (~2x measured). No column
    # depends on another, so a single projection is identical.
    return df.withColumns(
        {
            "n_chars_t": F.length(t).cast("bigint"),
            "n_words": words,
            "n_punct": n_punct,
            "punct_ratio": n_punct / safe,
            "digit_ratio": n_digits / safe,
            "upper_ratio": n_upper / safe,
            "mean_word_len": F.when(words > 0, n_chars / words.cast("double")),
            "stopword_ratio": F.when(words > 0, n_stop_en / words.cast("double")),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixed-weight composite in [0,1]-ish: rewards stopword density and
    moderate word length; penalizes punctuation/digit noise. Weights are
    arbitrary but frozen — the operator contract is determinism, not
    linguistics."""
    feats = quality_features(df, text_col)
    score = (
        F.lit(0.4) * F.coalesce(F.col("stopword_ratio"), F.lit(0.0))
        + F.lit(0.3) * F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10), 1.0).otherwise(0.0)
        - F.lit(0.2) * F.coalesce(F.col("punct_ratio"), F.lit(0.0))
        - F.lit(0.1) * F.coalesce(F.col("digit_ratio"), F.lit(0.0))
    )
    return feats.withColumn("quality_score", F.round(score, 9))


def language_scores(text_col: str) -> dict[str, Column]:
    lowered = F.lower(F.col(text_col))
    return {
        lang: F.size(F.regexp_extract_all(lowered, F.lit(_word_pattern(words)), F.lit(0))).cast(
            "bigint"
        )
        for lang, words in STOPWORDS.items()
    }


def predict_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax stopword-vote language id with deterministic tiebreak
    (alphabetical language order; 'und' = undetermined when all votes 0)."""
    scores = language_scores(text_col)
    langs = sorted(scores)  # de, en, es, fr — tiebreak order
    best = F.lit("und")
    best_score = F.lit(0).cast("bigint")
    for lang in langs:
        s = scores[lang]
        improved = s > best_score
        best = F.when(improved, F.lit(lang)).otherwise(best)
        best_score = F.when(improved, s).otherwise(best_score)
    out = df
    for lang in langs:
        out = out.withColumn(f"votes_{lang}", scores[lang])
    return out.withColumn("pred_lang", best)


def fingerprint(text_col: str) -> Column:
    """Whitespace-normalization fingerprint: md5 of lowercased text with
    runs of whitespace collapsed and trimmed — catches formatting-only
    duplicates that exact md5 misses."""
    return F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")))


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF (sklearn-style
    ``ln((1+N)/(1+df)) + 1``). Plan at scale: one explode projection, a
    map-side-combinable tf aggregation shuffled on (doc_id, term), a df
    aggregation shuffled on term, a shuffle join back on term (vocabulary is
    large — never broadcast it), and a per-doc window for the top-k. N rides
    along as a broadcast 1-row cross join, not a driver-side collect.
    Scores are rounded to 9 decimals before ranking so the rank is identical
    across engines despite ulp-level ln() differences."""
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')")).alias("term"),
    )
    # tf is read twice (df agg + score join): checkpoint the inverted-
    # index-sized table so the raw corpus is tokenized exactly once
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint()
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((1 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1),
                9,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


def repetition_scores(docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Repetition signals (Gopher-style rep. removal, Rae et al. 2021
    §A1.1 — public paper): per document,

      dup_line_ratio   1 - distinct_lines / lines (0 = no repeated lines)
      top_line_count   occurrences of the most frequent non-empty line
      dup_2gram_ratio  1 - distinct_word_2grams / word_2grams

    Boilerplate (nav bars, cookie banners, SEO spam) shows up as high
    dup_line_ratio long before near-dup detection fires. One projection,
    shuffle-free: lines/grams live in per-row arrays, counts come from
    array folds, nothing explodes."""
    lines = F.expr(f"filter(transform(split({text_col}, '\\n'), l -> trim(l)), l -> l != '')")
    toks = F.expr(f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')")
    base = docs.select(doc_col, lines.alias("_ls"), toks.alias("_ts"))
    n_lines = F.size("_ls").cast("bigint")
    n_dist_lines = F.size(F.array_distinct("_ls")).cast("bigint")
    # most frequent line's count: for each distinct line, fold a count over
    # the full array; max of those. O(distinct * total) per row — fine for
    # documents, and still one projection.
    top_line = F.expr(
        "CASE WHEN size(_ls) = 0 THEN CAST(0 AS BIGINT) ELSE "
        "array_max(transform(array_distinct(_ls), d -> "
        "size(filter(_ls, l -> l = d)))) END"
    ).cast("bigint")
    grams = F.expr(
        "CASE WHEN size(_ts) < 2 THEN array() ELSE "
        "transform(sequence(1, size(_ts) - 1), i -> "
        "concat(element_at(_ts, i), ' ', element_at(_ts, i + 1))) END"
    )
    with_grams = base.withColumn("_gs", grams)
    n_grams = F.size("_gs").cast("bigint")
    n_dist_grams = F.size(F.array_distinct("_gs")).cast("bigint")
    return with_grams.select(
        doc_col,
        n_lines.alias("n_lines"),
        F.when(n_lines > 0, 1.0 - n_dist_lines / n_lines.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_line_ratio"),
        top_line.alias("top_line_count"),
        F.when(n_grams > 0, 1.0 - n_dist_grams / n_grams.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_ratio"),
    )


# Gopher-style rule thresholds (Rae et al. 2021, Table A1 — public paper);
# frozen constants are the operator contract.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_RATIO = 0.8


def gopher_quality_rules(docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher rule-based quality filter: word-count bounds, mean-word-length
    band, and the fraction of words containing an alphabetic character.
    Emits the per-rule features plus ``keep`` so downstream can either
    filter or audit rejection reasons. Single codegen'd projection."""
    toks = F.expr(f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')")
    base = docs.select(doc_col, toks.alias("_ts"))
    n_words = F.size("_ts").cast("bigint")
    # mean word length over token lengths (not chars/words: whitespace runs
    # would skew it)
    sum_len = F.expr("aggregate(_ts, CAST(0 AS BIGINT), (a, t) -> a + length(t))")
    mean_wl = F.when(n_words > 0, sum_len / n_words.cast("double"))
    n_alpha = F.expr("size(filter(_ts, t -> t rlike '[a-z]'))").cast("bigint")
    alpha_ratio = F.when(n_words > 0, n_alpha / n_words.cast("double"))
    out = base.select(
        doc_col,
        n_words.alias("n_words"),
        F.round(mean_wl, 9).alias("mean_word_len"),
        F.round(alpha_ratio, 9).alias("alpha_word_ratio"),
    )
    keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("alpha_word_ratio") >= GOPHER_MIN_ALPHA_RATIO)
    )
    return out.withColumn("keep", F.coalesce(keep, F.lit(False)))


# PII patterns kept to syntax both Java regex (Spark) and RE2-ish (DuckDB)
# treat identically: no lookarounds, no backreferences.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONG_DIGITS_RE = r"[0-9][0-9 ()\-]{7,}[0-9]"


def pii_scrub(docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII-ish scrubbing for training corpora: redact email addresses and
    long digit runs (phone/account shaped), and count what was removed so
    the pipeline can route heavy-PII documents to review instead of
    training. Redaction-only — real PII policy needs NER, but the regex
    tier is the cheap first pass every pipeline runs at full scale.
    Single projection; counts via regexp_extract_all folds."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0))).cast("bigint")
    n_digit_runs = F.size(F.regexp_extract_all(t, F.lit(PII_LONG_DIGITS_RE), F.lit(0))).cast(
        "bigint"
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"), PII_LONG_DIGITS_RE, "<NUMBER>"
    )
    return docs.select(
        doc_col,
        n_emails.alias("n_emails"),
        n_digit_runs.alias("n_digit_runs"),
        scrubbed.alias("scrubbed_text"),
    )


def token_length_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-shape histogram: documents bucketed by power-of-two token
    count. The bucket is ``length(bin(n))`` = floor(log2(n)) + 1 computed
    in INTEGER space (binary-string length), so bucket edges are exact on
    every engine — a float log2 would put exact powers of two on an
    implementation-defined side. One map-side-combinable aggregation."""
    n = token_count_ws(text_col)
    base = docs.select(n.alias("n_tokens")).filter(F.col("n_tokens") > 0)
    bucket = F.length(F.bin(F.col("n_tokens"))).cast("int")
    return (
        base.select(bucket.alias("log2_bucket"), "n_tokens")
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


# Rolling-hash fingerprints share dedup.py's md5-derived 31-bit token hash
# so the whole chain is integer arithmetic both engines compute identically.
ROLLING_BASE = 31
ROLLING_MOD = 2147483647  # MINHASH_PRIME; acc*31 + h < 2^36, no overflow


def rolling_fingerprints(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
) -> DataFrame:
    """Order-sensitive document fingerprints from a polynomial rolling hash
    over token hashes (MOSS-style): ``fp_doc`` hashes the whole token
    sequence (reordered text changes it — unlike the bag-of-words
    normalization fingerprint), and ``fp_min_kgram`` is the minimum rolling
    hash over all k-token windows (a 1-sample winnowing fingerprint, robust
    to local edits). Shuffle-free single projection; documents with no
    tokens are dropped (no sequence to fingerprint)."""
    from vectorflow_spark.operators.dedup import tokens_expr

    toks = docs.select(doc_col, tokens_expr(text_col).alias("_ts"))
    hashed = toks.select(
        doc_col,
        F.expr(
            "transform(_ts, s -> CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT))"
        ).alias("hs"),
    ).filter(F.size("hs") > 0)
    fold = f"(acc, h) -> (acc * {ROLLING_BASE} + h) % {ROLLING_MOD}"
    fp_doc = F.expr(f"aggregate(hs, CAST(0 AS BIGINT), {fold})")
    fp_min_kgram = F.expr(
        f"""CASE WHEN size(hs) < {k}
            THEN aggregate(hs, CAST(0 AS BIGINT), {fold})
            ELSE array_min(transform(
                sequence(1, size(hs) - {k} + 1),
                i -> aggregate(slice(hs, i, {k}), CAST(0 AS BIGINT), {fold})))
            END"""
    )
    return hashed.select(
        doc_col, fp_doc.alias("fp_doc"), fp_min_kgram.alias("fp_min_kgram")
    )


def rare_token_stats(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    rare_below: int = 3,
) -> DataFrame:
    """Corpus-frequency rarity signals per document — the unigram-LM slice
    of quality scoring (a doc whose tokens are mostly corpus-rare is likely
    noise, OCR garbage, or another language; a doc of only ultra-common
    tokens is likely boilerplate).

    Two-pass: (1) corpus token frequencies via groupBy(token) — map-side
    combinable, vocabulary-sized output; (2) join doc tokens back to their
    frequency. Output per doc: n_tokens, n_rare (corpus freq < rare_below),
    rare_ratio, mean_token_freq. All derived from INTEGER sums with one
    final division each, so the values are bit-stable across engines (no
    order-dependent float accumulation — summing doubles would hash-differ
    between Spark and an oracle on reduction order alone).

    Scale notes: the frequency join is keyed on the token itself and token
    frequency is zipfian — the hot keys ("the", "of") are real skew. AQE
    skew-join splitting handles it at runtime; structurally the join is
    unavoidable because the vocabulary at 100 TB does not broadcast. The
    per-doc re-aggregation groups on doc_id (uniform)."""
    from vectorflow_spark.operators.dedup import tokens_expr

    toks = docs.select(doc_col, F.explode(tokens_expr(text_col)).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    per_doc = (
        toks.join(freq, "tok")
        .groupBy(doc_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("freq") < rare_below, 1).otherwise(0)).alias("n_rare"),
            F.sum("freq").alias("_freq_sum"),
        )
    )
    return per_doc.select(
        doc_col,
        "n_tokens",
        "n_rare",
        F.round(F.col("n_rare").cast("double") / F.col("n_tokens"), 9).alias("rare_ratio"),
        F.round(F.col("_freq_sum").cast("double") / F.col("n_tokens"), 9).alias("mean_token_freq"),
    )


def bpe_token_stats(
    docs: DataFrame,
    tokenizer,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token count + compression ratio under a REAL byte-level BPE
    vocabulary (functions/bpe.py — the algorithm tiktoken runs; reference
    src/worker/worker.py:191 uses tiktoken cl100k_base). Pure per-row map:
    BPE merges are confined to pre-tokenizer pieces, so this is a stateless
    Arrow-batched pandas UDF with no shuffle. The ranks table rides the
    serialized closure (once per task launch, cached per worker by module
    import); for the ~2 MB cl100k table prefer ``spark.sparkContext
    .broadcast`` and pass a thin wrapper, or ship the ranks FILE with
    addFile + the VECTORFLOW_SPARK_BPE_FILE env (functions/tokenizer.py)
    so workers load it locally at import."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _n_bpe(s):
        return s.map(lambda t: len(tokenizer.encode(t)) if t else 0)

    # real annotation objects, not strings: this module uses
    # `from __future__ import annotations`, which would stringify inline
    # hints and break pandas_udf's signature introspection (pd isn't in the
    # module globals it resolves against)
    _n_bpe.__annotations__ = {"s": pd.Series, "return": pd.Series}
    n_bpe = pandas_udf(_n_bpe, "long")

    return docs.select(
        doc_col,
        F.length(text_col).alias("n_chars"),
        n_bpe(F.col(text_col)).alias("n_bpe_tokens"),
    ).withColumn(
        "chars_per_token",
        F.round(
            F.col("n_chars").cast("double")
            / F.when(F.col("n_bpe_tokens") > 0, F.col("n_bpe_tokens")),
            9,
        ),
    )


def word_entropy(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Per-document Shannon entropy (bits) of the lowercase whitespace-token
    distribution — the information-density quality signal (boilerplate and
    keyword-stuffed spam score low; natural prose scores ~7-10 bits).

    H = log2(N) - (sum_t c_t * log2(c_t)) / N over token counts c_t.

    Cross-engine determinism: the inner sum is a SEQUENTIAL LEFT FOLD over
    the (count, token)-sorted count list — Spark ``aggregate`` and DuckDB
    ``list_reduce`` both fold left over an identically ordered list, so
    the float accumulation order is pinned (a plain SUM would let each
    engine add in its own partition order). The result is rounded to
    ``round_to`` decimals to absorb last-ulp log2 differences between
    libm implementations.

    Plan at scale: explode -> (doc, token) count -> per-doc sorted
    collect. Two shuffles; the collected list is vocabulary-sized per doc
    (bounded by document length, the same bound every per-doc operator
    here carries)."""
    toks = docs.select(
        F.col(doc_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy(doc_col, "tok").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = counts.groupBy(doc_col).agg(
        F.sort_array(F.collect_list(F.struct("cnt", "tok"))).alias("_cs"),
        F.sum("cnt").alias("n_tokens"),
    )
    inner = F.aggregate(
        "_cs",
        F.lit(0.0).cast("double"),
        lambda acc, c: acc + c["cnt"].cast("double") * F.log2(c["cnt"].cast("double")),
    )
    h = F.log2(F.col("n_tokens").cast("double")) - inner / F.col("n_tokens").cast("double")
    return per_doc.select(
        doc_col,
        F.col("n_tokens"),
        F.round(h, round_to).alias("entropy_bits"),
    )


def bigram_perplexity(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Per-document perplexity under an interpolated bigram LM estimated
    from the corpus itself — the distributed form of CCNet/FineWeb-style
    LM quality ranking (there a pretrained KenLM scores each doc; here the
    n-gram model is fit and applied in the same two passes, which is what
    you actually do at 100 TB when no external LM fits the domain).

    p(w2|w1) = lam * c(w1,w2)/c(w1) + (1-lam) * c(w2)/N, ppl =
    2^(-mean log2 p). Low perplexity = predictable/repetitive text,
    high = noise; both tails are the filter targets.

    Plan at scale: bigram and unigram count tables are map-side-combinable
    aggregations on uniform token keys; scoring joins each doc's bigrams
    against them (equi joins on the same keys — skew from stopword pairs
    is AQE's skew-join case), and N rides along as a broadcast single row,
    never a driver value. Cross-engine determinism: each term is rounded
    to 9 dp, the per-doc sum is a sequential fold over the pos-sorted term
    list (same order both engines), and the final perplexity is rounded to
    ``round_to``.
    """
    ts = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    toked = docs.select(F.col(doc_col), ts.alias("_ts")).filter(F.size("_ts") >= 2)
    bg = toked.select(
        doc_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(_ts) - 1), "
                "i -> struct(i AS pos, element_at(_ts, i) AS w1, element_at(_ts, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select(doc_col, "b.pos", "b.w1", "b.w2")
    uni = (
        toked.select(F.explode("_ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    # N == sum of the unigram counts: derive it from `uni` instead of a
    # second explode+count pass over every token of the corpus (guide
    # §2.2 — the sketch-sized agg replaces a data-sized one; exact, both
    # are the same integer)
    n_tot = uni.agg(F.sum("cu").alias("nn"))
    p = (
        F.lit(lam) * F.col("cb") / F.col("cu1")
        + F.lit(1.0 - lam) * F.col("cu2") / F.col("nn")
    )
    terms = (
        bg.join(big, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), F.col("cu").alias("cu1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cu").alias("cu2")), "w2")
        .crossJoin(F.broadcast(n_tot))
        .select(doc_col, "pos", F.round(F.log2(p), 9).alias("lp"))
    )
    per_doc = terms.groupBy(doc_col).agg(
        F.sort_array(F.collect_list(F.struct("pos", "lp"))).alias("_lps"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    s = F.aggregate("_lps", F.lit(0.0).cast("double"), lambda a, x: a + x["lp"])
    return per_doc.select(
        doc_col,
        "n_bigrams",
        F.round(
            F.pow(F.lit(2.0), -s / F.col("n_bigrams").cast("double")), round_to
        ).alias("ppl"),
    )


def distributed_train_ranks(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    pattern: str | None = None,
) -> dict:
    """Distributed BPE tokenizer TRAINING — the cluster-scale twin of
    functions.bpe.train_ranks (pytest-pinned to produce the identical
    merges table): repeatedly find the most frequent adjacent symbol pair
    over the piece-frequency table and merge it, ties broken by byte
    order.

    Why this scales where the in-memory trainer cannot: the corpus is
    touched ONCE (pre-tokenize + piece-frequency count, map-side
    combinable); every merge round then runs on the PIECE TABLE, whose
    size is the distinct pre-tokenizer vocabulary — millions of rows at
    web scale, not the corpus's trillions of tokens. Per round: one
    pair-count aggregation + a 1-row TakeOrderedAndProject for the best
    pair (count desc, pair byte-lex asc — Spark's unsigned binary order ==
    Python bytes order), then an Arrow-batched re-merge of the symbol
    arrays and a re-aggregation of now-identical pieces. The table is
    localCheckpointed each round, so lineage stays one round deep instead
    of accreting n_merges plan layers.

    The known-rank exclusion (candidates already in the vocabulary) rides
    as an isin filter over the ~256+merges byte-string literals — a
    broadcast-sized predicate, exactly the trainer's `p not in ranks`."""
    import pandas as pd

    from vectorflow_spark.functions.bpe import (
        _FALLBACK_PATTERN,
        _HAVE_REGEX,
        CL100K_PATTERN,
        byte_ranks,
    )

    pat_str = pattern if pattern is not None else (
        CL100K_PATTERN if _HAVE_REGEX else _FALLBACK_PATTERN
    )

    def to_pieces(batches):
        if _HAVE_REGEX:
            import regex as re_mod
        else:
            import re as re_mod
        pat = re_mod.compile(pat_str)
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                for piece in pat.findall(t or ""):
                    b = piece.encode("utf-8")
                    if b:
                        out.append([b[i : i + 1] for i in range(len(b))])
            yield pd.DataFrame({"sym": out})

    pieces = (
        docs.select(text_col)
        .mapInPandas(to_pieces, schema="sym array<binary>")
        .groupBy("sym")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint()
    )

    ranks = byte_ranks()
    adjacent = F.expr(
        "transform(sequence(1, size(sym) - 1), "
        "i -> concat(element_at(sym, i), element_at(sym, i + 1)))"
    )
    for _ in range(n_merges):
        cand = (
            pieces.filter(F.size("sym") >= 2)
            .select(F.explode(adjacent).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .filter(~F.col("pair").isin([k for k in ranks]))
            .orderBy(F.col("n").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not cand:
            break
        best = bytes(cand[0].pair)
        ranks[best] = len(ranks)

        def apply_merge(batches, best=best):
            for pdf in batches:
                def m(sym):
                    out, i = [], 0
                    while i < len(sym):
                        if i + 1 < len(sym) and bytes(sym[i]) + bytes(sym[i + 1]) == best:
                            out.append(best)
                            i += 2
                        else:
                            out.append(bytes(sym[i]))
                            i += 1
                    return out
                pdf = pdf.copy()
                pdf["sym"] = pdf["sym"].map(m)
                yield pdf

        pieces = (
            pieces.mapInPandas(apply_merge, schema="sym array<binary>, freq bigint")
            .groupBy("sym")
            .agg(F.sum("freq").alias("freq"))
            .localCheckpoint()
        )
    return ranks


def normalize_text_nfc(docs, text_col: str = "text", out_col: str = "norm_text"):
    """Unicode NFC normalization — the canonicalization step every text
    corpus needs before hashing/dedup: visually-identical strings with
    decomposed combining marks (e + U+0301 vs é) hash differently and
    silently defeat exact dedup, sharding keys, and tokenizer caches.

    Runs as an Arrow-batched pandas UDF over Python's unicodedata (the
    JVM exposes java.text.Normalizer but Spark ships no SQL function for
    it); stays a per-row projection — zero shuffle, scales by
    partitioning alone. Verified engine-vs-engine: unicodedata.normalize
    ('NFC', s) is codepoint-identical to DuckDB's nfc_normalize on the
    oracle corpus (q_unicode_normalize)."""
    from pyspark.sql.types import StringType

    def _nfc(texts):
        import unicodedata

        return texts.map(lambda s: None if s is None else unicodedata.normalize("NFC", s))

    # lambda form: pyspark's signature parser can't resolve pd.Series
    # annotations when pandas is imported function-locally
    nfc_udf = F.pandas_udf(_nfc, StringType())
    return docs.withColumn(out_col, nfc_udf(F.col(text_col)))


def smart_metadata(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text", source_col: str | None = None
) -> DataFrame:
    """Reference-roadmap '"Smart" metadata extractor' (README.md:299) as
    a pure-expression projection: per document derive the sidecar fields
    a catalog/metadata store wants next to the vectors — title (first
    non-empty line, whitespace-collapsed, capped at 120 chars), file
    extension (when a source column exists), URL / email / ISO-date
    counts, the first ISO date, exact word count, and an integer reading
    time at the canonical 238 wpm. Everything is JVM-side regex/codegen
    (zero Python, zero shuffle) so at 100 TB this rides the same scan as
    extraction; compose with predict_language / quality_score for the
    model-ish fields. Feed the result to to_vector_records(metadata=...)
    or write_metadata_store to land it beside the vectors."""
    text = F.col(text_col)
    # F.get (0-based) is NULL-safe on the all-blank-lines edge where ANSI
    # element_at would throw INVALID_ARRAY_INDEX
    first_line = F.get(F.filter(F.split(text, "\n"), lambda x: F.trim(x) != ""), 0)
    title = F.substring(F.trim(F.regexp_replace(first_line, r"\s+", " ")), 1, 120)
    # split('') yields [''] (size 1), so the empty/blank case needs its own
    # branch or the catalog records one word for empty documents
    n_words = F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )
    cols = [
        F.col(doc_col),
        title.alias("title"),
        F.regexp_count(text, F.lit(r"https?://[^\s]+")).alias("n_urls"),
        F.regexp_count(
            text, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
        ).alias("n_emails"),
        F.regexp_count(text, F.lit(r"\d{4}-\d{2}-\d{2}")).alias("n_dates"),
        F.nullif(F.regexp_extract(text, r"(\d{4}-\d{2}-\d{2})", 1), F.lit("")).alias(
            "first_date"
        ),
        n_words.alias("n_words"),
        # explicit floor: Spark's cast-to-bigint truncates where DuckDB's
        # rounds, so the floor keeps the two engines bit-identical
        F.floor(n_words * F.lit(60) / F.lit(238)).cast("bigint").alias("reading_time_s"),
    ]
    if source_col is not None:
        cols.insert(
            2,
            F.lower(F.regexp_extract(F.col(source_col), r"\.([A-Za-z0-9]+)$", 1)).alias("ext"),
        )
    return docs.select(*cols)


# Confusable/homoglyph folding table: unambiguous single-codepoint
# lookalikes only — Cyrillic and Greek letters whose glyphs are
# indistinguishable from Latin (the script-mixing trick spam and
# dedup-evasion text uses), the fullwidth ASCII block, NBSP -> space,
# and zero-width characters (ZWSP/ZWNJ/ZWJ/BOM/soft hyphen) DELETED
# (the from-string tail beyond the to-string length, per the shared
# PostgreSQL translate() semantics both engines implement).
HOMOGLYPH_FROM = '\xa0ΑΒΕΖΗΙΚΜΝΟΡΤΥΧοАВЕКМНОРСТУХаеорсухѕіј！＂＃＄％＆＇（）＊＋，－．／０１２３４５６７８９：；＜＝＞？＠ＡＢＣＤＥＦＧＨＩＪＫＬＭＮＯＰＱＲＳＴＵＶＷＸＹＺ［＼］＾＿｀ａｂｃｄｅｆｇｈｉｊｋｌｍｎｏｐｑｒｓｔｕｖｗｘｙｚ｛｜｝～\u200b\u200c\u200d\ufeff\xad'
HOMOGLYPH_TO = ' ABEZHIKMNOPTYXoABEKMHOPCTYXaeopcyxsij!"#$%&\'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~'


def fold_homoglyphs(text_col: str | Column) -> Column:
    """Adversarial-dedup normalization: fold script-mixing homoglyphs
    to their Latin forms and strip zero-width characters, as ONE
    codegen translate() — the canonicalization pass before exact/
    fingerprint dedup so \u0430pple and apple collide. 1:1 codepoint
    mapping only (no NFKC expansions — compose with
    normalize_text_nfc for those); at 100 TB this is a free projection
    on the dedup scan."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.translate(col, HOMOGLYPH_FROM, HOMOGLYPH_TO)


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    df_cap: int = 20,
) -> DataFrame:
    """All document pairs with TF-IDF cosine similarity >= ``threshold``,
    computed EXACTLY in the df-capped term space — (a, b, cos_sim).

    The term-weighted tier of the near-dup ladder: n-gram Jaccard sees
    surface overlap, dense-embedding cosine sees semantics through a
    model; TF-IDF cosine sees shared DISTINCTIVE vocabulary with no
    model at all. The df-cut (Bayardo et al., WWW'07 all-pairs
    similarity) drops terms appearing in more than ``df_cap`` documents
    BEFORE pair generation: high-df terms carry the lowest IDF weight
    yet would dominate the posting-list self-join quadratically, so the
    cut is simultaneously the quality prior and the scale bound — every
    posting list joins at most df_cap^2 pairs. Within the capped term
    space the cosine is exact, not approximate: weights are rounded at
    9 then carried as DECIMAL(18,9), pair dot products and norm squares
    are DECIMAL sums of exact DECIMAL(36,18) products (order-invariant
    — a double fold here would hash-differ between engines), and each
    pair pays exactly one sqrt+division in double at the end.

    Plan at scale: tf/df aggregations as in tfidf_top_terms, the pair
    join shuffles on term with df_cap bounding any one list, the pair
    aggregation shuffles on (a, b), and norms join back on each side —
    never broadcast (the norm table is corpus-sized)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')")
        ).alias("term"),
    )
    # tf is read twice (df agg + weight join) and w three times (norms +
    # both pair sides): checkpoint both posting-list-sized tables so the
    # raw corpus is tokenized exactly once instead of once per reference
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint()
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(df_.filter(F.col("df") <= df_cap), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * (F.log((1 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1),
                9,
            )
            .cast("decimal(18,9)")
            .alias("w"),
        )
        .localCheckpoint()
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("norm")
    )
    wa = w.select(F.col("doc_id").alias("a"), "term", F.col("w").alias("wa"))
    wb = w.select(F.col("doc_id").alias("b"), "term", F.col("w").alias("wb"))
    dots = (
        wa.join(wb, "term")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("a"), F.col("norm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("b"), F.col("norm").alias("nb"))
    return (
        dots.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.round(F.col("dot").cast("double") / (F.col("na") * F.col("nb")), 9).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
