"""Text analysis: token stats, language id, quality scores, enrichment text ops."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import _t, query


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "q_token_counts",
    r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t != '')) AS BIGINT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+')) AS BIGINT) AS n_tokens_bpe
    FROM documents
    """,
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts — one projection pass."""
    from vectorflow_spark.operators.textstats import token_count_bpe_ish, token_count_ws

    return _t(spark, sf_dir, "documents", split=True).select(
        "doc_id",
        token_count_ws("text").alias("n_tokens_ws"),
        token_count_bpe_ish("text").alias("n_tokens_bpe"),
    )


def _lang_sql() -> str:
    from vectorflow_spark.operators.textstats import STOPWORDS

    langs = sorted(STOPWORDS)
    vote_cols = ", ".join(
        f"CAST(len(regexp_extract_all(lower(text), '\\b({'|'.join(STOPWORDS[lang])})\\b')) AS BIGINT) AS votes_{lang}"
        for lang in langs
    )
    # argmax with strict-> improvement, alphabetical scan order (mirrors
    # textstats.predict_language)
    case = "'und'"
    best = "CAST(0 AS BIGINT)"
    for lang in langs:
        case = f"CASE WHEN votes_{lang} > {best} THEN '{lang}' ELSE {case} END"
        best = f"greatest(votes_{lang}, {best})"
    # rebuild: scan in order, with later langs only winning on strict >
    return f"""
    WITH votes AS (SELECT doc_id, lang, {vote_cols} FROM documents)
    SELECT doc_id, lang, votes_de, votes_en, votes_es, votes_fr,
           CASE
             WHEN votes_fr > greatest(votes_de, votes_en, votes_es) THEN 'fr'
             WHEN votes_es > greatest(votes_de, votes_en) THEN 'es'
             WHEN votes_en > votes_de THEN 'en'
             WHEN votes_de > 0 THEN 'de'
             ELSE 'und'
           END AS pred_lang
    FROM votes
    """


@query("q_lang_id", _lang_sql())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language id with deterministic alphabetical tiebreak
    (first language in de<en<es<fr order wins ties)."""
    from vectorflow_spark.operators.textstats import predict_language

    df = predict_language(_t(spark, sf_dir, "documents", split=True).select("doc_id", "text", "lang"))
    return df.select("doc_id", "lang", "votes_de", "votes_en", "votes_es", "votes_fr", "pred_lang")


@query(
    "q_quality_scores",
    r"""
    WITH f AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_t,
               CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t != '')) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
               CAST(len(regexp_extract_all(lower(text), '\b(the|and|is|of|to|in|that|with)\b')) AS BIGINT) AS n_stop
        FROM documents
    )
    SELECT doc_id, n_chars_t, n_words, n_punct,
           round(0.4 * (CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END)
                 + 0.3 * (CASE WHEN n_words > 0 AND CAST(length_ratio AS DOUBLE) >= 3 AND length_ratio <= 10 THEN 1.0 ELSE 0.0 END)
                 - 0.2 * (CASE WHEN n_chars_t > 0 THEN CAST(n_punct AS DOUBLE) / n_chars_t ELSE 0.0 END)
                 - 0.1 * (CASE WHEN n_chars_t > 0 THEN CAST(n_digits AS DOUBLE) / n_chars_t ELSE 0.0 END), 9) AS quality_score
    FROM (SELECT *, CASE WHEN n_words > 0 THEN CAST(n_chars_t AS DOUBLE) / n_words END AS length_ratio FROM f)
    """,
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (stopword density + word-length sanity -
    punctuation/digit noise), single projection pass."""
    from vectorflow_spark.operators.textstats import quality_score

    df = quality_score(_t(spark, sf_dir, "documents", split=True).select("doc_id", "text"))
    return df.select("doc_id", "n_chars_t", "n_words", "n_punct", "quality_score")




@query(
    "q_smart_metadata",
    r"""
    WITH m AS (
        SELECT doc_id,
               list_filter(string_split(text, chr(10)), x -> trim(x) != '')[1] AS first_line,
               len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
               len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(text, '\d{4}-\d{2}-\d{2}')) AS n_dates,
               nullif(regexp_extract(text, '(\d{4}-\d{2}-\d{2})', 1), '') AS first_date,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
               lower(regexp_extract(source, '\.([A-Za-z0-9]+)$', 1)) AS ext
        FROM documents
    )
    SELECT doc_id,
           substring(trim(regexp_replace(first_line, '\s+', ' ', 'g')), 1, 120) AS title,
           ext,
           CAST(n_urls AS INT) AS n_urls,
           CAST(n_emails AS INT) AS n_emails,
           CAST(n_dates AS INT) AS n_dates,
           first_date,
           CAST(n_words AS INT) AS n_words,
           CAST(floor(n_words * 60 / 238) AS BIGINT) AS reading_time_s
    FROM m
    """,
)
def q_smart_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-roadmap smart metadata extractor
    (operators/textstats.smart_metadata): title / extension / URL-email-
    date counts / first ISO date / word count / reading time, every field
    recomputed relationally by DuckDB from the same regex definitions.
    Pure JVM-side projection — zero Python, zero shuffle; the catalog
    sidecar a 100-TB ingest derives on the same scan as extraction."""
    from vectorflow_spark.operators.textstats import smart_metadata

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text", "source")
    return smart_metadata(docs, source_col="source")


_HG_FROM = '\xa0ΑΒΕΖΗΙΚΜΝΟΡΤΥΧοАВЕКМНОРСТУХаеорсухѕіј！＂＃＄％＆＇（）＊＋，－．／０１２３４５６７８９：；＜＝＞？＠ＡＢＣＤＥＦＧＨＩＪＫＬＭＮＯＰＱＲＳＴＵＶＷＸＹＺ［＼］＾＿｀ａｂｃｄｅｆｇｈｉｊｋｌｍｎｏｐｑｒｓｔｕｖｗｘｙｚ｛｜｝～\u200b\u200c\u200d\ufeff\xad'
_HG_TO = ' ABEZHIKMNOPTYXoABEKMHOPCTYXaeopcyxsij!"#$%&\'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~'


_HG_FROM_SQL = _HG_FROM.replace("'", "''")
_HG_TO_SQL = _HG_TO.replace("'", "''")


@query(
    "q_homoglyph_fold",
    f"""
    WITH probed AS (
        SELECT doc_id,
               text || ' ' || substring('{_HG_FROM_SQL}', 1 + CAST(doc_id % 130 AS INT), 8) AS probe_text
        FROM documents
    )
    SELECT doc_id,
           translate(probe_text, '{_HG_FROM_SQL}', '{_HG_TO_SQL}') AS folded,
           (translate(probe_text, '{_HG_FROM_SQL}', '{_HG_TO_SQL}') != probe_text) AS changed
    FROM probed
    """,
)
def q_homoglyph_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusable folding (operators/textstats.fold_homoglyphs): the
    canonicalization pass before exact/fingerprint dedup — Cyrillic and
    Greek lookalikes to Latin, fullwidth ASCII to ASCII, zero-width
    characters deleted — as one codegen translate() recomputed by
    DuckDB's translate (shared PostgreSQL deletion semantics for the
    unpaired from-tail). Because the corpus text is ASCII, every doc is
    salted with an 8-char slice of the mapping table selected by doc_id,
    so the hash match exercises the whole FROM alphabet including the
    deletion tail. Zero Python, zero shuffle."""
    from vectorflow_spark.operators.textstats import HOMOGLYPH_FROM, fold_homoglyphs

    docs = _t(spark, sf_dir, "documents", split=True).select("doc_id", "text")
    probe = F.substr(
        F.lit(HOMOGLYPH_FROM), (F.col("doc_id") % 130 + 1).cast("int"), F.lit(8)
    )
    probed = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" "), probe).alias("probe_text")
    )
    folded = fold_homoglyphs("probe_text")
    return probed.select(
        "doc_id", folded.alias("folded"), (folded != F.col("probe_text")).alias("changed")
    )
