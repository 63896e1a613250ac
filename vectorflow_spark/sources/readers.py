"""Extraction sources (operators S1-S8).

The reference extracts text in two places (API-inline, src/api/app.py:228-257;
extractor service, src/extract/extract.py:65-100) by dispatching on file
extension, with a content-sniff fallback for extensionless files
(src/api/app.py:291-310: try utf-8 decode of the first 1 KB -> treat as txt).

Spark mapping: ONE ``binaryFile`` scan + a dispatch projection. Text-family
formats (txt/md/html) decode entirely with built-in expressions; PDF/DOCX
need their parser libraries (PyMuPDF / python-docx — not installed in this
environment) and run as import-gated pandas UDFs, parallel per file. MinIO
staging (S7) disappears: executors read the source path directly.

Deliberate semantic difference, recorded: the reference's HTML "extraction"
is ``repr()`` of the bytes (no tag stripping, src/api/app.py:245-247); we
decode utf-8 and optionally strip tags with a regex — the reference behavior
is a bug we do not replicate (SURVEY.md §7 risk register).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectorflow_spark.operators.filters import SUPPORTED_EXTENSIONS

# magic-byte prefixes for content sniffing (S6's libmagic, reduced to the
# formats the reference dispatches on)
_PDF_MAGIC = "%PDF"
_ZIP_MAGIC = "PK"  # docx is a zip container


def read_raw_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """S1-S6 scan: one row per file with (path, length, content binary).
    binaryFile streams split-free; pushdown on path/length still applies."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select(
        F.col("path"),
        F.element_at(F.split("path", "/"), -1).alias("source"),
        F.col("length"),
        F.col("content"),
    )


def stage_presigned(
    spark: SparkSession,
    urls: list[str],
    dest_dir: str,
) -> DataFrame:
    """S6: presigned-URL ingest (reference src/api/app.py:180-226). The
    reference downloads in the API process, sniffs MIME with libmagic, and
    dispatches to an extractor; here the driver stages each URL into
    ``dest_dir`` (executors then read shared storage directly — the S7
    MinIO hop never exists) and the regular binaryFile scan + sniff_kind
    dispatch takes over. URL count is a driver-side list by definition
    (presigned URLs arrive one per request), so a driver loop is the right
    shape; bulk manifests should land as paths, not URLs.

    Uses stdlib urllib so the helper works without extra deps; supports
    file:// URLs, which is how tests exercise it offline."""
    import pathlib
    import urllib.parse
    import urllib.request

    dest = pathlib.Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    for i, url in enumerate(urls):
        name = pathlib.Path(urllib.parse.urlparse(url).path).name or f"url_{i}"
        urllib.request.urlretrieve(url, dest / f"{i:04d}_{name}")
    return read_raw_files(spark, str(dest))


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    schema: str | None = None,
) -> DataFrame:
    """JSONL corpus ingest — the de-facto interchange format of training-data
    pipelines (one JSON object per line). Normalizes to the documents shape
    (doc_id, text, source): ``id_field`` supplies ids when the corpus has
    them, otherwise a deterministic 63-bit xxhash64 of (file, text) — stable
    across re-reads and partitionings, so downstream uuid5 chunk ids stay
    idempotent (K1).

    Scale notes: pass an explicit ``schema`` in production — schema
    inference scans the data once before the real job; JSONL splits by line
    so a single giant file still parallelizes (unlike multiline JSON)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    raw = reader.json(path).withColumn("source", F.input_file_name())
    doc_id = (
        F.col(id_field).cast("long")
        if id_field
        else F.pmod(F.xxhash64("source", text_field), F.lit(2**63 - 1))
    )
    return raw.select(
        doc_id.alias("doc_id"),
        F.col(text_field).alias("text"),
        F.element_at(F.split("source", "/"), -1).alias("source"),
    )


def sniff_kind(source_col: str = "source", content_col: str = "content"):
    """File-kind dispatch: extension first, magic bytes for extensionless
    files, utf-8-decodable head as the final txt fallback (S8)."""
    lowered = F.lower(F.col(source_col))
    # decode() raises MALFORMED_CHARACTER_CODING on invalid bytes in Spark 4;
    # gate every decode behind is_valid_utf8 (CASE branches evaluate lazily)
    head = F.expr(
        f"CASE WHEN is_valid_utf8(substring({content_col}, 1, 4)) "
        f"THEN decode(substring({content_col}, 1, 4), 'UTF-8') END"
    )
    decodable = F.expr(f"is_valid_utf8(substring({content_col}, 1, 1024))")
    # EPUB vs docx inside the shared zip magic: a conforming EPUB's FIRST
    # local header is the STORED `mimetype` entry, so the discriminator
    # sits at fixed offsets (name at byte 31, mime right behind) — a pure
    # JVM-side byte compare, no zip directory walk (epubmini.looks_like_epub
    # is the Python twin of this expression)
    epub_sig = F.expr(f"substring({content_col}, 31, 28)") == F.lit(
        b"mimetypeapplication/epub+zip"
    )
    return (
        F.when(lowered.endswith(".pdf"), F.lit("pdf"))
        .when(lowered.endswith(".docx"), F.lit("docx"))
        .when(lowered.endswith(".epub"), F.lit("epub"))
        .when(lowered.endswith(".rtf"), F.lit("rtf"))
        .when(lowered.endswith(".md"), F.lit("md"))
        .when(lowered.endswith(".html"), F.lit("html"))
        .when(lowered.endswith(".txt"), F.lit("txt"))
        .when(head == _PDF_MAGIC, F.lit("pdf"))
        .when(head == "{\\rt", F.lit("rtf"))
        .when((head == _ZIP_MAGIC) & epub_sig, F.lit("epub"))
        .when(head == _ZIP_MAGIC, F.lit("docx"))
        .when(decodable, F.lit("txt"))
        .otherwise(F.lit("unsupported"))
    )


def _pdf_extract_udf():
    """S2: PyMuPDF page-concat extraction (reference joins page texts,
    src/extract/extract.py:93-97), with a pure-stdlib fallback
    (sources/pdfmini.py) when fitz is not installed — the fallback covers
    the common case (Flate/plain content streams, Tj/TJ text operators)
    with the same page-concat semantics, so simple/generated PDFs extract
    without any external dependency; installing PyMuPDF upgrades fidelity
    (CID fonts, encodings, layout) without a code change.

    NULL-tolerant by contract: the caller feeds ``CASE WHEN kind='pdf'
    THEN content END`` so non-pdf rows arrive as nulls and pass straight
    through — Spark pulls pandas UDFs out of CASE expressions and
    evaluates them on every row, so the null-gate (not the CASE) is what
    keeps non-pdf bytes off the Python path. The fitz import is deferred
    to the first NON-null row, so a pdf-free dataset never touches either
    parser."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _udf(contents: pd.Series) -> pd.Series:
        def one(b) -> str | None:
            if b is None:
                return None
            try:
                import fitz  # PyMuPDF; cached in sys.modules after first row
            except ImportError:
                from vectorflow_spark.sources.pdfmini import extract_pdf_text

                return extract_pdf_text(bytes(b))
            with fitz.open(stream=bytes(b), filetype="pdf") as doc:
                return "".join(page.get_text() for page in doc)

        return contents.map(one)

    return _udf


def _docx_extract_udf():
    """S3: python-docx paragraph-join (reference src/extract/extract.py:74-76),
    with a pure-stdlib fallback (sources/docxmini.py — a .docx is a zip of
    OOXML, so zipfile + ElementTree cover the paragraph-join case with
    python-docx's exact Run.text mapping). Same NULL-tolerant /
    deferred-import contract as _pdf_extract_udf; corrupt containers raise
    loudly rather than yielding silent nulls."""
    import io

    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _udf(contents: pd.Series) -> pd.Series:
        def one(b) -> str | None:
            if b is None:
                return None
            try:
                import docx
            except ImportError:
                from vectorflow_spark.sources.docxmini import extract_docx_text

                return extract_docx_text(bytes(b))
            d = docx.Document(io.BytesIO(bytes(b)))
            return "\n".join(p.text for p in d.paragraphs)

        return contents.map(one)

    return _udf


def _rtf_extract_udf():
    """S-family extension: RTF text extraction (sources/rtfmini.py —
    group-nesting control-word parser, destination skipping, codepage +
    unicode escapes). Same NULL-tolerant contract as _pdf_extract_udf."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _udf(contents: pd.Series) -> pd.Series:
        def one(b) -> str | None:
            if b is None:
                return None
            from vectorflow_spark.sources.rtfmini import extract_rtf_text

            return extract_rtf_text(bytes(b))

        return contents.map(one)

    return _udf


def _epub_extract_udf():
    """S-family extension: EPUB spine-ordered chapter extraction
    (sources/epubmini.py, pure stdlib — zip container + OPF spine walk +
    the strip_html_expr text normalization). Same NULL-tolerant contract
    as _pdf_extract_udf; malformed containers raise loudly."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _udf(contents: pd.Series) -> pd.Series:
        def one(b) -> str | None:
            if b is None:
                return None
            from vectorflow_spark.sources.epubmini import extract_epub_text

            return extract_epub_text(bytes(b))

        return contents.map(one)

    return _udf


def strip_markdown_expr(decoded):
    """S4, extractor-path parity: the reference's extractor service runs
    llama_index MarkdownReader and joins the doc texts
    (src/extract/extract.py:78-88) — i.e. markdown SYNTAX is stripped and
    the prose kept. Re-expressed as a Catalyst regexp chain (one
    projection, no Python): fenced code blocks -> removed, inline code ->
    unwrapped, ATX heading markers -> removed, emphasis markers ->
    unwrapped, links/images -> their text, residual blank runs collapsed.
    Patterns avoid lookarounds/backreferences so the DuckDB oracle can
    mirror them verbatim (RE2-compatible)."""
    no_fence = F.regexp_replace(decoded, r"(?s)```[^`]*```", " ")
    no_inline = F.regexp_replace(no_fence, r"`([^`]*)`", r"$1")
    no_head = F.regexp_replace(no_inline, r"(?m)^#{1,6}[ \t]*", "")
    no_img = F.regexp_replace(no_head, r"!\[[^\]]*\]\([^)]*\)", " ")
    links = F.regexp_replace(no_img, r"\[([^\]]*)\]\([^)]*\)", r"$1")
    no_emph = F.regexp_replace(links, r"[*_]{1,3}([^*_]+)[*_]{1,3}", r"$1")
    return F.trim(F.regexp_replace(no_emph, r"[ \t]+", " "))


def markdown_reader_expr(decoded):
    """S4, EXACT extractor-path parity: the reference's extractor service
    feeds .md files through llama_index/llama_hub's public ``MarkdownReader``
    and joins the resulting doc texts with "\\n"
    (reference src/extract/extract.py:78-88). This reimplements that
    reader's published algorithm as ONE zero-shuffle Catalyst expression —
    an ``aggregate`` (fold) over the line array, state =
    (tups, current_header, current_text, started):

      * hyperlinks ``[text](url)`` -> text, images ``![[x]]`` -> removed
        (the reader's remove_hyperlinks/remove_images defaults);
      * lines matching ``^#+\\s`` open a new (header, text) tuple;
      * QUIRK, faithfully kept: a header line arriving while the current
        section's text is still empty is SWALLOWED ENTIRELY (the reader's
        ``continue`` skips the header-variable update too), so of a run of
        back-to-back headers only the first survives;
      * the leading pre-header text (possibly empty) is a header-less tup;
      * on finish, ``#`` chars are stripped from headers (then trimmed),
        ``<...>`` tags are stripped from section bodies, headered sections
        render as "\\n\\n{header}\\n{body}", and everything joins on "\\n".

    Parity is pinned by tests/test_sources_multimodal.py's twin-vs-fold
    property test; the scale story is a pure per-row projection — no
    shuffle, no Python, no UDF."""
    c = F.regexp_replace(decoded, r"\[(.*?)\]\((.*?)\)", "$1")
    c = F.regexp_replace(c, r"!\[\[(.*)\]\]", "")
    lines = F.split(c, "\n", -1)
    init = F.struct(
        F.expr("cast(array() as array<struct<h:string,t:string>>)").alias("tups"),
        F.lit(None).cast("string").alias("h"),
        F.lit("").alias("t"),
        F.lit(False).alias("started"),
    )

    def merge(acc, line):
        is_hdr = line.rlike(r"^#+\s")
        appended = F.concat(
            acc["tups"],
            F.array(
                F.struct(
                    F.when(acc["started"], acc["h"]).otherwise(F.lit(None).cast("string")).alias("h"),
                    acc["t"].alias("t"),
                )
            ),
        )
        accept = F.struct(
            appended.alias("tups"), line.alias("h"), F.lit("").alias("t"), F.lit(True).alias("started")
        )
        grow = F.struct(
            acc["tups"].alias("tups"),
            acc["h"].alias("h"),
            F.concat(acc["t"], line, F.lit("\n")).alias("t"),
            acc["started"].alias("started"),
        )
        return F.when(is_hdr & acc["started"] & (acc["t"] == ""), acc).otherwise(
            F.when(is_hdr, accept).otherwise(grow)
        )

    def fin(acc):
        tups = F.concat(acc["tups"], F.array(F.struct(acc["h"].alias("h"), acc["t"].alias("t"))))
        texts = F.transform(
            tups,
            lambda tp: F.when(
                tp["h"].isNull(), F.regexp_replace(tp["t"], "<.*?>", "")
            ).otherwise(
                F.concat(
                    F.lit("\n\n"),
                    F.trim(F.regexp_replace(tp["h"], "#", "")),
                    F.lit("\n"),
                    F.regexp_replace(tp["t"], "<.*?>", ""),
                )
            ),
        )
        return F.array_join(texts, "\n")

    return F.aggregate(lines, init, merge, fin)


def strip_html_expr(decoded):
    """S5 improvement: drop script/style blocks and tags, collapse space.
    (The reference's HTML path is repr() of the bytes — not replicated.)"""
    no_blocks = F.regexp_replace(decoded, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    no_tags = F.regexp_replace(no_blocks, r"<[^>]+>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def extract_documents(
    raw: DataFrame,
    strip_html: bool = True,
    formats: set[str] | None = None,
    markdown_mode: str = "raw",
) -> DataFrame:
    """Dispatch extraction -> (source, kind, text). Text formats decode
    JVM-side; pdf/docx/epub/rtf route through their pandas UDFs.

    Plan-only — triggers ZERO Spark jobs (the r1 version probed the data
    with two ``limit(1).count()`` jobs to decide whether to attach the
    pdf/docx UDF columns; now they attach unconditionally and the UDF
    input is null-gated JVM-side: ``CASE WHEN kind='pdf' THEN content
    END``, so non-pdf rows ship a null through Arrow — a validity bit,
    not the bytes — and the parser import only happens on a worker that
    actually sees a pdf row).

    ``formats``: optional explicit whitelist (e.g. {"txt", "md", "html"})
    for callers that KNOW the corpus; formats outside it are not wired at
    all, removing even the ArrowEvalPython node from pure-text plans.

    ``markdown_mode``: "raw" = the reference's API path (md bytes decoded
    verbatim, src/api/pipeline flow); "reader" = the extractor-service
    path (llama_hub MarkdownReader section semantics,
    src/extract/extract.py:78-88) via ``markdown_reader_expr`` — still a
    pure projection, no Python."""
    if markdown_mode not in ("raw", "reader"):
        raise ValueError(f"markdown_mode must be 'raw' or 'reader', got {markdown_mode!r}")
    fmts = formats if formats is not None else {"txt", "md", "html", "pdf", "docx", "epub", "rtf"}
    kinds = raw.withColumn("kind", sniff_kind())
    utf8 = F.expr("CASE WHEN is_valid_utf8(content) THEN decode(content, 'UTF-8') END")

    text = F.lit(None).cast("string")
    if "txt" in fmts:
        text = F.when(F.col("kind") == "txt", utf8).otherwise(text)
    if "md" in fmts:
        md_text = markdown_reader_expr(utf8) if markdown_mode == "reader" else utf8
        text = F.when(F.col("kind") == "md", md_text).otherwise(text)
    if "html" in fmts:
        text = F.when(
            F.col("kind") == "html", strip_html_expr(utf8) if strip_html else utf8
        ).otherwise(text)
    if "pdf" in fmts:
        pdf_in = F.when(F.col("kind") == "pdf", F.col("content"))
        text = F.when(F.col("kind") == "pdf", _pdf_extract_udf()(pdf_in)).otherwise(text)
    if "docx" in fmts:
        docx_in = F.when(F.col("kind") == "docx", F.col("content"))
        text = F.when(F.col("kind") == "docx", _docx_extract_udf()(docx_in)).otherwise(text)
    if "epub" in fmts:
        epub_in = F.when(F.col("kind") == "epub", F.col("content"))
        text = F.when(F.col("kind") == "epub", _epub_extract_udf()(epub_in)).otherwise(text)
    if "rtf" in fmts:
        rtf_in = F.when(F.col("kind") == "rtf", F.col("content"))
        text = F.when(F.col("kind") == "rtf", _rtf_extract_udf()(rtf_in)).otherwise(text)

    out = kinds.withColumn("text", text)
    return out.select("source", "kind", "text").filter(F.col("kind") != "unsupported")
