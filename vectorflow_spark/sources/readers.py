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
    return (
        F.when(lowered.endswith(".pdf"), F.lit("pdf"))
        .when(lowered.endswith(".docx"), F.lit("docx"))
        .when(lowered.endswith(".md"), F.lit("md"))
        .when(lowered.endswith(".html"), F.lit("html"))
        .when(lowered.endswith(".txt"), F.lit("txt"))
        .when(head == _PDF_MAGIC, F.lit("pdf"))
        .when(head == _ZIP_MAGIC, F.lit("docx"))
        .when(decodable, F.lit("txt"))
        .otherwise(F.lit("unsupported"))
    )


def _pdf_extract_udf():
    """S2: PyMuPDF page-concat extraction (reference joins page texts,
    src/extract/extract.py:93-97). Import-gated: fitz is absent here."""
    import pandas as pd
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _udf(contents: pd.Series) -> pd.Series:
        try:
            import fitz  # PyMuPDF
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("PyMuPDF (fitz) not installed — cannot extract PDF") from e

        def one(b: bytes) -> str:
            with fitz.open(stream=b, filetype="pdf") as doc:
                return "".join(page.get_text() for page in doc)

        return contents.map(one)

    return _udf


def _docx_extract_udf():
    """S3: python-docx paragraph-join (reference src/extract/extract.py:74-76)."""
    import io

    import pandas as pd
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _udf(contents: pd.Series) -> pd.Series:
        try:
            import docx
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("python-docx not installed — cannot extract DOCX") from e

        def one(b: bytes) -> str:
            d = docx.Document(io.BytesIO(b))
            return "\n".join(p.text for p in d.paragraphs)

        return contents.map(one)

    return _udf


def strip_html_expr(decoded):
    """S5 improvement: drop script/style blocks and tags, collapse space.
    (The reference's HTML path is repr() of the bytes — not replicated.)"""
    no_blocks = F.regexp_replace(decoded, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    no_tags = F.regexp_replace(no_blocks, r"<[^>]+>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def extract_documents(raw: DataFrame, strip_html: bool = True) -> DataFrame:
    """Dispatch extraction -> (source, kind, text). Text formats decode
    JVM-side; pdf/docx branch to their UDFs only for matching rows (the
    CASE keeps non-matching rows off the Python path)."""
    kinds = raw.withColumn("kind", sniff_kind())
    utf8 = F.expr("CASE WHEN is_valid_utf8(content) THEN decode(content, 'UTF-8') END")

    text = (
        F.when(F.col("kind").isin("txt", "md"), utf8)
        .when(F.col("kind") == "html", strip_html_expr(utf8) if strip_html else utf8)
        .otherwise(F.lit(None))
    )

    out = kinds.withColumn("text", text)

    # route pdf/docx rows through their gated UDFs only if present
    has_pdf = kinds.filter(F.col("kind") == "pdf").limit(1).count() > 0
    has_docx = kinds.filter(F.col("kind") == "docx").limit(1).count() > 0
    if has_pdf:
        out = out.withColumn(
            "text",
            F.when(F.col("kind") == "pdf", _pdf_extract_udf()(F.col("content"))).otherwise(
                F.col("text")
            ),
        )
    if has_docx:
        out = out.withColumn(
            "text",
            F.when(F.col("kind") == "docx", _docx_extract_udf()(F.col("content"))).otherwise(
                F.col("text")
            ),
        )
    return out.select("source", "kind", "text").filter(F.col("kind") != "unsupported")
