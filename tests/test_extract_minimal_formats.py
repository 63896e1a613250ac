"""Real-format S2/S3 extraction through the stdlib fallbacks, end-to-end.

Real (generated, well-formed) PDF and DOCX files flow binaryFile-scan ->
sniff -> extract_documents with NO fake-parser seam: the pdf branch runs
sources/pdfmini.py (Flate streams, Tj/TJ operators), the docx branch
runs sources/docxmini.py (zip + OOXML). Content is checked against the
known fixture text, closing the round-2 gap where the pdf/docx UDFs had
never parsed a real file.

NOTE ON FILE NAME: this module must sort BEFORE test_fake_pdf_docx.py —
that file addPyFile's fake fitz/docx modules into the session-sticky
Python path, after which the import-first dispatch would route these
real files into the fakes.
"""

from __future__ import annotations

import pytest

from vectorflow_spark.sources.docxmini import build_docx, extract_docx_text
from vectorflow_spark.sources.pdfmini import build_pdf, extract_pdf_text
from vectorflow_spark.sources.readers import extract_documents, read_raw_files

PDF_PAGES = [
    "First page with (parens), a back\\slash and unicode — naïve café.",
    "Second page\nhas two lines",
]
DOCX_TEXT = "Paragraph one\nParagraph two\twith a tab\n\nAfter an empty paragraph"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("real_formats")
    (d / "report.pdf").write_bytes(build_pdf(PDF_PAGES))
    (d / "memo.docx").write_bytes(build_docx(DOCX_TEXT))
    (d / "notes.txt").write_text("control row")
    return str(d)


# ---------------------------------------------------------------------------
# Pure-python roundtrip properties (no Spark)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "pages",
    [
        ["hello world"],
        ["line1\nline2\nline3"],
        ["parens (nested (deep)) and \\ backslash"],
        ["unicode: naïve café — ünïcødé ✓"],
        ["", "second page"],
        ["ends with newline\n", "\nleading newline"],
        ["tab\there", "carriage\rreturn"],
    ],
)
def test_pdf_roundtrip_exact(pages):
    """extract(build(pages)) == concat(page + '\\n') — the page-concat
    contract of reference src/extract/extract.py:93-97."""
    assert extract_pdf_text(build_pdf(pages)) == "".join(p + "\n" for p in pages)


def test_pdf_uncompressed_and_handcrafted_operators():
    import zlib

    assert extract_pdf_text(build_pdf(["plain"], compress=False)) == "plain\n"
    # TJ array with kerning numbers + hex string + T* line move
    content = b"BT [(He) -120 (llo)] TJ T* <776f726c64> Tj ET"
    blob = b"1 0 obj stream\n" + zlib.compress(content) + b"\nendstream endobj"
    assert extract_pdf_text(blob) == "Hello\nworld\n"


def test_pdf_ignores_non_text_streams():
    import zlib

    image = b"not text at all \x00\x01\x02"
    blob = (
        b"stream\n" + zlib.compress(image) + b"\nendstream\n"
        b"stream\n" + zlib.compress(b"BT (visible) Tj ET") + b"\nendstream"
    )
    assert extract_pdf_text(blob) == "visible\n"


@pytest.mark.parametrize(
    "text",
    ["hello", "multi\nline", "tab\there", "", "edge  spaces ", "<xml & stuff>", "a\n\nb"],
)
def test_docx_roundtrip_exact(text):
    """extract(build(text)) == text — the paragraph-join contract of
    reference src/extract/extract.py:74-76 (python-docx parity)."""
    assert extract_docx_text(build_docx(text)) == text


# ---------------------------------------------------------------------------
# End-to-end through the Spark dispatch — no seam, real files
# ---------------------------------------------------------------------------


def test_real_pdf_and_docx_extract_end_to_end(spark, fixture_dir):
    out = {r.source: r for r in extract_documents(read_raw_files(spark, fixture_dir)).collect()}
    assert out["report.pdf"].kind == "pdf"
    assert out["report.pdf"].text == "".join(p + "\n" for p in PDF_PAGES)
    assert out["memo.docx"].kind == "docx"
    assert out["memo.docx"].text == DOCX_TEXT
    assert out["notes.txt"].text == "control row"


def test_streaming_extract_exactly_once_per_file(spark, tmp_path):
    """binaryFile as a STREAMING source through the same extract dispatch:
    drain once (txt + real pdf + real docx), add a file, drain again —
    the checkpoint guarantees each file extracts exactly once, and the
    pdf row went through the stdlib parser inside a micro-batch."""
    from vectorflow_spark.streaming.pipeline import streaming_extract

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("streamed text")
    (src / "b.pdf").write_bytes(build_pdf(["streamed pdf page"]))
    (src / "c.docx").write_bytes(build_docx("streamed docx para"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    q = streaming_extract(spark, str(src), out, ckpt)
    q.awaitTermination(120)
    rows = {r.source: r for r in spark.read.parquet(out).collect()}
    assert rows["a.txt"].text == "streamed text"
    assert rows["b.pdf"].text == "streamed pdf page\n"
    assert rows["c.docx"].text == "streamed docx para"

    (src / "d.txt").write_text("late arrival")
    q2 = streaming_extract(spark, str(src), out, ckpt)
    q2.awaitTermination(120)
    again = spark.read.parquet(out).collect()
    assert len(again) == 4  # a/b/c NOT re-extracted, d appended once
    assert {r.source: r.text for r in again}["d.txt"] == "late arrival"


def test_extensionless_real_pdf_sniffs_and_extracts(spark, tmp_path):
    """Magic-byte sniff (S8) + real extraction compose: a real PDF with no
    extension still routes through pdfmini."""
    (tmp_path / "blob").write_bytes(build_pdf(["sniffed body"]))
    out = extract_documents(read_raw_files(spark, str(tmp_path))).collect()
    [row] = out
    assert row.kind == "pdf" and row.text == "sniffed body\n"
