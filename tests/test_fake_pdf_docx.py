"""S2/S3 extraction dispatch exercised end-to-end with fake parser modules.

PyMuPDF / python-docx are not installable in this environment, so the
pdf/docx UDF branches are proven two ways:
  1. without the libraries the stdlib fallbacks take over (pdfmini /
     docxmini): a streamless pdf blob extracts to "" (the honest result
     of a minimal parser, never a silent null), and a corrupt docx
     container raises LOUDLY;
  2. fake ``fitz`` / ``docx`` modules shipped to executors via addPyFile
     implement the reference's extraction shape — PyMuPDF page-concat
     (src/extract/extract.py:93-97) and python-docx paragraph-join
     (:74-76) — and take PRIORITY over the fallbacks, proving the
     installed-library upgrade path.

Real-format extraction through the fallbacks is covered by
tests/test_extract_minimal_formats.py, which must run BEFORE this file
(addPyFile is session-sticky, and the file names sort that way).

Test order inside this file matters too: the fallback tests run first
(pytest preserves definition order).
"""

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.sources.readers import extract_documents, read_raw_files

_FITZ_SRC = '''
"""Fake PyMuPDF shim: parses the test fixture format
%PDF-FAKE\\n<page>\\x0c<page>... into page objects with get_text()."""


class _Page:
    def __init__(self, t):
        self._t = t

    def get_text(self):
        return self._t


class _Doc:
    def __init__(self, pages):
        self._pages = pages

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def __iter__(self):
        return iter(self._pages)


def open(stream=None, filetype=None):
    assert filetype == "pdf"
    text = bytes(stream).decode("utf-8", "replace")
    body = text.split("\\n", 1)[1] if "\\n" in text else ""
    return _Doc([_Page(p) for p in body.split("\\x0c")])
'''

_DOCX_SRC = '''
"""Fake python-docx shim: Document(file_like) with .paragraphs[].text —
the fixture body is newline-separated paragraphs."""


class _Para:
    def __init__(self, t):
        self.text = t


class Document:
    def __init__(self, fobj):
        data = fobj.read().decode("utf-8", "replace")
        self.paragraphs = [_Para(p) for p in data.split("\\n")]
'''


@pytest.fixture(scope="module")
def pdf_docx_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdfdocx")
    # %PDF magic -> sniffed as pdf even without the extension mattering
    (d / "x.pdf").write_bytes(b"%PDF-FAKE\npage one\x0cpage two")
    (d / "y.docx").write_bytes(b"para one\npara two\npara three")
    (d / "z.txt").write_text("plain text passenger")
    return str(d)


def test_stdlib_fallbacks_without_libraries(spark, pdf_docx_dir):
    """No fitz/docx installed: the pdf branch falls back to pdfmini — the
    fixture blob has no content streams, so it extracts to "" (a value,
    never a silent null) — and the docx branch falls back to docxmini,
    which raises loudly on the non-zip fixture instead of guessing."""
    out = extract_documents(read_raw_files(spark, pdf_docx_dir), formats={"txt", "pdf"})
    rows = {r.source: r for r in out.collect()}
    assert rows["x.pdf"].text == ""
    assert rows["z.txt"].text == "plain text passenger"
    with pytest.raises(Exception, match="[Zz]ip"):
        extract_documents(read_raw_files(spark, pdf_docx_dir)).collect()


def test_txt_only_formats_skip_the_gate(spark, pdf_docx_dir):
    """With an explicit format whitelist the pdf/docx UDFs are not wired
    at all, so the same directory extracts its text rows fine."""
    out = extract_documents(
        read_raw_files(spark, pdf_docx_dir), formats={"txt", "md", "html"}
    )
    rows = {r.source: r for r in out.collect()}
    assert rows["z.txt"].text == "plain text passenger"
    assert rows["x.pdf"].text is None and rows["y.docx"].text is None


def test_fake_parsers_prove_dispatch_end_to_end(spark, pdf_docx_dir, tmp_path):
    """addPyFile ships fake fitz/docx to the Python workers; the S2/S3
    branches then run for real: page-concat for pdf, paragraph-join for
    docx, and the txt row passes through the JVM-side decode untouched."""
    (tmp_path / "fitz.py").write_text(_FITZ_SRC)
    (tmp_path / "docx.py").write_text(_DOCX_SRC)
    spark.sparkContext.addPyFile(str(tmp_path / "fitz.py"))
    spark.sparkContext.addPyFile(str(tmp_path / "docx.py"))

    out = {r.source: r for r in extract_documents(read_raw_files(spark, pdf_docx_dir)).collect()}
    assert out["x.pdf"].kind == "pdf"
    assert out["x.pdf"].text == "page onepage two"  # "".join of page texts
    assert out["y.docx"].kind == "docx"
    assert out["y.docx"].text == "para one\npara two\npara three"  # "\n".join
    assert out["z.txt"].text == "plain text passenger"
