"""EPUB container contracts (sources/epubmini.py) + the extract dispatch
wiring (readers.sniff_kind / extract_documents)."""

from __future__ import annotations

import io
import zipfile

import pytest

from vectorflow_spark.sources.epubmini import (
    build_epub,
    epub_meta,
    extract_epub_text,
    looks_like_epub,
)


def _zip(entries: list[tuple[str, str | bytes]], store_first: bool = True) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i, (name, data) in enumerate(entries):
            comp = zipfile.ZIP_STORED if (i == 0 and store_first) else zipfile.ZIP_DEFLATED
            zf.writestr(zipfile.ZipInfo(name), data, compress_type=comp)
    return buf.getvalue()


CONTAINER = (
    '<?xml version="1.0"?><container version="1.0" '
    'xmlns="urn:oasis:names:tc:opendocument:xmlns:container"><rootfiles>'
    '<rootfile full-path="{opf}" media-type="application/oebps-package+xml"/>'
    "</rootfiles></container>"
)


def test_roundtrip_text_entities_and_chapter_order():
    blob = build_epub(["A <b> & B\nline 2", "Second"], title="T")
    assert extract_epub_text(blob) == "A <b> & B line 2\nSecond"
    m = epub_meta(blob)
    assert m["title"] == "T" and m["n_spine"] == 2


def test_spine_order_wins_over_zip_and_manifest_order():
    # chapters stored z-first, manifest listed b-first, spine says a then b
    opf = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        "<metadata/>"
        '<manifest><item id="b" href="zz.xhtml" media-type="application/xhtml+xml"/>'
        '<item id="a" href="aa.xhtml" media-type="application/xhtml+xml"/></manifest>'
        '<spine><itemref idref="a"/><itemref idref="b"/></spine></package>'
    )
    blob = _zip(
        [
            ("mimetype", "application/epub+zip"),
            ("zz.xhtml", "<html><body><p>LAST</p></body></html>"),
            ("aa.xhtml", "<html><body><p>FIRST</p></body></html>"),
            ("META-INF/container.xml", CONTAINER.format(opf="pkg.opf")),
            ("pkg.opf", opf),
        ]
    )
    assert extract_epub_text(blob) == "FIRST\nLAST"


def test_opf_subdirectory_hrefs_resolve_relative_to_opf():
    opf = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0"><metadata/>'
        '<manifest><item id="c" href="text/c.xhtml" media-type="application/xhtml+xml"/>'
        '</manifest><spine><itemref idref="c"/></spine></package>'
    )
    blob = _zip(
        [
            ("mimetype", "application/epub+zip"),
            ("META-INF/container.xml", CONTAINER.format(opf="OPS/pkg.opf")),
            ("OPS/pkg.opf", opf),
            ("OPS/text/c.xhtml", "<html><body>deep</body></html>"),
        ]
    )
    assert extract_epub_text(blob) == "deep"


def test_non_xhtml_spine_items_skipped():
    opf = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0"><metadata/>'
        '<manifest><item id="s" href="x.svg" media-type="image/svg+xml"/>'
        '<item id="c" href="c.xhtml" media-type="application/xhtml+xml"/></manifest>'
        '<spine><itemref idref="s"/><itemref idref="c"/></spine></package>'
    )
    blob = _zip(
        [
            ("mimetype", "application/epub+zip"),
            ("META-INF/container.xml", CONTAINER.format(opf="pkg.opf")),
            ("pkg.opf", opf),
            ("c.xhtml", "<html><body>only text</body></html>"),
            ("x.svg", "<svg/>"),
        ]
    )
    assert extract_epub_text(blob) == "only text"


def test_head_script_style_blocks_dropped():
    opf = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0"><metadata/>'
        '<manifest><item id="c" href="c.xhtml" media-type="application/xhtml+xml"/>'
        "</manifest><spine><itemref idref='c'/></spine></package>"
    )
    markup = (
        "<html><head><title>NOISE</title><style>p{}</style></head>"
        "<body><script>var x=1;</script><p>kept</p></body></html>"
    )
    blob = _zip(
        [
            ("mimetype", "application/epub+zip"),
            ("META-INF/container.xml", CONTAINER.format(opf="pkg.opf")),
            ("pkg.opf", opf),
            ("c.xhtml", markup),
        ]
    )
    assert extract_epub_text(blob) == "kept"


@pytest.mark.parametrize(
    "mutate,match",
    [
        (lambda e: [("mimetype", "text/plain")] + e[1:], "not application/epub"),
        (lambda e: e[1:], "missing mimetype"),
        (lambda e: [x for x in e if "container" not in x[0]], "container.xml"),
        (lambda e: [x for x in e if not x[0].endswith(".opf")], "not in archive"),
    ],
)
def test_malformed_containers_refuse(mutate, match):
    opf = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0"><metadata/>'
        '<manifest><item id="c" href="c.xhtml" media-type="application/xhtml+xml"/>'
        "</manifest><spine><itemref idref='c'/></spine></package>"
    )
    entries = [
        ("mimetype", "application/epub+zip"),
        ("META-INF/container.xml", CONTAINER.format(opf="pkg.opf")),
        ("pkg.opf", opf),
        ("c.xhtml", "<html><body>x</body></html>"),
    ]
    with pytest.raises(ValueError, match=match):
        extract_epub_text(_zip(mutate(entries)))


def test_spine_without_manifest_item_and_missing_chapter_refuse():
    base = [
        ("mimetype", "application/epub+zip"),
        ("META-INF/container.xml", CONTAINER.format(opf="pkg.opf")),
    ]
    opf_bad_ref = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0"><metadata/>'
        "<manifest/><spine><itemref idref='ghost'/></spine></package>"
    )
    with pytest.raises(ValueError, match="no manifest item"):
        extract_epub_text(_zip(base + [("pkg.opf", opf_bad_ref)]))
    opf_missing_file = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0"><metadata/>'
        '<manifest><item id="c" href="gone.xhtml" media-type="application/xhtml+xml"/>'
        "</manifest><spine><itemref idref='c'/></spine></package>"
    )
    with pytest.raises(ValueError, match="gone.xhtml"):
        extract_epub_text(_zip(base + [("pkg.opf", opf_missing_file)]))


def test_encrypted_epub_refuses_not_implemented():
    blob = build_epub(["secret"])
    buf = io.BytesIO(blob)
    with zipfile.ZipFile(buf, "a") as zf:
        zf.writestr("META-INF/encryption.xml", "<encryption/>")
    with pytest.raises(NotImplementedError, match="DRM"):
        extract_epub_text(buf.getvalue())


def test_looks_like_epub_probe():
    assert looks_like_epub(build_epub(["x"]))
    # a docx-like zip (deflated first entry, different name) must NOT match
    other = _zip([("word/document.xml", "<w:document/>")], store_first=False)
    assert not looks_like_epub(other)
    assert not looks_like_epub(b"%PDF-1.4")


def test_extract_documents_dispatches_epub(spark):
    from vectorflow_spark.sources.readers import extract_documents

    epub = build_epub(["From epub\nsecond"])
    docx_like = _zip([("mimetype", "application/epub+zip")], store_first=True)
    rows = spark.createDataFrame(
        [
            ("a.epub", bytearray(epub)),
            ("noext", bytearray(epub)),  # magic-only dispatch
            ("b.txt", bytearray(b"plain text")),
        ],
        "source string, content binary",
    )
    out = {r.source: r for r in extract_documents(rows).collect()}
    assert out["a.epub"].kind == "epub" and out["a.epub"].text == "From epub second"
    assert out["noext"].kind == "epub" and out["noext"].text == "From epub second"
    assert out["b.txt"].kind == "txt" and out["b.txt"].text == "plain text"
    del docx_like
