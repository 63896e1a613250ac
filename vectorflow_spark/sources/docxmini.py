"""Minimal pure-stdlib DOCX text extraction + generation (operator S3).

The reference extracts DOCX with python-docx and joins paragraph texts
with "\\n" (reference src/extract/extract.py:74-76). python-docx is
absent here, but a .docx is just a zip holding ``word/document.xml``
(public ECMA-376 / OOXML), so the stdlib covers the whole common case:

* ``extract_docx_text``: unzip, parse ``word/document.xml``, take the
  body's top-level ``w:p`` paragraphs in document order (matching
  python-docx's ``Document.paragraphs``, which likewise skips
  table-nested paragraphs) and concatenate each paragraph's runs —
  ``w:t`` text nodes verbatim, ``w:tab`` as "\\t", ``w:br``/``w:cr`` as
  "\\n" — exactly python-docx's ``Run.text`` mapping. Paragraphs join
  with "\\n".
* ``build_docx``: the inverse writer (zip with [Content_Types].xml,
  _rels, document.xml; one ``w:p`` per input line, tabs as ``w:tab``,
  ``xml:space="preserve"`` so edge whitespace survives). The roundtrip
  contract is ``extract(build(text)) == text``.

``sources/readers.py`` tries python-docx first and falls back here, so
installing the library upgrades fidelity (styles, tables, headers)
without a code change.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _paragraph_text(p) -> str:
    parts: list[str] = []
    for node in p.iter():
        tag = node.tag
        if tag == _W + "t":
            parts.append(node.text or "")
        elif tag == _W + "tab":
            parts.append("\t")
        elif tag in (_W + "br", _W + "cr"):
            parts.append("\n")
    return "".join(parts)


def extract_docx_text(data: bytes) -> str:
    """python-docx parity: "\\n".join(p.text for p in doc.paragraphs)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        xml = z.read("word/document.xml")
    root = ET.fromstring(xml)
    body = root.find(_W + "body")
    if body is None:
        return ""
    return "\n".join(_paragraph_text(p) for p in body.findall(_W + "p"))


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument'
    '/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def _run_xml(segment: str) -> str:
    """One run per tab-separated piece; w:tab elements between them."""
    pieces = segment.split("\t")
    runs: list[str] = []
    for k, piece in enumerate(pieces):
        if k > 0:
            runs.append("<w:r><w:tab/></w:r>")
        # literal CR would be normalized to LF by any conformant XML
        # parser; the character reference survives, keeping CR exact
        body = escape(piece).replace("\r", "&#13;")
        runs.append(f'<w:r><w:t xml:space="preserve">{body}</w:t></w:r>')
    return "".join(runs)


_XML_ILLEGAL = [
    c
    for c in map(chr, range(0x20))
    if c not in "\t\n\r"
]


def build_docx(text: str) -> bytes:
    """Write a well-formed minimal .docx: one paragraph per input line.

    XML 1.0 cannot represent C0 control characters other than tab/LF/CR —
    not even as numeric references — so text containing them is REFUSED
    with ValueError rather than silently producing a container every
    conformant reader (including this module's extractor) would reject."""
    bad = next((c for c in text if c in _XML_ILLEGAL or c in "￾￿"), None)
    if bad is not None:
        raise ValueError(
            f"character U+{ord(bad):04X} is not representable in XML 1.0 / OOXML"
        )
    paras = "".join(f"<w:p>{_run_xml(line)}</w:p>" for line in text.split("\n"))
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{paras}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("word/document.xml", document)
    return buf.getvalue()
