"""Minimal EPUB (2/3) reader + writer on stdlib zipfile/ElementTree.

EPUB is the remaining mainstream document container after txt/pdf/docx/
md/html (S1-S5): a ZIP whose first entry is the STORED ``mimetype``
(``application/epub+zip``), with ``META-INF/container.xml`` pointing at
an OPF package file whose ``<spine>`` lists the reading order of XHTML
chapter files.  The reference pipeline treats every upload as one of its
five extractable types (src/extract/extract.py); this module extends the
S-family the same way docxmini extends S3 — a real container parsed
correctly or refused loudly, no external dependency.

Extraction semantics: chapters are read in SPINE order (not zip or
manifest order), scripts/styles dropped, tags stripped, entities
unescaped, whitespace collapsed — the same normalization
``readers.strip_html_expr`` applies to raw HTML, so downstream chunkers
see consistent text across both paths.

Writer produces a spec-shaped EPUB 3 (stored mimetype first, container
indirection, OPF with dc:title/dc:identifier/dc:language, nav document,
one XHTML file per chapter) that reads back through this extractor and
any conforming reader.

Contract: malformed containers raise ``ValueError`` (wrong/missing
mimetype entry, missing container.xml/OPF/spine, spine item without a
manifest entry, missing chapter file); DRM'd (encrypted) EPUBs raise
``NotImplementedError``.
"""

from __future__ import annotations

import html
import io
import posixpath
import re
import struct
import xml.etree.ElementTree as ET
import zipfile

_CONTAINER_NS = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF_NS = "{http://www.idpf.org/2007/opf}"
_DC_NS = "{http://purl.org/dc/elements/1.1/}"

def _read_entry(zf: zipfile.ZipFile, name: str) -> bytes:
    """Read one archive member, converting the zipfile/zlib corruption
    zoo (BadZipFile, zlib.error, truncated streams) into the module's
    ValueError refusal contract."""
    import zlib

    try:
        return zf.read(name)
    except (zipfile.BadZipFile, zlib.error, EOFError, OSError, KeyError) as e:
        raise ValueError(f"EPUB: corrupt or missing archive member {name!r}: {e}") from e


def _parse_xml(payload: bytes, what: str) -> ET.Element:
    try:
        return ET.fromstring(payload)
    except ET.ParseError as e:
        raise ValueError(f"EPUB: malformed {what}: {e}") from e


_WS = re.compile(r"\s+", re.ASCII)
_TAG = re.compile(r"<[^>]+>")
_BLOCKS = re.compile(r"(?is)<(script|style|head)[^>]*>.*?</\1>")


def _xhtml_to_text(markup: str) -> str:
    """The strip_html_expr normalization, byte-compatible: drop
    script/style blocks, strip tags, unescape entities, collapse
    ASCII whitespace."""
    no_blocks = _BLOCKS.sub(" ", markup)
    no_tags = _TAG.sub(" ", no_blocks)
    return _WS.sub(" ", html.unescape(no_tags)).strip()


def extract_epub_text(data: bytes, joiner: str = "\n") -> str:
    """EPUB bytes -> extracted text, chapters joined in spine order."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a zip container: {e}") from e
    names = set(zf.namelist())
    if "mimetype" not in names:
        raise ValueError("EPUB: missing mimetype entry")
    if _read_entry(zf, "mimetype").strip() != b"application/epub+zip":
        raise ValueError("EPUB: mimetype entry is not application/epub+zip")
    if "META-INF/encryption.xml" in names:
        raise NotImplementedError("EPUB: encrypted (DRM) container not supported")
    if "META-INF/container.xml" not in names:
        raise ValueError("EPUB: missing META-INF/container.xml")

    container = _parse_xml(_read_entry(zf, "META-INF/container.xml"), "container.xml")
    rootfile = container.find(f".//{_CONTAINER_NS}rootfile")
    if rootfile is None or not rootfile.get("full-path"):
        raise ValueError("EPUB: container.xml has no rootfile full-path")
    opf_path = rootfile.get("full-path")
    if opf_path not in names:
        raise ValueError(f"EPUB: OPF package file {opf_path!r} not in archive")
    opf_dir = posixpath.dirname(opf_path)

    opf = _parse_xml(_read_entry(zf, opf_path), "OPF package")
    manifest = {}
    for item in opf.iter(f"{_OPF_NS}item"):
        manifest[item.get("id")] = (item.get("href"), item.get("media-type", ""))
    spine = opf.find(f"{_OPF_NS}spine")
    if spine is None:
        raise ValueError("EPUB: OPF has no spine")

    chapters = []
    for itemref in spine.iter(f"{_OPF_NS}itemref"):
        idref = itemref.get("idref")
        if idref not in manifest:
            raise ValueError(f"EPUB: spine idref {idref!r} has no manifest item")
        href, media_type = manifest[idref]
        if "xhtml" not in media_type and "html" not in media_type:
            continue  # spec allows non-XHTML spine items (e.g. SVG); skip
        path = posixpath.normpath(posixpath.join(opf_dir, href)) if opf_dir else href
        if path not in names:
            raise ValueError(f"EPUB: spine chapter {path!r} not in archive")
        chapters.append(_xhtml_to_text(_read_entry(zf, path).decode("utf-8")))
    return joiner.join(chapters)


def epub_meta(data: bytes) -> dict:
    """Header-level metadata: title/identifier/language + chapter count
    (spine length), without extracting text."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a zip container: {e}") from e
    container = _parse_xml(_read_entry(zf, "META-INF/container.xml"), "container.xml")
    rootfile = container.find(f".//{_CONTAINER_NS}rootfile")
    if rootfile is None or not rootfile.get("full-path"):
        raise ValueError("EPUB: container.xml has no rootfile full-path")
    opf_path = rootfile.get("full-path")
    opf = _parse_xml(_read_entry(zf, opf_path), "OPF package")

    def dc(tag: str) -> str | None:
        el = opf.find(f".//{_DC_NS}{tag}")
        return el.text if el is not None else None

    spine = opf.find(f"{_OPF_NS}spine")
    return {
        "title": dc("title"),
        "identifier": dc("identifier"),
        "language": dc("language"),
        "n_spine": len(list(spine.iter(f"{_OPF_NS}itemref"))) if spine is not None else 0,
    }


def looks_like_epub(data: bytes) -> bool:
    """Cheap magic probe without opening the zip directory: a conforming
    EPUB's FIRST local file header is the STORED ``mimetype`` entry, so
    the mime string sits at fixed offset 38 (30-byte header + 8-byte
    name)."""
    if data[:4] != b"PK\x03\x04" or len(data) < 58:
        return False
    (name_len,) = struct.unpack_from("<H", data, 26)
    return (
        name_len == 8
        and data[30:38] == b"mimetype"
        and data[38:58].startswith(b"application/epub+zip")
    )


def _escape(s: str) -> str:
    return html.escape(s, quote=False)


def build_epub(
    chapters: list[str],
    title: str = "untitled",
    identifier: str = "urn:uuid:00000000-0000-0000-0000-000000000000",
    language: str = "en",
) -> bytes:
    """Chapter texts -> EPUB 3 bytes (deterministic: fixed timestamps,
    stored mimetype first). Each chapter becomes one XHTML file with one
    ``<p>`` per input line."""
    if not chapters:
        raise ValueError("EPUB needs at least one chapter")
    buf = io.BytesIO()
    stamp = (1980, 1, 1, 0, 0, 0)
    with zipfile.ZipFile(buf, "w") as zf:
        mi = zipfile.ZipInfo("mimetype", date_time=stamp)
        zf.writestr(mi, "application/epub+zip", compress_type=zipfile.ZIP_STORED)

        def add(name: str, text: str) -> None:
            zi = zipfile.ZipInfo(name, date_time=stamp)
            zf.writestr(zi, text, compress_type=zipfile.ZIP_DEFLATED)

        add(
            "META-INF/container.xml",
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/></rootfiles></container>',
        )
        items, refs = [], []
        for i in range(len(chapters)):
            items.append(
                f'<item id="ch{i}" href="ch{i}.xhtml" media-type="application/xhtml+xml"/>'
            )
            refs.append(f'<itemref idref="ch{i}"/>')
        nav = (
            '<item id="nav" href="nav.xhtml" media-type="application/xhtml+xml" '
            'properties="nav"/>'
        )
        add(
            "OEBPS/content.opf",
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
            'unique-identifier="pub-id">'
            '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
            f'<dc:identifier id="pub-id">{_escape(identifier)}</dc:identifier>'
            f"<dc:title>{_escape(title)}</dc:title>"
            f"<dc:language>{_escape(language)}</dc:language>"
            "</metadata>"
            f"<manifest>{nav}{''.join(items)}</manifest>"
            f"<spine>{''.join(refs)}</spine></package>",
        )
        add(
            "OEBPS/nav.xhtml",
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<html xmlns="http://www.w3.org/1999/xhtml" '
            'xmlns:epub="http://www.idpf.org/2007/ops"><head><title>nav</title></head>'
            '<body><nav epub:type="toc"><ol>'
            + "".join(
                f'<li><a href="ch{i}.xhtml">Chapter {i + 1}</a></li>'
                for i in range(len(chapters))
            )
            + "</ol></nav></body></html>",
        )
        for i, text in enumerate(chapters):
            paras = "".join(f"<p>{_escape(line)}</p>" for line in text.split("\n"))
            add(
                f"OEBPS/ch{i}.xhtml",
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<html xmlns="http://www.w3.org/1999/xhtml">'
                f"<head><title>ch{i}</title></head><body>{paras}</body></html>",
            )
    return buf.getvalue()
