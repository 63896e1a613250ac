"""RTF reader/writer contracts (sources/rtfmini.py) + dispatch wiring."""

from __future__ import annotations

import pytest

from vectorflow_spark.sources.rtfmini import build_rtf, extract_rtf_text

EMDASH, LQ, RQ = chr(8212), chr(8220), chr(8221)
EACUTE = chr(233)


@pytest.mark.parametrize(
    "text",
    [
        "Hello world",
        "line1\nline2\n\nline4",
        "tabs\there\tand\tthere",
        "esc \\ { } chars",
        f"unicode {EMDASH} {LQ}quotes{RQ} caf{EACUTE}",
        "cjk " + chr(20013) + chr(25991) + " end",
        "",
    ],
)
def test_build_extract_roundtrip(text):
    assert extract_rtf_text(build_rtf(text)) == text


def _word_style_doc() -> bytes:
    udash = "\\" + "u8212?"  # \uN token assembled to keep the source ASCII
    return (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1\n"
        "{\\fonttbl{\\f0\\froman Times New Roman;}{\\f1\\fswiss Arial;}}\n"
        "{\\colortbl ;\\red255\\green0\\blue0;}\n"
        "{\\info{\\title Secret title}{\\author Nobody}}\n"
        "{\\stylesheet{\\s0 Normal;}}\n"
        "{\\*\\generator Riched20 10.0;}\n"
        "\\f0\\fs24 Plain \\b bold\\b0  and \\i italic\\i0  text.\\par\n"
        "Second\\tab paragraph with \\'e9 and " + udash + " dash.\\par\n"
        "{\\pict\\wmetafile8\\picw100 0102030405}\n"
        "After picture.}"
    ).encode()


def test_word_style_document_extracts_body_only():
    got = extract_rtf_text(_word_style_doc())
    assert got == (
        "Plain bold and italic text.\nSecond\tparagraph with "
        f"{EACUTE} and {EMDASH} dash.\nAfter picture."
    )
    # metadata destinations never leak
    assert "Secret" not in got and "Times" not in got and "Riched" not in got


def test_uc_skip_protocol():
    # \uc2 means TWO fallback chars follow each \uN and must be skipped
    doc = ("{\\rtf1\\ansi\\uc2 A" + "\\" + "u8212" + "??B}").encode()
    assert extract_rtf_text(doc) == "A" + EMDASH + "B"
    # fallback may be an \'hh escape
    doc = ("{\\rtf1\\ansi\\uc1 A" + "\\" + "u8212" + "\\'3fB}").encode()
    assert extract_rtf_text(doc) == "A" + EMDASH + "B"


def test_uc_is_group_scoped():
    doc = ("{\\rtf1\\ansi\\uc1 {\\uc2 " + "\\" + "u8212" + "??}" + "\\" + "u8212" + "?X}").encode()
    assert extract_rtf_text(doc) == EMDASH + EMDASH + "X"


def test_negative_unicode_param_wraps():
    # \u-10179 == U+D83D? no — surrogates aside: -1 wraps to U+FFFF
    doc = ("{\\rtf1\\ansi\\uc1 " + "\\" + "u-1" + "?}").encode()
    assert extract_rtf_text(doc) == chr(0xFFFF)


def test_ansicpg_switches_codepage():
    # cp1251 (Cyrillic): 0xE9 is U+0439
    doc = b"{\\rtf1\\ansi\\ansicpg1251 \\'e9}"
    assert extract_rtf_text(doc) == chr(0x0439)


def test_bin_raw_bytes_skipped_even_with_braces():
    assert extract_rtf_text(b"{\\rtf1\\ansi A\\bin3 }}}B}") == "AB"


def test_raw_newlines_are_not_text():
    assert extract_rtf_text(b"{\\rtf1\\ansi one\r\ntwo}") == "onetwo"


@pytest.mark.parametrize(
    "bad,match",
    [
        (b"hello", "not an RTF"),
        (b"{\\rtf1 unclosed", "unclosed"),
        (b"{\\rtf1 x}}", "unbalanced"),
        (b"{\\rtf1 \\'q}", "hex escape"),
        (b"{\\rtf1 \\bin99 x}", "bin"),
        (b"{\\rtf1 trailing\\", "truncated control"),
        (b"{\\rtf1\\ansicpg99999 x}", "codepage"),
    ],
)
def test_refusals(bad, match):
    with pytest.raises(ValueError, match=match):
        extract_rtf_text(bad)


def test_fuzz_truncation_and_corruption_refuse_cleanly():
    import numpy as np

    blob = _word_style_doc()
    rng = np.random.default_rng(5)
    for cut in range(len(blob)):
        try:
            extract_rtf_text(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(500):
        b = bytearray(blob)
        for _ in range(rng.integers(1, 4)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            extract_rtf_text(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_extract_documents_dispatches_rtf(spark):
    from vectorflow_spark.sources.readers import extract_documents

    blob = build_rtf("From rtf\nsecond")
    rows = spark.createDataFrame(
        [("a.rtf", bytearray(blob)), ("noext", bytearray(blob))],
        "source string, content binary",
    )
    out = {r.source: r for r in extract_documents(rows).collect()}
    assert out["a.rtf"].kind == "rtf" and out["a.rtf"].text == "From rtf\nsecond"
    assert out["noext"].kind == "rtf" and out["noext"].text == "From rtf\nsecond"


def test_surrogate_pair_unicode_escapes_roundtrip():
    """Word encodes astral chars (emoji, rare CJK) as \\uN surrogate
    PAIRS; the reader must combine them and the writer must emit them —
    a lone half refuses."""
    emoji = chr(0x1F600)
    assert extract_rtf_text(build_rtf(f"hi {emoji} there")) == f"hi {emoji} there"
    # Word-style raw pair: \u-10179?\u-8704? == U+1F600
    doc = ("{\\rtf1\\ansi\\uc1 hi " + "\\" + "u-10179?" + "\\" + "u-8704? there}").encode()
    got = extract_rtf_text(doc)
    assert got == f"hi {emoji} there"
    got.encode("utf-8")  # no lone surrogates may survive extraction
    with pytest.raises(ValueError, match="surrogate"):
        extract_rtf_text(("{\\rtf1\\ansi\\uc1 x" + "\\" + "u-10179?y}").encode())
    with pytest.raises(ValueError, match="surrogate"):
        extract_rtf_text(("{\\rtf1\\ansi\\uc1 x" + "\\" + "u-8704?y}").encode())
    with pytest.raises(ValueError, match="surrogate"):
        build_rtf("lone " + chr(0xD800))


def test_c1_codepoints_roundtrip_exactly():
    """U+0080-U+009F disagree with cp1252 bytes, so the writer must use
    \\uN for them — including the five cp1252 holes."""
    c1 = "".join(chr(o) for o in range(0x80, 0xA0))
    assert extract_rtf_text(build_rtf(c1)) == c1
