"""Simple-font encoding fidelity (PDF 32000-1 §9.6.6 + Appendix D):
/WinAnsiEncoding, /MacRomanEncoding, /Differences arrays with Adobe Glyph
List names, and 1-byte /ToUnicode CMaps.  Real non-CJK PDFs carry these on
almost every page; the reference reads them via MuPDF's builtin tables
(text_extractor.py:51-53).  Until round 5 the kernel decoded every simple
font as Latin-1 — correct for the fixture dialect, wrong for bytes
0x80-0x9F under WinAnsi and for any /Differences remap.

Circularity guards: WinAnsi/MacRoman table positions are pinned against
HAND-TRANSCRIBED byte vectors (not codec calls on both sides at test
time); the generator's classic glyph names live in a SEPARATE table
(_GEN_GLYPH_NAMES) from the kernel's _AGL_SUBSET.
"""

import random
import sys
import zlib
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.pdf import (
    PdfError,
    _AGL_SUBSET,
    _glyph_to_unicode,
    parse_pdf,
)
from pdf_extractor_spark.sources.synth import (
    _CJK_POOLS,
    _diff_encoding_assignment,
    _GEN_GLYPH_NAMES,
    _simple_tounicode_cmap,
    make_pdf,
)

#: Hand-pinned (encoding, byte, expected char) vectors transcribed from
#: the published tables (PDF Appendix D / Windows cp1252 / Mac OS Roman).
_PINNED = [
    ("WinAnsiEncoding", 0x80, "€"), ("WinAnsiEncoding", 0x93, "“"),
    ("WinAnsiEncoding", 0x99, "™"), ("WinAnsiEncoding", 0x9C, "œ"),
    ("WinAnsiEncoding", 0xE9, "é"),
    ("MacRomanEncoding", 0x8E, "é"), ("MacRomanEncoding", 0xA5, "•"),
    ("MacRomanEncoding", 0xD8, "ÿ"), ("MacRomanEncoding", 0xDB, "€"),
]

#: StandardEncoding needs the dict form (/BaseEncoding) — pinned
#: separately.  The 0x27/0x60 quote slots and the ligature/dash region
#: are where Standard differs most from every Latin-1-ish table.
_PINNED_STANDARD = [
    (0x27, "’"), (0x60, "‘"), (0xA9, "'"), (0xC1, "`"),
    (0xA4, "⁄"), (0xAE, "ﬁ"), (0xAF, "ﬂ"), (0xB1, "–"), (0xD0, "—"),
    (0xBD, "‰"), (0xE8, "Ł"), (0xFA, "œ"), (0xFB, "ß"),
    (0xB5, "�"), (0xE0, "�"),  # unassigned slots are notdef
]


def _one_font_pdf(font_obj: bytes, show_hex: bytes) -> bytes:
    """Minimal classic PDF: one page, one show string, the given font."""
    content = b"BT /F1 12 Tf 72 720 Td <" + show_hex + b"> Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: font_obj,
        4: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>",
        5: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content),
                                                         content),
    }
    out = [b"%PDF-1.4\n"]
    offsets = {}
    pos = len(out[0])
    for num in sorted(objs):
        blob = b"%d 0 obj\n%s\nendobj\n" % (num, objs[num])
        offsets[num] = pos
        out.append(blob)
        pos += len(blob)
    xref = [b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)]
    for num in sorted(objs):
        xref.append(b"%010d 00000 n \n" % offsets[num])
    out.append(b"".join(xref))
    out.append(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
               % (len(objs) + 1, pos))
    return b"".join(out)


class TestPinnedTables:
    @pytest.mark.parametrize("enc,byte,expected", _PINNED)
    def test_vector(self, enc, byte, expected):
        pdf = _one_font_pdf(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /" + enc.encode() + b" >>",
            b"%02x" % byte)
        assert parse_pdf(pdf)["pages"][0]["text"] == expected

    def test_latin1_default_unchanged(self):
        # no /Encoding -> the historical Latin-1 default: 0x93 is the
        # C1 control U+0093, NOT the WinAnsi left quote
        pdf = _one_font_pdf(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            b"93")
        assert parse_pdf(pdf)["pages"][0]["text"] == "\x93"

    @pytest.mark.parametrize("byte,expected", _PINNED_STANDARD)
    def test_standard_encoding_vector(self, byte, expected):
        pdf = _one_font_pdf(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman "
            b"/Encoding << /BaseEncoding /StandardEncoding >> >>",
            b"%02x" % byte)
        assert parse_pdf(pdf)["pages"][0]["text"] == expected

    def test_symbol_builtin_still_error_routes(self):
        pdf = _one_font_pdf(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Symbol "
            b"/Encoding /SymbolEncoding >>", b"41")
        with pytest.raises(PdfError):
            parse_pdf(pdf)

    def test_generator_std_encoder_agrees_with_kernel(self):
        # two independent Appendix-D transcriptions must invert each other
        from pdf_extractor_spark.kernels.pdf import (
            _standard_encoding_table,
        )
        from pdf_extractor_spark.sources.synth import _STD_ENCODE

        table = _standard_encoding_table()
        for ch, code in _STD_ENCODE.items():
            assert table[code] == ch, hex(code)

    def test_differences_walk(self):
        # integer resets the code counter; names consume consecutive codes
        pdf = _one_font_pdf(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding "
            b"/Differences [ 65 /eacute /uni65E5 200 /Euro ] >> >>",
            b"4142c8")
        assert parse_pdf(pdf)["pages"][0]["text"] == "é日€"

    def test_unknown_glyph_name_is_notdef(self):
        pdf = _one_font_pdf(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /Differences [ 65 /nosuchglyphname ] >> >>",
            b"41")
        assert parse_pdf(pdf)["pages"][0]["text"] == "�"


class TestGlyphNames:
    def test_classic_names(self):
        assert _glyph_to_unicode("eacute") == "é"
        assert _glyph_to_unicode("Euro") == "€"
        assert _glyph_to_unicode("quotedblleft") == "“"
        assert _glyph_to_unicode("germandbls") == "ß"
        assert _glyph_to_unicode("seven") == "7"
        assert _glyph_to_unicode("asciitilde") == "~"

    def test_uni_forms(self):
        assert _glyph_to_unicode("uni65E5") == "日"
        assert _glyph_to_unicode("uni0041") == "A"
        assert _glyph_to_unicode("uniD83DDE00") == "😀"  # multi-unit form
        assert _glyph_to_unicode("u1F600") == "😀"
        assert _glyph_to_unicode("u0041") == "A"

    def test_bad_names_are_none(self):
        for bad in ("notaname", "uniXYZW", "uni123", "uD800", "u12345678"):
            assert _glyph_to_unicode(bad) is None

    def test_generator_table_agrees_with_kernel_subset(self):
        # independent transcriptions must agree where they overlap
        for ch, name in _GEN_GLYPH_NAMES.items():
            assert chr(_AGL_SUBSET[name]) == ch


class TestEndToEnd:
    @pytest.mark.parametrize("font,charset", [
        ("simple-winansi", "win"), ("simple-macroman", "win"),
        ("simple-diff", "latin"), ("simple-diff", "ja"),
        ("simple-tu", "win"), ("simple-tu", "ja"),
        ("simple-standard", "std"),
    ])
    @pytest.mark.parametrize("dialect", ["classic", "modern"])
    def test_twin_text_identical(self, font, charset, dialect):
        doc_id = zlib.crc32(f"{font}:{charset}:{dialect}".encode()) % 1000
        ru = parse_pdf(make_pdf(
            random.Random(f"senc-twin:{font}:{charset}:{doc_id}"), doc_id,
            dialect=dialect, font="cid-ucs2", charset=charset)[0])
        rc = parse_pdf(make_pdf(
            random.Random(f"senc-twin:{font}:{charset}:{doc_id}"), doc_id,
            dialect=dialect, font=font, charset=charset)[0])
        assert [p["text"] for p in ru["pages"]] == \
               [p["text"] for p in rc["pages"]]
        assert ru["n_pages"] == rc["n_pages"]
        assert ru["metadata"] == rc["metadata"]

    def test_std_pool_is_expressible_and_nonvacuous(self):
        from pdf_extractor_spark.sources.synth import (
            _CJK_POOLS,
            _std_encode_string,
        )

        for w in _CJK_POOLS["std"]:
            _std_encode_string(w)
            _std_encode_string(w[0].upper() + w[1:])  # _sentence capitalizes
        # at least one word must exercise the non-ASCII Standard region
        assert any(ord(c) > 0x7E for w in _CJK_POOLS["std"] for c in w)

    def test_win_pool_is_nonvacuous(self):
        # the win charset must actually emit 0x80-0x9F bytes under cp1252
        for w in _CJK_POOLS["win"]:
            w.encode("cp1252")
            w.encode("mac_roman")  # both routes share the pool
        assert any(b >= 0x80 and b <= 0x9F
                   for w in _CJK_POOLS["win"] for b in w.encode("cp1252"))

    def test_diff_codes_disagree_with_winansi(self):
        pdf, lines = make_pdf(random.Random("sd:9"), 9, n_pages=1,
                              with_images=False, font="simple-diff",
                              charset="latin")
        diff = _diff_encoding_assignment([lines[0]])
        for c, code in diff.items():
            try:
                assert code != c.encode("cp1252")[0]
            except UnicodeEncodeError:
                pass  # not WinAnsi-encodable at all: remap is the only way
        r = parse_pdf(pdf)
        assert r["pages"][0]["text"] == "\n".join(lines[0])

    def test_tounicode_emitter_round_trips(self):
        from pdf_extractor_spark.kernels.pdf import _parse_tounicode

        codes = {"A": 0x21, "é": 0x22, "日": 0x23, "x": 0x24}
        cmap, width = _parse_tounicode(_simple_tounicode_cmap(codes))
        assert width == 1
        assert cmap == {0x21: "A", 0x22: "é", 0x23: "日", 0x24: "x"}

    def test_encrypted_simple_encoding(self):
        pdf, lines = make_pdf(random.Random("see:6"), 6, dialect="classic",
                              font="simple-winansi", charset="win",
                              encrypt="rc4-128")
        r = parse_pdf(pdf)
        assert [p["text"] for p in r["pages"]] == \
               ["\n".join(ls) for ls in lines]
