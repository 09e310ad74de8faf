"""Type0 with a PREDEFINED Uni*-UCS2 CMap and no /ToUnicode: the residual
of VERDICT round-3 'What's missing' #3 that the /FontFile2 fallback does
not cover.  Real CJK PDFs name Adobe's predefined CMaps (UniGB-UCS2-H and
friends) instead of embedding a ToUnicode stream; for the UCS2 family the
2-byte show-string code IS the UCS-2 code point, so text recovery needs no
table at all (the route pdfminer takes; the reference reads such text via
MuPDF's bundled CMap resources, text_extractor.py:51-53).

Generator/parser honesty: sources/synth.py serializes hex UTF-16BE code
units under /Encoding /UniGB-UCS2-H; kernels/pdf.py _ucs2_decode decodes
raw 2-byte codes with UCS-2 (not UTF-16) semantics — no shared code.
"""

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.pdf import (
    PdfError,
    _ucs2_decode,
    parse_pdf,
)
from pdf_extractor_spark.sources.synth import make_pdf


class TestUcs2Decoder:
    def test_ascii_and_cjk_round_trip(self):
        s = "GB text 中文测试 θπ"
        assert _ucs2_decode(s.encode("utf-16-be")) == s

    def test_surrogate_halves_are_not_utf16(self):
        # UCS-2 has no surrogate pairs: D800 DC00 is TWO invalid codes,
        # not U+10000 — each decodes to U+FFFD like any unmapped CID
        assert _ucs2_decode(b"\xd8\x00\xdc\x00") == "��"

    def test_trailing_odd_byte_dropped(self):
        assert _ucs2_decode(b"\x00A\x00") == "A"

    def test_empty(self):
        assert _ucs2_decode(b"") == ""


class TestUcs2PredefinedCmapInPdf:
    def test_text_equals_simple_font_twin(self):
        for doc_id in (0, 1, 9):  # both dialects
            dialect = "modern" if doc_id % 2 else "classic"
            rs = parse_pdf(make_pdf(
                random.Random(f"ucs2-twin:{doc_id}"), doc_id,
                dialect=dialect, font="simple")[0])
            ru = parse_pdf(make_pdf(
                random.Random(f"ucs2-twin:{doc_id}"), doc_id,
                dialect=dialect, font="cid-ucs2")[0])
            assert [p["text"] for p in rs["pages"]] == \
                   [p["text"] for p in ru["pages"]]
            assert rs["metadata"] == ru["metadata"]
            assert rs["n_pages"] == ru["n_pages"]

    def test_vertical_variant_also_decodes(self):
        # writing mode does not change text recovery: -V names the same
        # code->codepoint identity (same byte length keeps xref offsets)
        pdf, _ = make_pdf(random.Random("ucs2-v:4"), 4,
                          dialect="classic", font="cid-ucs2")
        vert = pdf.replace(b"/UniGB-UCS2-H", b"/UniGB-UCS2-V")
        assert vert != pdf
        assert [p["text"] for p in parse_pdf(vert)["pages"]] == \
               [p["text"] for p in parse_pdf(pdf)["pages"]]

    def test_other_predefined_cmaps_still_error_route(self):
        # a predefined CMap OUTSIDE the UCS2 family (code != codepoint)
        # must refuse, not emit garbage (same byte length swap)
        pdf, _ = make_pdf(random.Random("ucs2-x:4"), 4,
                          dialect="classic", font="cid-ucs2")
        broken = pdf.replace(b"/UniGB-UCS2-H", b"/UniGB-UCS3-H")
        assert broken != pdf
        with pytest.raises(PdfError, match="without /ToUnicode"):
            parse_pdf(broken)

    def test_tounicode_still_preferred_when_present(self):
        # the /ToUnicode route must be untouched by the new branch
        rs = parse_pdf(make_pdf(random.Random("ucs2-pref:3"), 3,
                                font="simple")[0])
        rc = parse_pdf(make_pdf(random.Random("ucs2-pref:3"), 3,
                                font="cid")[0])
        assert [p["text"] for p in rs["pages"]] == \
               [p["text"] for p in rc["pages"]]

    def test_corpus_goldens_unaffected(self):
        # cid-ucs2 is opt-in: the default corpus draws no new rng values
        # and its bytes cannot change (the fixture suite pins goldens; this
        # is the cheap local canary — simple/cid twins byte-stable)
        pdf_a, lines_a = make_pdf(random.Random("ucs2-canary:1"), 1)
        pdf_b, lines_b = make_pdf(random.Random("ucs2-canary:1"), 1)
        assert pdf_a == pdf_b and lines_a == lines_b
