"""Type0 fonts naming PREDEFINED national-encoding / UTF-16 CMaps
(90ms-RKSJ-H, GBK-EUC-H, ETen-B5-H, KSCms-UHC-H, UniJIS-UTF16-H — the
residual of VERDICT round-4 'What's missing' #1 after embedded CMap
streams landed).  The reference reads these via MuPDF's bundled CMap
resources (text_extractor.py:51-53); this kernel exploits that each CMap's
CODE SPACE is a national text encoding with a CPython stdlib codec
(PDF 32000-1 §9.7.5.2 Table 118), so the show-string bytes decode
directly.

Circularity guard: generator and parser both route through Python codecs,
so a name->codec pairing mistake could cancel out in the twin gate.  The
HAND-PINNED byte vectors below are the external ground truth — hex
literals transcribed from the encoding standards (JIS X 0208 via cp932,
GB 2312 via GBK, Big5, KS X 1001 via UHC, ISO 10646 UTF-16BE), so a wrong
routing (e.g. reading ETen-B5 bytes as GBK) fails here even if the twin
gate still matched.
"""

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.pdf import (
    PdfError,
    _CODEC_CMAPS,
    _CodecCMapDecoder,
    parse_pdf,
)
from pdf_extractor_spark.sources.synth import (
    _CJK_POOLS,
    _CODEC_FONT_ROUTES,
    make_pdf,
)

#: Hand-pinned (CMap name, show-string bytes, expected text) vectors.
#: The hex literals are the standard encodings of the expected strings —
#: NOT produced by calling .encode() at test time.
_PINNED_VECTORS = [
    # Shift-JIS (cp932): 日本語 = 93FA 967B 8CEA; ASCII passes through;
    # 0x8160 is the cp932-specific FULLWIDTH TILDE U+FF5E (plain
    # shift_jis/JIS X 0208 maps it to U+301C — pins the *Microsoft*
    # variant the 90ms- prefix names).
    ("90ms-RKSJ-H", bytes.fromhex("93fa967b8cea"), "日本語"),
    ("90ms-RKSJ-H", b"A" + bytes.fromhex("93fa") + b"B", "A日B"),
    ("90ms-RKSJ-H", bytes.fromhex("8160"), "～"),
    # half-width katakana lives in the 1-byte 0xA1-0xDF range: ｱ = B1
    ("90ms-RKSJ-H", bytes.fromhex("b1"), "ｱ"),
    # GBK: 中文 = D6D0 CEC4; é = A8A6 (GBK extension row)
    ("GBK-EUC-H", bytes.fromhex("d6d0cec4"), "中文"),
    ("GBK-EUC-H", bytes.fromhex("a8a6"), "é"),
    # Big5 (cp950): 中文 = A4A4 A4E5
    ("ETen-B5-H", bytes.fromhex("a4a4a4e5"), "中文"),
    # UHC (cp949): 한국 = C7D1 B1B9
    ("KSCms-UHC-H", bytes.fromhex("c7d1b1b9"), "한국"),
    # UTF-16BE incl. an astral (non-BMP) surrogate pair: 😀 = D83D DE00
    ("UniJIS-UTF16-H", bytes.fromhex("65e5672c"), "日本"),
    ("UniJIS-UTF16-H", bytes.fromhex("d83dde00"), "😀"),
]


class TestPinnedVectors:
    @pytest.mark.parametrize("cmap_name,raw,expected", _PINNED_VECTORS)
    def test_vector(self, cmap_name, raw, expected):
        dec = _CodecCMapDecoder(_CODEC_CMAPS[cmap_name])
        assert dec(raw) == expected

    def test_v_variants_share_codec(self):
        # writing mode changes layout, not the code space
        for name, codec in _CODEC_CMAPS.items():
            if name.endswith("-H"):
                assert _CODEC_CMAPS[name[:-2] + "-V"] == codec

    def test_routing_is_not_interchangeable(self):
        # the same bytes mean different text under different CMaps —
        # the kernel must dispatch on the NAME
        b5 = bytes.fromhex("a4a4a4e5")  # 中文 in Big5
        gbk = _CodecCMapDecoder(_CODEC_CMAPS["GBK-EUC-H"])(b5)
        assert gbk != "中文"

    def test_invalid_bytes_are_notdef_not_crash(self):
        dec = _CodecCMapDecoder(_CODEC_CMAPS["90ms-RKSJ-H"])
        out = dec(bytes.fromhex("93"))  # truncated 2-byte code
        assert "�" in out

    def test_generator_routes_agree_with_kernel(self):
        # one table drives the writer, the other the reader; a drift
        # between them is a silent twin-gate pass with wrong text
        for font, (enc_name, codec, _ord, _sup) in _CODEC_FONT_ROUTES.items():
            assert _CODEC_CMAPS[enc_name] == codec, font


class TestPools:
    def test_pools_encode_in_their_codec(self):
        for charset, font in (("ja", "cid-rksj"), ("zh-hans", "cid-gbk"),
                              ("zh-hant", "cid-b5"), ("ko", "cid-uhc")):
            codec = _CODEC_FONT_ROUTES[font][1]
            for w in _CJK_POOLS[charset]:
                assert w.encode(codec).decode(codec) == w

    def test_pools_are_bmp(self):
        # required for the cid-ucs2 twin serialization
        for pool in _CJK_POOLS.values():
            for w in pool:
                for c in w:
                    assert ord(c) <= 0xFFFF
                    assert not (0xD800 <= ord(c) <= 0xDFFF)


class TestEndToEnd:
    @pytest.mark.parametrize("font,charset", [
        ("cid-rksj", "ja"), ("cid-gbk", "zh-hans"), ("cid-b5", "zh-hant"),
        ("cid-uhc", "ko"), ("cid-utf16", "ja"), ("cid-utf16", "zh-hans"),
    ])
    @pytest.mark.parametrize("dialect", ["classic", "modern"])
    def test_twin_text_identical(self, font, charset, dialect):
        # same seed, same charset: the UCS2 route (certified r4) and the
        # codec route must recover byte-identical text
        import zlib
        doc_id = zlib.crc32(f"{font}:{charset}:{dialect}".encode()) % 1000
        ru = parse_pdf(make_pdf(
            random.Random(f"codec-twin:{font}:{charset}:{doc_id}"), doc_id,
            dialect=dialect, font="cid-ucs2", charset=charset)[0])
        rc = parse_pdf(make_pdf(
            random.Random(f"codec-twin:{font}:{charset}:{doc_id}"), doc_id,
            dialect=dialect, font=font, charset=charset)[0])
        assert [p["text"] for p in ru["pages"]] == \
               [p["text"] for p in rc["pages"]]
        assert ru["n_pages"] == rc["n_pages"]
        assert ru["metadata"] == rc["metadata"]
        # the text actually contains CJK (the gate is not vacuous)
        assert any(ord(c) > 0x2E00 for p in rc["pages"] for c in p["text"])

    def test_unknown_predefined_cmap_error_routes(self):
        # Add-RKSJ-H needs Adobe's CID tables proper — honest refusal
        pdf = make_pdf(random.Random("oo:1"), 1, font="cid-rksj",
                       charset="ja")[0]
        assert b"/90ms-RKSJ-H" in pdf
        broken = pdf.replace(b"/90ms-RKSJ-H", b"/Add-RKSJ-HX"[:12])
        with pytest.raises(PdfError):
            parse_pdf(broken)

    def test_latin_charset_unchanged(self):
        # the charset parameter must not perturb the default rng draws:
        # pre-charset goldens (tests/golden) stay valid — pinned here via
        # a fixed-seed document body hash
        import hashlib
        a = make_pdf(random.Random("x:1"), 1)[0]
        b = make_pdf(random.Random("x:1"), 1, charset="latin")[0]
        assert a == b
        assert hashlib.sha256(a).hexdigest().startswith("6b06efb2")
