"""Property-based robustness layer (hypothesis).

The kernels are total functions over arbitrary byte streams: they never
raise, their outputs obey the documented invariants, and normalization is
idempotent.  The reference has no tests at all (SURVEY §5.1); these pin the
"hostile web bytes" behavior a crawl-scale pipeline actually meets.
"""

from hypothesis import example, given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.kernels.dispatch import assemble_doc_text, extract_document
from pdf_extractor_spark.kernels.tokenizer import (
    canonical_whitespace,
    decode_bytes,
    normalize_text,
    paragraph_spans,
    tokenize_bytes,
)

BYTES = st.binary(max_size=4096)
TEXT = st.text(max_size=2048)


@settings(max_examples=300, deadline=None)
@given(BYTES)
def test_decode_is_total(data):
    text, enc = decode_bytes(data)
    assert isinstance(text, str) and isinstance(enc, str)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_canonical_whitespace_idempotent(text):
    once = canonical_whitespace(text)
    assert canonical_whitespace(once) == once


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_normalize_idempotent_and_stripped(text):
    once = normalize_text(text)
    assert normalize_text(once) == once
    assert once == once.strip()
    assert "\r" not in once and "\t" not in once
    assert "\n\n\n" not in once


@settings(max_examples=300, deadline=None)
@given(BYTES)
def test_tokenize_spans_index_the_text(data):
    r = tokenize_bytes(data)
    text = r["text"]
    for s, e in r["spans"]:
        assert 0 <= s < e <= len(text)
        seg = text[s:e]
        assert seg == seg.strip("\n")
        assert "\n\n" not in seg


@settings(max_examples=150, deadline=None)
@given(BYTES)
def test_extract_document_is_total(data):
    r = extract_document(data)
    assert r["status"] in ("ok", "error")
    assert r["kind"] in ("pdf", "html", "raw")
    assert r["n_pages"] == len(r["pages"])
    assemble_doc_text(r)  # never raises either
    for p in r["pages"]:
        assert p["char_count"] == len(p["text"])
        assert p["word_count"] == len(p["text"].split())


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_prefix_never_crashes(tail):
    """Anything claiming to be a PDF must degrade to status='error' or
    parse — never raise (OP-32 side-channel contract)."""
    r = extract_document(b"%PDF-1.4\n" + tail)
    assert r["kind"] == "pdf"
    assert r["status"] in ("ok", "error")


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_paragraph_spans_cover_all_nonempty_paragraphs(text):
    norm = normalize_text(text)
    spans = paragraph_spans(norm)
    paras = [p for p in norm.split("\n\n") if p]
    assert [norm[s:e] for s, e in spans] == paras


# ---------------------------------------------------------------------------
# Round-2 codec / dialect properties
# ---------------------------------------------------------------------------
@settings(max_examples=80, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.sampled_from([1, 3, 4]),
       st.integers(0, 2**31 - 1))
def test_png_roundtrip_random(w, h, ch, seed):
    import random as _r

    from pdf_extractor_spark.kernels.png import decode_png, encode_png

    rng = _r.Random(seed)
    px = bytes(rng.getrandbits(8) for _ in range(w * h * ch))
    assert decode_png(encode_png(w, h, px, ch)) == (w, h, ch, px)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2048))
def test_png_decode_is_total_or_png_error(data):
    from pdf_extractor_spark.kernels.png import PngError, decode_png

    try:
        decode_png(b"\x89PNG\r\n\x1a\n" + data)
    except PngError:
        pass  # the only allowed failure mode


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**31 - 1))
def test_jpeg_roundtrip_error_bounded(w, h, seed):
    import random as _r

    import numpy as np

    from pdf_extractor_spark.kernels.jpeg import decode_jpeg_baseline
    from pdf_extractor_spark.sources.synth_jpeg import (
        QUANT_STEP,
        encode_jpeg_baseline,
    )

    rng = _r.Random(seed)
    px = bytes(rng.getrandbits(8) for _ in range(w * h * 3))
    w2, h2, ch2, out = decode_jpeg_baseline(encode_jpeg_baseline(w, h, px, 3))
    assert (w2, h2, ch2) == (w, h, 3)
    a = np.frombuffer(px, np.uint8).astype(int)
    b = np.frombuffer(out, np.uint8).astype(int)
    # white noise is the worst case for DCT quantization; still bounded
    assert np.abs(a - b).max() <= 16 * QUANT_STEP


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=1024))
def test_jpeg_decode_is_total_or_jpeg_error(data):
    from pdf_extractor_spark.kernels.jpeg import JpegError, decode_jpeg_baseline

    try:
        decode_jpeg_baseline(b"\xff\xd8" + data)
    except JpegError:
        pass  # the only allowed failure mode


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_pdf_dialects_parse_identically(seed):
    import random as _r

    from pdf_extractor_spark.kernels.pdf import parse_pdf
    from pdf_extractor_spark.sources.synth import make_pdf

    classic, lines = make_pdf(_r.Random(seed), seed % 1000, dialect="classic")
    modern, _ = make_pdf(_r.Random(seed), seed % 1000, dialect="modern")
    rc, rm = parse_pdf(classic), parse_pdf(modern)
    assert [p["text"] for p in rc["pages"]] == [p["text"] for p in rm["pages"]]
    assert rc["metadata"] == rm["metadata"]
    assert [p["text"] for p in rc["pages"]] == ["\n".join(ls) for ls in lines]


@settings(max_examples=120, deadline=None)
@example(b"s8")  # 'u'-padded trailing group overflows 2^32 (round-4 verdict)
@example(b"uuuuu")  # full group above 's8W-!' overflows 2^32
@given(st.binary(max_size=512))
def test_filter_decoders_total_or_pdf_error(data):
    """ASCIIHex/ASCII85/RLE/predictor decoders must raise PdfError or return
    bytes on arbitrary input — never leak another exception type."""
    from pdf_extractor_spark.kernels.pdf import (
        PdfError,
        _ascii85_decode,
        _ascii_hex_decode,
        _png_unpredict,
        _run_length_decode,
    )

    for fn in (_ascii_hex_decode, _ascii85_decode, _run_length_decode):
        try:
            assert isinstance(fn(data), bytes)
        except PdfError:
            pass
    try:
        _png_unpredict(data, columns=5)
    except PdfError:
        pass


@settings(max_examples=150, deadline=None)
@example(b"/UniGB-UCS2-H usecmap")
@example(b"1 begincodespacerange\n<20> <7e>\nendcodespacerange\n"
         b"1 begincidchar\n<41> 7\nendcidchar\n")
@given(st.binary(max_size=1024))
def test_cid_cmap_parser_total_or_pdf_error(data):
    """The embedded-CMap parser must return its 3-tuple or raise PdfError
    on arbitrary bytes — never leak another exception type (round-5: the
    mixed-width/usecmap rework keeps the kernel totality contract)."""
    from pdf_extractor_spark.kernels.pdf import PdfError, _parse_cid_cmap

    try:
        code2cid, ranges, base = _parse_cid_cmap(data)
    except PdfError:
        return
    assert isinstance(code2cid, dict) and isinstance(ranges, list)
    assert base is None or isinstance(base, str)


@settings(max_examples=150, deadline=None)
@example(bytes.fromhex("81"))  # truncated cp932 lead byte
@example(bytes.fromhex("93fa8160b1"))  # 2-byte, 2-byte, 1-byte katakana
@example(bytes.fromhex("d83dde00"))  # UTF-16 surrogate pair
@given(st.binary(max_size=512))
def test_cmap_decoders_total(data):
    """Every show-string decoder added in round 5 is a total function of
    arbitrary bytes: codec CMaps (errors='replace'), variable-width
    embedded CMaps (per-byte split, notdef fallback), and /UseCMap
    composition (base fallthrough returning None -> notdef)."""
    from pdf_extractor_spark.kernels.pdf import (
        _CODEC_CMAPS,
        _CodecCMapDecoder,
        _usecmap_base,
        _VarWidthCidDecoder,
    )

    for name in ("90ms-RKSJ-H", "GBK-EUC-H", "ETen-B5-H", "KSCms-UHC-H",
                 "UniJIS-UTF16-H"):
        assert isinstance(_CodecCMapDecoder(_CODEC_CMAPS[name])(data), str)
    mixed = _VarWidthCidDecoder(
        {b"\x41": "A", b"\x81\x40": "x"},
        [(b"\x20", b"\x7e"), (b"\x80\x20", b"\xfe\xfe")])
    assert isinstance(mixed(data), str)
    for base_name in ("UniGB-UCS2-H", "90ms-RKSJ-H", "UniJIS-UTF16-H"):
        fn, ranges = _usecmap_base(base_name, None)
        dec = _VarWidthCidDecoder(
            {b"\xe0\x01": "A"}, [(b"\xe0\x00", b"\xe0\xff")] + ranges,
            base=fn)
        assert isinstance(dec(data), str)
