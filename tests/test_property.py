"""Property-based robustness layer (hypothesis).

The kernels are total functions over arbitrary byte streams: they never
raise, their outputs obey the documented invariants, and normalization is
idempotent.  The reference has no tests at all (SURVEY §5.1); these pin the
"hostile web bytes" behavior a crawl-scale pipeline actually meets.
"""

from hypothesis import given, settings
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
