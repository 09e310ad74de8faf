"""PDF /Annots link-URI harvesting (OP-23/OP-31 PDF-side parity, round 4).

The reference harvests link URIs from PDFs via fitz ``page.get_links()``
(/root/reference/extract_cam_followers.py:96-99); the kernel's analogue
walks /Annots for /Subtype /Link annotations (kernels/pdf.py _page_links),
supporting both the /A << /S /URI >> action form and the PDF 1.1 legacy
direct /URI key.  Generator/parser honesty: the URI spec is drawn
independently of the parser, serialized by sources/synth.py, and must
round-trip across dialects, fonts, and encryption.
"""

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.dispatch import extract_document
from pdf_extractor_spark.kernels.pdf import parse_pdf
from pdf_extractor_spark.sources.synth import make_pdf

LINKS = [
    ["https://example.com/a", "http://foo.bar/b?q=1&r=2", "mailto:x@y.z"],
    [],
    ["https://one.example/path#frag"],
]


def test_round_trip_both_forms_all_dialects():
    """Even-indexed links serialize as /A actions, odd as direct /URI —
    both forms across classic/modern xref and simple/cid fonts."""
    for dialect in ("classic", "modern"):
        for font in ("simple", "cid"):
            pdf, _ = make_pdf(random.Random("lk:1"), 1, n_pages=3,
                              dialect=dialect, font=font, page_links=LINKS)
            got = [pg["links"] for pg in parse_pdf(pdf)["pages"]]
            assert got == LINKS, (dialect, font)


def test_round_trip_encrypted_strings():
    """Classic-dialect encryption hex-encrypts URI strings (synth_crypt);
    the parser must decrypt them back."""
    for scheme in ("rc4-40", "rc4-128", "aes-128"):
        pdf, _ = make_pdf(random.Random("lk:2"), 2, n_pages=3,
                          encrypt=scheme, page_links=LINKS)
        got = [pg["links"] for pg in parse_pdf(pdf)["pages"]]
        assert got == LINKS, scheme


def test_no_annots_is_empty_and_goldens_unaffected():
    """Default corpus draws carry no annotations: links == [] everywhere
    and bytes are identical with/without the parameter present."""
    a = make_pdf(random.Random("lk:3"), 3)[0]
    b = make_pdf(random.Random("lk:3"), 3, page_links=None)[0]
    assert a == b
    assert all(pg["links"] == [] for pg in parse_pdf(a)["pages"])


def test_non_link_and_malformed_annots_skipped():
    """A /Link without any URI key and a dangling object ref are skipped
    without error; the remaining links survive.  All mutations are
    byte-length-preserving (classic xref offsets are absolute)."""
    import re

    links = [["https://a.example/", "https://b.example/",
              "https://c.example/"]]
    pdf, _ = make_pdf(random.Random("lk:4"), 4, n_pages=1, page_links=links)

    # the odd-indexed (direct-form) annot: /URI -> /URX leaves a /Link
    # annotation with no URI at all
    assert pdf.count(b"/Border [0 0 0] /URI ") == 1
    mutated = pdf.replace(b"/Border [0 0 0] /URI ", b"/Border [0 0 0] /URX ")
    assert parse_pdf(mutated)["pages"][0]["links"] == [
        "https://a.example/", "https://c.example/"]

    # non-link object in /Annots: first annot ref redirected to the font
    # object (id 3 — a dict whose /Subtype is /Type1, not /Link)
    m = re.search(rb"/Annots \[(\d+) 0 R", pdf)
    first = m.group(1)
    assert b"3 0 obj\n<< /Type /Font" in pdf and len(first) == 1
    mutated2 = pdf.replace(b"/Annots [" + first + b" 0 R",
                           b"/Annots [" + b"3" + b" 0 R")
    assert parse_pdf(mutated2)["pages"][0]["links"] == [
        "https://b.example/", "https://c.example/"]


def test_dispatch_unifies_pdf_links():
    """extract_document carries PDF links into the unified page struct the
    same way the DOM branch does."""
    pdf, _ = make_pdf(random.Random("lk:5"), 5, n_pages=3, page_links=LINKS)
    r = extract_document(pdf)
    assert r["status"] == "ok"
    assert [pg["links"] for pg in r["pages"]] == LINKS


def test_gate_constants_match_spec():
    """_LINK_TOTAL is the generator-spec draw total, independent of any
    parser (single source of truth for the driver oracle)."""
    from pdf_extractor_spark.operators.pipeline_queries import (
        _LINK_TOTAL,
        _N_LINK_DOCS,
    )

    total = 0
    for doc_id in range(_N_LINK_DOCS):
        for p in range(1 + doc_id % 3):
            rng = random.Random(f"link-spec:{doc_id}:{p}")
            n = rng.randint(0, 4)
            for _ in range(n):
                rng.randint(0, 99)
                rng.randint(0, 9999)
            total += n
    assert total == _LINK_TOTAL


def test_gate_green(spark, sf_dir):
    from pdf_extractor_spark.operators.pipeline_queries import q_pdf_links

    row = q_pdf_links(spark, sf_dir).collect()[0]
    assert (row.n_docs, row.n_match, row.total_links) == (80, 80, 337)
