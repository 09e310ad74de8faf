"""Derive the q_pipeline_kinds / q_pdf_dialects oracle constants from the
corpus GENERATOR's spec — independent of the extraction kernels under test.

The generator (sources/synth.gen_doc) states, per document, which dialect it
emitted and how many pages it planned; a correct parser must report exactly
that.  Run this after changing the generator and paste the printed constants
into operators/pipeline_queries.py; tests/test_pipeline_kinds_spec.py keeps
them honest on every pytest run.

    python scripts/derive_kind_expectations.py
"""

from __future__ import annotations

import random
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.sources.synth import gen_doc, make_pdf  # noqa: E402


def kind_expectations(n_docs: int = 300, seed: int = 42) -> dict[str, tuple[int, int]]:
    """{kind: (n_docs, total_pages)} from generator spec (status is 'ok' by
    construction — the generator emits only well-formed payloads)."""
    docs = Counter()
    pages = Counter()
    for doc_id in range(n_docs):
        spec = gen_doc(doc_id, seed=seed, with_spec=True)["_spec"]
        docs[spec["kind"]] += 1
        pages[spec["kind"]] += spec["n_pages"]
    return {k: (docs[k], pages[k]) for k in sorted(docs)}


def dialect_total_pages(n_docs: int = 100) -> int:
    """Planned page total of the q_pdf_dialects fixture set."""
    total = 0
    for doc_id in range(n_docs):
        rng = random.Random(f"dialect-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, dialect="classic")
        total += len(lines)
    return total


def cmap_total_pages(n_docs: int = 100) -> int:
    """Planned page total of the q_pdf_cmap fixture set (same page plan for
    both font dialects — the rng draw sequence is font-invariant)."""
    total = 0
    for doc_id in range(n_docs):
        rng = random.Random(f"cmap-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, font="simple",
                            dialect="modern" if doc_id % 2 else "classic")
        total += len(lines)
    return total


def fontcmap_total_pages(n_docs: int = 100) -> int:
    """Planned page total of the q_pdf_fontcmap fixture set (page plan is
    font-dialect-invariant — the rng draw sequence does not depend on how
    strings are serialized)."""
    total = 0
    for doc_id in range(n_docs):
        rng = random.Random(f"fontcmap-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, font="simple",
                            dialect="modern" if doc_id % 2 else "classic")
        total += len(lines)
    return total


def ucs2_total_pages(n_docs: int = 80) -> int:
    """Planned page total of the q_pdf_ucs2 fixture set (page plan is
    font-dialect-invariant, same argument as the other font gates)."""
    total = 0
    for doc_id in range(n_docs):
        rng = random.Random(f"ucs2-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, font="simple",
                            dialect="modern" if doc_id % 2 else "classic")
        total += len(lines)
    return total


def embcmap_total_pages(n_docs: int = 80) -> int:
    """Planned page total of the q_pdf_embedded_cmap fixture set (page plan
    is font-dialect-invariant, same argument as the other font gates)."""
    total = 0
    for doc_id in range(n_docs):
        rng = random.Random(f"embcmap-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, font="simple",
                            dialect="modern" if doc_id % 2 else "classic")
        total += len(lines)
    return total


def cjk_total_pages(n_docs: int = 80) -> int:
    """Planned page total of the q_pdf_cjk fixture set (page plan is the
    generator's FIRST rng draw — before any charset-dependent word draws —
    so it is font- and charset-invariant; computed here with the gate's
    exact per-doc route anyway)."""
    from pdf_extractor_spark.operators.pipeline_queries import _CJK_ROUTES

    total = 0
    for doc_id in range(n_docs):
        font, charset = _CJK_ROUTES[doc_id % len(_CJK_ROUTES)]
        rng = random.Random(f"cjk-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, font=font, charset=charset,
                            dialect="modern" if doc_id % 2 else "classic")
        total += len(lines)
    return total


def mixed_cmap_total_pages(n_docs: int = 80) -> int:
    """Planned page total of the q_pdf_mixed_cmap fixture set."""
    from pdf_extractor_spark.operators.pipeline_queries import (
        _MIXED_CHARSETS,
    )

    total = 0
    for doc_id in range(n_docs):
        charset = _MIXED_CHARSETS[doc_id % len(_MIXED_CHARSETS)]
        rng = random.Random(f"mixedcmap-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, font="cid-mixed", charset=charset,
                            dialect="modern" if doc_id % 2 else "classic")
        total += len(lines)
    return total


def usecmap_total_pages(n_docs: int = 80) -> int:
    """Planned page total of the q_pdf_usecmap fixture set."""
    from pdf_extractor_spark.operators.pipeline_queries import (
        _USECMAP_CHARSETS,
    )

    total = 0
    for doc_id in range(n_docs):
        charset = _USECMAP_CHARSETS[doc_id % len(_USECMAP_CHARSETS)]
        rng = random.Random(f"usecmap-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, font="cid-usecmap",
                            charset=charset,
                            dialect="modern" if doc_id % 2 else "classic")
        total += len(lines)
    return total


def simple_enc_total_pages(n_docs: int = 80) -> int:
    """Planned page total of the q_pdf_simple_enc fixture set."""
    from pdf_extractor_spark.operators.pipeline_queries import _SENC_ROUTES

    total = 0
    for doc_id in range(n_docs):
        font, charset = _SENC_ROUTES[doc_id % len(_SENC_ROUTES)]
        rng = random.Random(f"senc-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, font=font, charset=charset,
                            dialect="modern" if doc_id % 2 else "classic")
        total += len(lines)
    return total


def form_total_pages(n_docs: int = 80) -> int:
    """Planned page total of the q_pdf_form fixture set."""
    from pdf_extractor_spark.operators.pipeline_queries import _FORM_ROUTES

    total = 0
    for doc_id in range(n_docs):
        font, charset = _FORM_ROUTES[doc_id % len(_FORM_ROUTES)]
        rng = random.Random(f"form-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, font=font, charset=charset,
                            wrap_form=True,
                            dialect="modern" if doc_id % 2 else "classic")
        total += len(lines)
    return total


def ccitt_total_pages(n_docs: int = 60) -> int:
    """Planned page total of the q_ccitt fixture set (page plan is
    image-coding-invariant — same rng draw sequence either way)."""
    total = 0
    for doc_id in range(n_docs):
        rng = random.Random(f"ccitt-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id, image_coding="flate-gray",
                            dialect="modern" if doc_id % 2 else "classic")
        total += len(lines)
    return total


def table_merge_totals(n_docs: int = 50) -> int:
    """Expected MERGED-table total of the q_table_merge fixture set — pure
    generator-spec logic (expected_merged_tables), no kernel."""
    from pdf_extractor_spark.sources.synth import (
        expected_merged_tables,
        make_split_table_spec,
    )

    total = 0
    for doc_id in range(n_docs):
        _full, top, bot = make_split_table_spec(
            random.Random(f"merge-spec:{doc_id}"))
        specs = [top, bot]
        if 2 + doc_id % 2 == 3:
            specs.append(make_split_table_spec(
                random.Random(f"merge-extra:{doc_id}"))[1])
        total += len(expected_merged_tables(specs))
    return total


def raster_totals(n_docs: int = 80) -> tuple[int, int]:
    """(total_lines, total_chars) of the q_ocr_raster fixture set — pure
    spec-rng draws, independent of renderer and recognizer alike."""
    from pdf_extractor_spark.sources.synth import _WORDS

    total_lines = total_chars = 0
    for doc_id in range(n_docs):
        rng = random.Random(f"raster-gate:{doc_id}")
        n_lines = rng.randint(3, 6)
        for _ in range(n_lines):
            line = " ".join(rng.choice(_WORDS)
                            for _ in range(rng.randint(3, 7)))
            total_chars += len(line)
        total_lines += n_lines
    return total_lines, total_chars


def links_total(n_docs: int = 80) -> int:
    """Planned link total of the q_pdf_links fixture set — pure spec-rng
    draws, independent of both the PDF and the DOM parser."""
    total = 0
    for doc_id in range(n_docs):
        for p in range(1 + doc_id % 3):
            rng = random.Random(f"link-spec:{doc_id}:{p}")
            n = rng.randint(0, 4)
            for _ in range(n):
                rng.randint(0, 99)
                rng.randint(0, 9999)
            total += n
    return total


def crypt_total_pages(n_docs: int = 60) -> int:
    """Planned page total of the q_pdf_encrypted fixture set (page plan is
    encryption-invariant — the encryptor draws nothing from the main rng)."""
    total = 0
    for doc_id in range(n_docs):
        rng = random.Random(f"crypt-gate:{doc_id}")
        _, lines = make_pdf(rng, doc_id,
                            dialect="modern" if doc_id % 2 else "classic",
                            font="cid" if doc_id % 4 >= 2 else "simple")
        total += len(lines)
    return total


if __name__ == "__main__":
    print("q_pipeline_kinds (kind, 'ok', n_docs, total_pages):")
    for kind, (n, p) in kind_expectations().items():
        print(f"  ('{kind}', 'ok', CAST({n} AS BIGINT), CAST({p} AS BIGINT))")
    print(f"q_pdf_dialects total_pages: {dialect_total_pages()}")
    print(f"q_pdf_cmap total_pages: {cmap_total_pages()}")
    print(f"q_pdf_fontcmap total_pages: {fontcmap_total_pages()}")
    print(f"q_pdf_ucs2 total_pages: {ucs2_total_pages()}")
    print(f"q_pdf_embedded_cmap total_pages: {embcmap_total_pages()}")
    print(f"q_pdf_cjk total_pages: {cjk_total_pages()}")
    print(f"q_pdf_mixed_cmap total_pages: {mixed_cmap_total_pages()}")
    print(f"q_pdf_usecmap total_pages: {usecmap_total_pages()}")
    print(f"q_pdf_simple_enc total_pages: {simple_enc_total_pages()}")
    print(f"q_pdf_form total_pages: {form_total_pages()}")
    print(f"q_ccitt total_pages: {ccitt_total_pages()}")
    print(f"q_table_merge total_merged: {table_merge_totals()}")
    print(f"q_pdf_encrypted total_pages: {crypt_total_pages()}")
    print(f"q_pdf_links total_links: {links_total()}")
