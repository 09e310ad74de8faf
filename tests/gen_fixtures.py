"""Deterministic fixture corpus + golden-file generator (SURVEY.md §5.2).

Run directly to (re)write ``tests/golden/``:

    python tests/gen_fixtures.py

Goldens are the output of the single-process kernels over the fixture corpus
— the byte-identity contract the Spark pipeline must reproduce exactly
(BASELINE.json input_hint; mirrors the reference's manual golden check,
/root/reference/verify_extraction.py:1-29).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.dispatch import assemble_doc_text, extract_document
from pdf_extractor_spark.sources.synth import gen_corpus

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"
N_DOCS = 120
SEED = 42

# Hand-crafted edge cases (FIXTURES.md §1 "edge cases")
_EDGE_DOCS: list[tuple[str, bytes]] = [
    ("edge_empty", b""),
    ("edge_ws_only", b"   \r\n\t \n\n  "),
    ("edge_html_empty_body", b"<!DOCTYPE html><html><head><title>t</title></head><body></body></html>"),
    ("edge_html_all_boiler",
     b"<html><body><nav><a href='/a'>a</a> <a href='/b'>b</a></nav>"
     b"<footer><a href='/c'>c</a></footer></body></html>"),
    ("edge_html_nested_table",
     b"<html><body><p>Intro paragraph with enough words to be considered main content here.</p>"
     b"<table><tr><td>outer<table><tr><td>inner</td></tr></table></td><td>x</td></tr></table>"
     b"</body></html>"),
    ("edge_html_entities",
     "<html><body><p>R&amp;D caf&eacute; &lt;tag&gt; &#8212; dash and words words words words.</p>"
     "</body></html>".encode()),
    ("edge_pdf_truncated", b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"),
    ("edge_pdf_not_really", b"%PDF-1.4 but nothing else"),
    ("edge_raw_invalid_utf8", b"valid ascii then \xff\xfe\xfa garbage \xc3("),
    ("edge_raw_utf16_nobom_like", b"\x00h\x00i\x00 \x00t\x00h\x00e\x00r\x00e"),
]


def fixture_rows() -> list[dict]:
    """The full fixture corpus: synthetic docs + edge docs."""
    rows = list(gen_corpus(N_DOCS, seed=SEED, oversize_frac=0.02,
                           oversize_bytes=1 << 17))
    import datetime as dt
    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    for i, (name, payload) in enumerate(_EDGE_DOCS):
        rows.append({
            "url": f"https://edge.example.net/t/{name}",
            "warc_ts": base + dt.timedelta(seconds=90000 + i),
            "html": payload,
            "text": "",
            "lang": "und",
        })
    return rows


def doc_key(url: str) -> str:
    """Stable golden-file key derived from the url (its unique last segment)."""
    return url.rstrip("/").rsplit("/", 1)[-1]


def summarize(result: dict) -> dict:
    """Structural summary with reference semantics
    (/root/reference/pdf_extractor/models/extraction_result.py:100-130):
    per-page counts + doc totals.  No timestamps (OP-21 exclusion)."""
    pages = [
        {
            "page_number": p["page_number"],
            "char_count": p["char_count"],
            "word_count": p["word_count"],
            "n_blocks": len(p["blocks"]),
            "n_images": len(p["images"]),
            "n_tables": len(p["tables"]),
            "n_links": len(p["links"]),
        }
        for p in result["pages"]
    ]
    return {
        "kind": result["kind"],
        "status": result["status"],
        "error": result["error"],
        "title": result["title"],
        "n_pages": result["n_pages"],
        "pages": pages,
        "total_text_blocks": sum(p["n_blocks"] for p in pages),
        "total_images": sum(p["n_images"] for p in pages),
        "total_tables": sum(p["n_tables"] for p in pages),
        "total_chars": sum(p["char_count"] for p in pages),
        "total_words": sum(p["word_count"] for p in pages),
    }


def compute_goldens(rows: list[dict]) -> dict[str, tuple[bytes, dict]]:
    out: dict[str, tuple[bytes, dict]] = {}
    for row in rows:
        result = extract_document(row["html"])
        text = assemble_doc_text(result)
        out[doc_key(row["url"])] = (text.encode("utf-8"), summarize(result))
    return out


def write_goldens() -> int:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    goldens = compute_goldens(fixture_rows())
    for key, (text_bytes, summary) in sorted(goldens.items()):
        (GOLDEN_DIR / f"{key}.txt").write_bytes(text_bytes)
        (GOLDEN_DIR / f"{key}.json").write_text(
            json.dumps(summary, ensure_ascii=False, indent=1, sort_keys=True)
        )
    return len(goldens)


if __name__ == "__main__":
    n = write_goldens()
    print(f"wrote {n} goldens to {GOLDEN_DIR}")
