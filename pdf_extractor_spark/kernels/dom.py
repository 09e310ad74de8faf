"""DOM boilerplate stripper (SURVEY.md OP-64) — pure stdlib ``html.parser``.

Boilerpipe/trafilatura-style block classification: parse HTML into
block-level text blocks, compute per-block text-density / link-density
features, classify content vs boilerplate, and emit

    {title, text, blocks[], links[], tables[]}

Link harvesting reproduces the reference's per-page link dump
(/root/reference/extract_cam_followers.py:96-99: keep ``link["uri"]`` when
present).  ``<table>`` parsing is the HTML analogue of the reference's table
extraction (/root/reference/pdf_extractor/extractors/table_extractor.py:65-135);
cell cleaning (whitespace collapse, null->'' coalesce) stays relational
(SURVEY.md OP-14/OP-15) — the kernel emits the raw ragged grid.

Deterministic: a pure function of the input bytes.  No wall clock, no I/O.
"""

from __future__ import annotations

from html.parser import HTMLParser

from .tokenizer import decode_bytes, normalize_text

__all__ = ["parse_html", "Block"]

# Tags that open a new text block.
_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre",
    "blockquote", "article", "section", "main", "header", "footer",
    "nav", "aside", "td", "th", "caption", "figcaption", "dd", "dt",
    "title", "br", "tr", "ul", "ol", "table", "body",
}
# Content inside these is dropped entirely.
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}

# Classification thresholds (fixed constants => deterministic goldens).
MAX_LINK_DENSITY = 0.333  # boilerpipe-style: link-dominated block = nav
MIN_CONTENT_WORDS = 8     # short isolated blocks are boilerplate
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_NOISE_TAGS = {"nav", "footer", "aside", "header"}


class Block:
    """One block-level text run with its classification features."""

    __slots__ = ("tag", "depth", "parts", "link_chars", "n_links", "in_noise")

    def __init__(self, tag: str, depth: int, in_noise: bool) -> None:
        self.tag = tag
        self.depth = depth
        self.parts: list[str] = []
        self.link_chars = 0
        self.n_links = 0
        self.in_noise = in_noise

    @property
    def text(self) -> str:
        return normalize_text("".join(self.parts))


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self.links: list[str] = []
        self.tables: list[list[list[str | None]]] = []
        self.title_parts: list[str] = []
        self.canonical: str | None = None  # first <link rel=canonical href>
        self.robots: str | None = None     # first <meta name=robots content>
        self._cur: Block | None = None
        self._skip_depth = 0
        self._anchor_depth = 0
        self._noise_depth = 0
        self._depth = 0
        self._in_title = False
        # table state
        self._table_stack: list[list[list[str | None]]] = []
        self._row: list[str | None] | None = None
        self._cell: list[str] | None = None
        self._cell_seen_text = False

    # -- block management -------------------------------------------------
    def _open_block(self, tag: str) -> None:
        self._cur = Block(tag, self._depth, self._noise_depth > 0)
        self.blocks.append(self._cur)

    def handle_starttag(self, tag, attrs):
        self._depth += 1
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in _NOISE_TAGS:
            self._noise_depth += 1
        if tag == "a":
            self._anchor_depth += 1
            href = dict(attrs).get("href")
            if href:  # URI presence predicate (OP-31)
                self.links.append(href)
        if tag == "title":
            self._in_title = True
        if tag == "link" and self.canonical is None:
            a = dict(attrs)
            if (a.get("rel") or "").strip().lower() == "canonical" \
                    and (a.get("href") or "").strip():
                self.canonical = a["href"].strip()
        if tag == "meta" and self.robots is None:
            a = dict(attrs)
            if (a.get("name") or "").strip().lower() == "robots":
                # normalize the directive list: lowercase, trim each token,
                # canonical ', ' separator — crawl policy compares tokens,
                # not author formatting
                toks = [t.strip() for t in (a.get("content") or "")
                        .lower().split(",")]
                norm = ", ".join(t for t in toks if t)
                if norm:
                    self.robots = norm
        if tag == "table":
            self._table_stack.append([])
        elif tag == "tr" and self._table_stack:
            self._row = []
        elif tag in ("td", "th") and self._table_stack:
            self._cell = []
            self._cell_seen_text = False
        if tag in _BLOCK_TAGS:
            self._open_block(tag)

    def handle_startendtag(self, tag, attrs):
        if tag == "br" and self._cur is not None:
            self._cur.parts.append("\n")
        elif tag == "img":
            pass
        else:
            self.handle_starttag(tag, attrs)
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        self._depth = max(0, self._depth - 1)
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag in _NOISE_TAGS:
            self._noise_depth = max(0, self._noise_depth - 1)
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag == "title":
            self._in_title = False
        if tag in ("td", "th") and self._cell is not None and self._row is not None:
            # None-cell fidelity: pdfplumber yields None for empty cells
            # (coalesced relationally per OP-15) — mirror that here.
            raw = "".join(self._cell)
            self._row.append(raw if self._cell_seen_text else None)
            self._cell = None
        elif tag == "tr" and self._row is not None and self._table_stack:
            self._table_stack[-1].append(self._row)
            self._row = None
        elif tag == "table" and self._table_stack:
            self.tables.append(self._table_stack.pop())
        if tag in _BLOCK_TAGS and self._cur is not None:
            self._cur = None

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
        if self._cell is not None:
            self._cell.append(data)
            if data.strip():
                self._cell_seen_text = True
        if self._cur is None and data.strip():
            self._open_block("_text")
        if self._cur is not None:
            self._cur.parts.append(data)
            if self._anchor_depth:
                self._cur.link_chars += len(data)
                self._cur.n_links += 1


def _classify(blocks: list[dict]) -> None:
    """Boilerpipe-style two-pass classification; mutates ``is_content``."""
    for b in blocks:
        ld = b["link_density"]
        words = b["word_count"]
        if b["in_noise"] or b["tag"] == "title":
            b["is_content"] = False
        elif b["tag"] in HEADING_TAGS:
            b["is_content"] = words >= 1 and ld <= MAX_LINK_DENSITY
        else:
            b["is_content"] = words >= MIN_CONTENT_WORDS and ld <= MAX_LINK_DENSITY
    # smoothing pass: promote short low-link blocks sandwiched between content
    for i, b in enumerate(blocks):
        if b["is_content"] or b["in_noise"] or not b["word_count"]:
            continue
        if b["link_density"] > MAX_LINK_DENSITY or b["tag"] == "title":
            continue
        prev_c = any(p["is_content"] for p in blocks[max(0, i - 1):i])
        next_c = any(n["is_content"] for n in blocks[i + 1:i + 2])
        if prev_c and next_c:
            b["is_content"] = True
    # demote headings with no following content (trailing boilerplate)
    for i, b in enumerate(blocks):
        if b["is_content"] and b["tag"] in HEADING_TAGS:
            if not any(n["is_content"] and n["tag"] not in HEADING_TAGS
                       for n in blocks[i + 1:]):
                b["is_content"] = False


def parse_html(data: bytes) -> dict:
    """OP-64 kernel: HTML bytes -> extraction dict.

    Returns {title, text, blocks, links, tables, encoding}; ``text`` is the
    main content (content blocks joined by blank lines, normalized).
    """
    raw, enc = decode_bytes(data, sniff_meta=True)
    p = _Extractor()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        # html.parser is forgiving; treat residual errors as truncated input
        pass

    blocks: list[dict] = []
    idx = 0
    for blk in p.blocks:
        text = blk.text
        if not text:
            continue
        chars = len(text)
        words = len(text.split())
        ld = min(1.0, blk.link_chars / chars) if chars else 0.0
        blocks.append({
            "block_no": idx,
            "tag": blk.tag,
            "text": text,
            "char_count": chars,
            "word_count": words,
            "n_links": blk.n_links,
            "link_density": round(ld, 6),
            "in_noise": blk.in_noise,
            "is_content": False,
        })
        idx += 1
    _classify(blocks)

    main_text = "\n\n".join(b["text"] for b in blocks if b["is_content"])
    return {
        "title": normalize_text("".join(p.title_parts)),
        "text": main_text,
        "blocks": blocks,
        "links": p.links,
        "tables": p.tables,
        "encoding": enc,
        # crawl-policy metadata (first occurrence wins, per WHATWG
        # duplicate-handling): canonical URL and normalized robots
        # directives; None when the document declares neither
        "canonical": p.canonical,
        "robots": p.robots,
    }
