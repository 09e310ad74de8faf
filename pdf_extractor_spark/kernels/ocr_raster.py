"""Fixed-pitch raster OCR: render text to a bitmap, recognize it back by
normalized-correlation template matching (round-4 item 7; SURVEY.md OP-62).

The reference delegates recognition to a real engine (pytesseract,
/root/reference/pdf_extractor/extractors/ocr_extractor.py:62-178); no OCR
binary ships in this container, so this module closes the gap from scratch
the way fixed-pitch OCR fonts (OCR-A/OCR-B) are actually read: a
deterministic 5x7 glyph bank, a renderer that rasterizes text at an integer
scale with optional salt-and-pepper noise, and a recognizer that segments
the fixed-pitch grid, block-averages each cell back to 7x5 gray, and picks
the glyph with the highest normalized cross-correlation against the bank.

Generator/recognizer honesty: the renderer WRITES pixels from the glyph
patterns; the recognizer never sees the input string — it reads only the
raster (tests feed it freshly-seeded scrambled text and noise), and its
decision rule (zero-mean correlation) is shared with nothing on the render
side.  The glyph bank itself is legitimately shared, exactly as a real
template-matching OCR engine ships the font templates it matches against.

Pipeline integration: operators/ocr.py q_ocr_raster round-trips the raster
through the from-scratch PNG codec (kernels/png.py) so recognition runs on
a decoded image artifact, matching the reference's rasterize-then-recognize
chain (ocr_extractor.py:105 renders the page to a pixmap first).
"""

from __future__ import annotations

import random
import re

import numpy as np

__all__ = [
    "GLYPH_W", "GLYPH_H", "PITCH", "ALPHABET", "OcrRasterError",
    "render_text", "recognize_text",
    "render_text_proportional", "recognize_text_proportional",
]

GLYPH_W, GLYPH_H = 5, 7
PITCH = GLYPH_W + 1        # one blank column between glyph cells
_SPACE_INK = 0.08          # cell mean-ink below this reads as a space
_MIN_SCORE = -1.0


class OcrRasterError(ValueError):
    """Raised for rasters that violate the fixed-pitch geometry contract."""


# 5x7 bit patterns (rows top-to-bottom, '1' = ink).  Classic fixed-pitch
# letterforms written out by hand; all 37 glyphs are pairwise distinct
# (asserted by tests/test_ocr_raster.py::test_templates_pairwise_distinct).
_FONT: dict[str, tuple[str, ...]] = {
    "a": ("01110", "10001", "10001", "11111", "10001", "10001", "10001"),
    "b": ("11110", "10001", "10001", "11110", "10001", "10001", "11110"),
    "c": ("01110", "10001", "10000", "10000", "10000", "10001", "01110"),
    "d": ("11100", "10010", "10001", "10001", "10001", "10010", "11100"),
    "e": ("11111", "10000", "11110", "10000", "10000", "10000", "11111"),
    "f": ("11111", "10000", "11110", "10000", "10000", "10000", "10000"),
    "g": ("01110", "10001", "10000", "10111", "10001", "10001", "01111"),
    "h": ("10001", "10001", "11111", "10001", "10001", "10001", "10001"),
    "i": ("01110", "00100", "00100", "00100", "00100", "00100", "01110"),
    "j": ("00111", "00010", "00010", "00010", "00010", "10010", "01100"),
    "k": ("10001", "10010", "10100", "11000", "10100", "10010", "10001"),
    "l": ("10000", "10000", "10000", "10000", "10000", "10000", "11111"),
    "m": ("10001", "11011", "10101", "10101", "10001", "10001", "10001"),
    "n": ("10001", "11001", "10101", "10011", "10001", "10001", "10001"),
    "o": ("01110", "10001", "10001", "10001", "10001", "10001", "01110"),
    "p": ("11110", "10001", "10001", "11110", "10000", "10000", "10000"),
    "q": ("01110", "10001", "10001", "10001", "10101", "10010", "01101"),
    "r": ("11110", "10001", "10001", "11110", "10100", "10010", "10001"),
    "s": ("01111", "10000", "10000", "01110", "00001", "00001", "11110"),
    "t": ("11111", "00100", "00100", "00100", "00100", "00100", "00100"),
    "u": ("10001", "10001", "10001", "10001", "10001", "10001", "01110"),
    "v": ("10001", "10001", "10001", "10001", "10001", "01010", "00100"),
    "w": ("10001", "10001", "10001", "10101", "10101", "11011", "10001"),
    "x": ("10001", "10001", "01010", "00100", "01010", "10001", "10001"),
    "y": ("10001", "10001", "01010", "00100", "00100", "00100", "00100"),
    "z": ("11111", "00001", "00010", "00100", "01000", "10000", "11111"),
    "0": ("01110", "10001", "10011", "10101", "11001", "10001", "01110"),
    "1": ("00100", "01100", "00100", "00100", "00100", "00100", "01110"),
    "2": ("01110", "10001", "00001", "00010", "00100", "01000", "11111"),
    "3": ("11111", "00010", "00100", "00010", "00001", "10001", "01110"),
    "4": ("00010", "00110", "01010", "10010", "11111", "00010", "00010"),
    "5": ("11111", "10000", "11110", "00001", "00001", "10001", "01110"),
    "6": ("00110", "01000", "10000", "11110", "10001", "10001", "01110"),
    "7": ("11111", "00001", "00010", "00100", "01000", "01000", "01000"),
    "8": ("01110", "10001", "10001", "01110", "10001", "10001", "01110"),
    "9": ("01110", "10001", "10001", "01111", "00001", "00010", "01100"),
    ".": ("00000", "00000", "00000", "00000", "00000", "01100", "01100"),
}

ALPHABET = "".join(sorted(_FONT)) + " "


def _bitmap(ch: str) -> np.ndarray:
    return np.array([[float(b) for b in row] for row in _FONT[ch]],
                    dtype=np.float64)


_TEMPLATES: list[tuple[str, np.ndarray, np.ndarray, float]] | None = None


def _templates() -> list[tuple[str, np.ndarray, np.ndarray, float]]:
    """[(char, raw, zero-mean, l2-norm)] — built once, module-cached."""
    global _TEMPLATES
    if _TEMPLATES is None:
        out = []
        for ch in sorted(_FONT):
            t = _bitmap(ch)
            z = t - t.mean()
            out.append((ch, t, z, float(np.sqrt((z * z).sum()))))
        _TEMPLATES = out
    return _TEMPLATES


def render_text(text: str, scale: int = 2, noise: float = 0.0,
                seed: object = 0) -> np.ndarray:
    """Rasterize ``text`` on the fixed-pitch grid: glyph cell i occupies
    columns [i*PITCH*scale, (i*PITCH+GLYPH_W)*scale), one blank PITCH gap
    column (times scale) between cells, no trailing gap.  Returns a uint8
    {0,255} array of shape (GLYPH_H*scale, (len(text)*PITCH-1)*scale).
    ``noise`` flips each pixel independently (salt-and-pepper) with the
    given probability, seeded deterministically."""
    if not text:
        raise OcrRasterError("empty text")
    bad = set(text) - set(ALPHABET)
    if bad:
        raise OcrRasterError(f"characters outside the glyph bank: {bad!r}")
    if scale < 1:
        raise OcrRasterError(f"scale must be >= 1, got {scale}")
    h = GLYPH_H * scale
    w = (len(text) * PITCH - 1) * scale
    img = np.zeros((h, w), dtype=np.uint8)
    for i, ch in enumerate(text):
        if ch == " ":
            continue
        cell = np.kron(_bitmap(ch), np.ones((scale, scale))) * 255
        x0 = i * PITCH * scale
        img[:, x0:x0 + GLYPH_W * scale] = cell.astype(np.uint8)
    if noise > 0.0:
        rng = random.Random(f"ocr-noise:{seed}")
        flip = np.array(
            [rng.random() < noise for _ in range(img.size)]
        ).reshape(img.shape)
        img = np.where(flip, 255 - img, img).astype(np.uint8)
    return img


def recognize_text(img: np.ndarray) -> tuple[str, list[int]]:
    """Raster -> (text, per-glyph confidence in [50, 95]).

    The recognizer reads ONLY pixels: it infers the scale from the image
    height, slices the fixed-pitch cells, block-averages each back to a
    7x5 gray patch, and picks the bank glyph with the highest zero-mean
    normalized cross-correlation; a cell whose mean ink is below the space
    floor reads as a space.  Confidence maps the correlation score
    (clamped to [0, 1]) onto [50, 95]."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim != 2 or a.size == 0:
        raise OcrRasterError("raster must be a non-empty 2-D array")
    h, w = a.shape
    if h % GLYPH_H:
        raise OcrRasterError(f"height {h} is not a multiple of {GLYPH_H}")
    scale = h // GLYPH_H
    if (w + scale) % (PITCH * scale):
        raise OcrRasterError(
            f"width {w} does not sit on the pitch grid at scale {scale}")
    n = (w + scale) // (PITCH * scale)
    a = a / 255.0
    chars: list[str] = []
    confs: list[int] = []
    for i in range(n):
        x0 = i * PITCH * scale
        cell = a[:, x0:x0 + GLYPH_W * scale]
        # block-average back to the 7x5 template grid
        g = cell.reshape(GLYPH_H, scale, GLYPH_W, scale).mean(axis=(1, 3))
        if g.mean() < _SPACE_INK:
            chars.append(" ")
            confs.append(95)
            continue
        gz = g - g.mean()
        gn = float(np.sqrt((gz * gz).sum()))
        best_ch, best_score = "?", _MIN_SCORE
        for ch, _t, tz, tn in _templates():
            score = float((gz * tz).sum()) / (gn * tn) if gn > 0 else 0.0
            if score > best_score:
                best_ch, best_score = ch, score
        chars.append(best_ch)
        confs.append(int(round(50 + 45 * min(1.0, max(0.0, best_score)))))
    return "".join(chars), confs


# --- proportional pitch (round-5 item: recognition must stop assuming the
# renderer's pitch) -----------------------------------------------------------

#: Word gaps render 7-10 columns wide.  Glyph margins (empty template
#: columns like 'i' col 0 or '.' cols 3-4) inflate APPARENT within-word
#: gaps to at most 2 + 3 + 1 = 6 columns, so >= _SPACE_GAP_COLS is
#: unambiguously a space and anything narrower is intra-word.
_SPACE_GAP_COLS = 7


def render_text_proportional(text: str, scale: int = 2, noise: float = 0.0,
                             seed: object = 0) -> np.ndarray:
    """Variable-advance rasterization: inter-glyph gaps draw 2-3 columns
    and word gaps 7-10 columns from a seeded rng, so the pitch is NOT
    constant and a fixed-pitch recognizer cannot read the result.  Same
    glyph bank, scale, and salt-and-pepper noise model as render_text.
    (The minimum advance is 2 so a glyph boundary is always >= 2 empty
    columns — a SINGLE empty column is then unambiguously a noise dropout
    inside a glyph, which the recognizer's segmentation absorbs.)"""
    if not text:
        raise OcrRasterError("empty text")
    if text.strip() != text or "  " in text:
        raise OcrRasterError(
            "proportional renderer takes single-spaced, trimmed text")
    bad = set(text) - set(ALPHABET)
    if bad:
        raise OcrRasterError(f"characters outside the glyph bank: {bad!r}")
    if scale < 1:
        raise OcrRasterError(f"scale must be >= 1, got {scale}")
    adv = random.Random(f"ocr-adv:{seed}")
    placements: list[tuple[str, int]] = []
    x = 0
    for ch in text:
        if ch == " ":
            x += adv.randint(_SPACE_GAP_COLS, _SPACE_GAP_COLS + 3)
            continue
        placements.append((ch, x))
        x += GLYPH_W + adv.randint(2, 3)
    w_cols = placements[-1][1] + GLYPH_W  # trim the trailing advance
    img = np.zeros((GLYPH_H * scale, w_cols * scale), dtype=np.uint8)
    for ch, cx in placements:
        cell = np.kron(_bitmap(ch), np.ones((scale, scale))) * 255
        img[:, cx * scale:(cx + GLYPH_W) * scale] = cell.astype(np.uint8)
    if noise > 0.0:
        rng = random.Random(f"ocr-noise:{seed}")
        flip = np.array(
            [rng.random() < noise for _ in range(img.size)]
        ).reshape(img.shape)
        img = np.where(flip, 255 - img, img).astype(np.uint8)
    return img


#: DP costs: a column read as GAP costs its ink (noise specks cost a
#: little, a real glyph column read as gap costs a lot); a glyph emission
#: pays a fixed entry cost so a 5-column noise window (whose best template
#: correlation stays well under it) can never outscore staying in gap.
_GAP_INK_COST = 3.0
_GLYPH_ENTRY_COST = 0.55


def recognize_text_proportional(img: np.ndarray) -> tuple[str, list[int]]:
    """Proportional raster -> (text, per-glyph confidence in [50, 95]).

    No pitch assumption — segmentation and recognition are solved JOINTLY
    by a Viterbi-style dynamic program over the column profile, the way
    classical OCR line decoders work: from each column the parse either
    (a) treats the column as gap, paying its ink as cost, or (b) emits a
    glyph spanning exactly GLYPH_W columns, earning that window's best
    zero-mean normalized cross-correlation minus a fixed entry cost.
    Thresholded projections cannot decide locally whether a weak column
    is an eroded glyph stroke or a noise-dilated gap (the failure mode
    that capped the first implementation); the global optimum settles it
    by what makes the WHOLE line parse best.  Gaps of >=
    _SPACE_GAP_COLS between chosen glyphs read as spaces.  The
    recognizer reads only pixels."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim != 2 or a.size == 0:
        raise OcrRasterError("raster must be a non-empty 2-D array")
    h, w = a.shape
    if h % GLYPH_H:
        raise OcrRasterError(f"height {h} is not a multiple of {GLYPH_H}")
    scale = h // GLYPH_H
    if w % scale:
        raise OcrRasterError(
            f"width {w} is not a multiple of the scale {scale}")
    raw = a / 255.0
    n_cols = w // scale
    cols = raw.reshape(h, n_cols, scale)
    col_ink = cols.mean(axis=(0, 2))

    # best (char, correlation) per GLYPH_W-column window, vectorized:
    # block-average every window start to a 7x5 patch, zero-mean, and
    # correlate against the whole template bank at once
    n_win = n_cols - GLYPH_W + 1
    if n_win <= 0:
        raise OcrRasterError("raster narrower than one glyph")
    grid = cols.mean(axis=2).reshape(GLYPH_H, scale, n_cols).mean(axis=1)
    wins = np.stack(
        [grid[:, i:i + GLYPH_W] for i in range(n_win)])  # (n_win, 7, 5)
    wz = wins - wins.mean(axis=(1, 2), keepdims=True)
    wn = np.sqrt((wz * wz).sum(axis=(1, 2)))
    bank = _templates()
    tz = np.stack([t[2] for t in bank])                   # (n_t, 7, 5)
    tn = np.array([t[3] for t in bank])
    scores = np.einsum("whc,thc->wt", wz, tz) / (
        np.maximum(wn, 1e-12)[:, None] * tn[None, :])
    best_t = scores.argmax(axis=1)
    best_corr = scores[np.arange(n_win), best_t]
    # hard ink floor: normalized correlation is scale-free, so a SPARSE
    # noise window (a few flipped pixels) can still correlate deceptively
    # well — but it cannot carry glyph-sized ink.  The lightest glyph
    # ('.') paints 4 scale^2 pixels; windows below half that can never
    # emit a glyph.
    win_ink = np.array([
        raw[:, i * scale:(i + GLYPH_W) * scale].sum() for i in range(n_win)
    ])
    best_corr = np.where(
        win_ink >= 2.0 * scale * scale, best_corr, -1.0)

    # 3-state DP enforcing the renderer's geometry: consecutive glyphs are
    # always separated by >= 2 gap columns (minimum advance), so a glyph
    # may only be emitted after >= 2 gap steps (or at line start).  This
    # makes overlap-phantom parses — splitting one glyph into two partial
    # windows, the dominant noise failure — structurally infeasible
    # instead of merely expensive.  States: 0 = glyph just ended,
    # 1 = one gap step since, 2 = free to emit.
    NEG = float("-inf")
    dp = np.full((3, n_cols + 1), NEG)
    dp[2, 0] = 0.0
    back: dict[tuple[int, int], tuple[int, int, int]] = {}
    for i in range(n_cols):
        gap_cost = _GAP_INK_COST * col_ink[i]
        for st in (0, 1, 2):
            if dp[st, i] == NEG:
                continue
            nxt = min(st + 1, 2)
            s = dp[st, i] - gap_cost
            if s > dp[nxt, i + 1]:
                dp[nxt, i + 1] = s
                back[(nxt, i + 1)] = (st, i, -1)
        if i < n_win and dp[2, i] != NEG:
            s = dp[2, i] + best_corr[i] - _GLYPH_ENTRY_COST
            if s > dp[0, i + GLYPH_W]:
                dp[0, i + GLYPH_W] = s
                back[(0, i + GLYPH_W)] = (2, i, int(best_t[i]))
    # reconstruct from the best final state
    st = int(np.argmax(dp[:, n_cols]))
    if dp[st, n_cols] == NEG:
        raise OcrRasterError("no recognizable glyphs in raster")
    glyphs: list[tuple[int, int]] = []  # (start col, template index)
    i = n_cols
    while i > 0:
        st, prev, t = back[(st, i)]
        if t >= 0:
            glyphs.append((prev, t))
        i = prev
    if not glyphs:
        raise OcrRasterError("no recognizable glyphs in raster")
    glyphs.reverse()

    chars: list[str] = []
    confs: list[int] = []
    prev_end: int | None = None
    for start, t in glyphs:
        if prev_end is not None and start - prev_end >= _SPACE_GAP_COLS:
            chars.append(" ")
            confs.append(95)
        prev_end = start + GLYPH_W
        corr = float(best_corr[start])
        chars.append(bank[t][0])
        confs.append(int(round(50 + 45 * min(1.0, max(0.0, corr)))))
    return "".join(chars), confs


_RUN_RE = re.compile(r"\S+(?: \S+)*")


def line_runs(text: str) -> list[dict]:
    """Recognized line -> positioned runs [{x, text}], the shape
    kernels/pdf._detect_tables clusters into table columns.

    On a fixed-pitch raster the character index IS the x coordinate (pixel
    x / (PITCH * scale)), so maximal word groups separated by >= 2 spaces —
    single spaces stay inside a run, they separate words WITHIN a cell —
    are exactly what a box-merging OCR table extractor derives from word
    geometry (the reference feeds tesseract boxes to the same discipline,
    ocr_extractor.py extract_tables_ocr)."""
    return [
        {"x": float(m.start()), "text": m.group(0)}
        for m in _RUN_RE.finditer(text)
    ]
