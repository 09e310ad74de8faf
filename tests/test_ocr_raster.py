"""Raster OCR recognition (round-4 item 7; SURVEY.md OP-62): the
recognizer must recover text from PIXELS ALONE — it never sees the input
string or any ground-truth label — via fixed-pitch segmentation and
normalized-correlation template matching (kernels/ocr_raster.py).

The reference hands rasters to pytesseract
(/root/reference/pdf_extractor/extractors/ocr_extractor.py:62-178); no OCR
binary ships in this container, so the from-scratch matcher is the honest
in-sandbox equivalent, and these tests hold it to the same contract a real
engine gets: scrambled fresh-seeded text, varying scale, pixel noise, and
a PNG encode/decode round trip between render and recognize.
"""

import itertools
import random
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.ocr_raster import (
    ALPHABET,
    GLYPH_H,
    OcrRasterError,
    _bitmap,
    recognize_text,
    render_text,
)
from pdf_extractor_spark.kernels.png import decode_png, encode_png
from pdf_extractor_spark.sources.synth import _WORDS


def test_templates_pairwise_distinct():
    glyphs = sorted(set(ALPHABET) - {" "})
    for a, b in itertools.combinations(glyphs, 2):
        assert not np.array_equal(_bitmap(a), _bitmap(b)), (a, b)


def test_exact_round_trip_all_glyphs_all_scales():
    text = "".join(sorted(set(ALPHABET) - {" "}))
    for scale in (1, 2, 3, 4):
        got, confs = recognize_text(render_text(text, scale=scale))
        assert got == text
        assert min(confs) >= 90  # noiseless match is near-perfect


def test_spaces_round_trip():
    got, confs = recognize_text(render_text("a b  c", scale=2))
    assert got == "a b  c"
    assert all(50 <= c <= 95 for c in confs)


def test_recognizes_scrambled_fresh_text_without_labels():
    # fresh seeds, shuffled word order: the recognizer input is ONLY the
    # pixel array; equality against the independently-held spec string is
    # the no-label proof
    rng = random.Random("scramble-2024")
    for trial in range(40):
        words = [rng.choice(_WORDS) for _ in range(rng.randint(2, 8))]
        rng.shuffle(words)
        line = " ".join(words)
        img = render_text(line, scale=rng.randint(2, 4))
        got, _ = recognize_text(img)
        assert got == line, trial


def test_noise_robust_at_scale_2_and_3():
    rng = random.Random("noise-2024")
    for trial in range(60):
        line = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(2, 6)))
        scale = rng.randint(2, 3)
        img = render_text(line, scale=scale, noise=0.02, seed=f"n{trial}")
        got, _ = recognize_text(img)
        assert got == line, (trial, scale, line, got)


def test_noise_is_deterministic():
    a = render_text("spark", scale=2, noise=0.05, seed="fixed")
    b = render_text("spark", scale=2, noise=0.05, seed="fixed")
    c = render_text("spark", scale=2, noise=0.05, seed="other")
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_png_codec_round_trip_preserves_recognition():
    line = "partition shuffle join"
    img = render_text(line, scale=3, noise=0.02, seed="png")
    png = encode_png(img.shape[1], img.shape[0], img.tobytes(), channels=1)
    w, h, ch, px = decode_png(png)
    assert (ch, h, w) == (1, img.shape[0], img.shape[1])
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert np.array_equal(arr, img)  # codec is lossless
    got, _ = recognize_text(arr)
    assert got == line


def test_render_rejects_unknown_chars_and_empty():
    with pytest.raises(OcrRasterError, match="glyph bank"):
        render_text("héllo")
    with pytest.raises(OcrRasterError, match="empty"):
        render_text("")
    with pytest.raises(OcrRasterError, match="scale"):
        render_text("a", scale=0)


def test_recognize_rejects_off_grid_rasters():
    with pytest.raises(OcrRasterError, match="multiple"):
        recognize_text(np.zeros((GLYPH_H + 1, 5)))
    with pytest.raises(OcrRasterError, match="pitch grid"):
        recognize_text(np.zeros((GLYPH_H, 7)))
    with pytest.raises(OcrRasterError, match="2-D"):
        recognize_text(np.zeros((0, 0)))


def test_gate_constants_match_spec():
    # the q_ocr_raster oracle totals restate the spec rng only — no
    # renderer, no recognizer (full assertion lives in
    # test_pipeline_kinds_spec.py; this pins the doc-count shape too)
    from scripts.derive_kind_expectations import raster_totals

    from pdf_extractor_spark.operators.ocr import (
        _N_RASTER_DOCS,
        _RASTER_TOTAL_CHARS,
        _RASTER_TOTAL_LINES,
    )

    lines, chars = raster_totals(_N_RASTER_DOCS)
    assert (lines, chars) == (_RASTER_TOTAL_LINES, _RASTER_TOTAL_CHARS)
    assert _N_RASTER_DOCS == 80
