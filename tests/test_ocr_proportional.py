"""Proportional-pitch OCR (kernels/ocr_raster proportional path): VERDICT
round-4 item 5 — recognition must stop assuming the renderer's pitch.

The recognizer solves segmentation and recognition JOINTLY (Viterbi DP
over the column profile, glyph emission only after >= 2 gap columns per
the renderer's minimum advance); it reads only pixels.  Scrambled-text
tests feed it freshly-seeded strings it has never seen.
"""

import random
import sys
from pathlib import Path

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.ocr_raster import (
    _FONT,
    GLYPH_H,
    OcrRasterError,
    recognize_text,
    recognize_text_proportional,
    render_text,
    render_text_proportional,
)

_GLYPHS = sorted(_FONT)


def _scrambled_line(rnd: random.Random) -> str:
    return " ".join(
        "".join(rnd.choice(_GLYPHS) for _ in range(rnd.randint(1, 8)))
        for _ in range(rnd.randint(1, 5))
    )


class TestProportionalRoundTrip:
    @pytest.mark.parametrize("scale", [2, 3])
    def test_clean_scrambled_text(self, scale):
        rnd = random.Random(f"clean:{scale}")
        for trial in range(30):
            line = _scrambled_line(rnd)
            img = render_text_proportional(line, scale=scale)
            got, confs = recognize_text_proportional(img)
            assert got == line
            assert all(50 <= c <= 95 for c in confs)

    @pytest.mark.parametrize("scale", [2, 3])
    def test_noisy_scrambled_text(self, scale):
        rnd = random.Random(f"noisy:{scale}")
        for trial in range(30):
            line = _scrambled_line(rnd)
            img = render_text_proportional(
                line, scale=scale, noise=0.01, seed=(scale, trial))
            got, _ = recognize_text_proportional(img)
            assert got == line, (line, got)

    def test_advances_actually_vary(self):
        # two renders of the same text with different seeds produce
        # different widths — the pitch is genuinely variable
        widths = {
            render_text_proportional("crawl extract", seed=s).shape[1]
            for s in range(6)
        }
        assert len(widths) > 1

    def test_fixed_pitch_recognizer_cannot_read_it(self):
        # the geometry really is different: the fixed-pitch reader either
        # rejects the raster or mis-reads it
        img = render_text_proportional("table crawl", scale=2, seed=3)
        try:
            got, _ = recognize_text(img)
        except OcrRasterError:
            return
        assert got != "table crawl"

    def test_proportional_recognizer_reads_fixed_pitch_too(self):
        # fixed pitch is just one advance assignment (gap = 1 column) —
        # but the proportional DP requires >= 2 gap columns, so this is
        # NOT expected to work; pin the contract explicitly
        img = render_text("ocr", scale=2)
        try:
            got, _ = recognize_text_proportional(img)
        except OcrRasterError:
            return
        # if it parses at all, it must not crash; exact equality is not
        # part of the contract for 1-column advances
        assert isinstance(got, str)

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def test_property_round_trip(self, seed):
        rnd = random.Random(seed)
        line = _scrambled_line(rnd)
        scale = rnd.choice([2, 3])
        img = render_text_proportional(line, scale=scale, noise=0.008,
                                       seed=seed)
        got, _ = recognize_text_proportional(img)
        assert got == line


class TestContracts:
    def test_empty_and_bad_input(self):
        with pytest.raises(OcrRasterError):
            render_text_proportional("")
        with pytest.raises(OcrRasterError):
            render_text_proportional(" leading")
        with pytest.raises(OcrRasterError):
            render_text_proportional("UPPER")
        with pytest.raises(OcrRasterError):
            recognize_text_proportional(np.zeros((GLYPH_H, 0)))

    def test_blank_raster_error_routes(self):
        with pytest.raises(OcrRasterError):
            recognize_text_proportional(
                np.zeros((GLYPH_H * 2, 40), dtype=np.uint8))

    def test_height_must_sit_on_glyph_grid(self):
        with pytest.raises(OcrRasterError):
            recognize_text_proportional(
                np.zeros((GLYPH_H * 2 + 1, 40), dtype=np.uint8))


def test_gate_constants_match_spec():
    from pdf_extractor_spark.operators.ocr import (
        _N_PROP_DOCS,
        _PROP_TOTAL_CHARS,
        _PROP_TOTAL_LINES,
    )
    from pdf_extractor_spark.sources.synth import _WORDS

    lines = chars = 0
    for doc_id in range(_N_PROP_DOCS):
        rng = random.Random(f"prop-gate:{doc_id}")
        n_lines = rng.randint(3, 6)
        for _ in range(n_lines):
            line = " ".join(rng.choice(_WORDS)
                            for _ in range(rng.randint(3, 7)))
            chars += len(line)
        lines += n_lines
    assert (lines, chars) == (_PROP_TOTAL_LINES, _PROP_TOTAL_CHARS)
