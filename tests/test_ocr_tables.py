"""OCR-raster table extraction (operators/ocr.q_ocr_tables): the same grid
specs the PDF/DOM parsers verify, recovered through the raster channel —
render fixed-pitch, noise, PNG round-trip, recognize from pixels, cluster
runs into a grid.  Pure-kernel tests here; the driver gate re-runs the
whole chain under Spark."""

import random
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.ocr_raster import (
    line_runs,
    recognize_text,
    render_text,
)
from pdf_extractor_spark.kernels.pdf import _detect_tables
from pdf_extractor_spark.kernels.png import decode_png, encode_png
from pdf_extractor_spark.operators.ocr import (
    _N_OCRTABLE_DOCS,
    _OCRTABLE_ROWS,
)
from pdf_extractor_spark.sources.synth import (
    make_table_spec,
    table_spec_fixed_pitch,
)


def _recover(spec, doc_id):
    rec = []
    for ln_i, line in enumerate(table_spec_fixed_pitch(spec)):
        img = render_text(line, scale=2, noise=0.02,
                          seed=f"ocrtab:{doc_id}:{ln_i}")
        png = encode_png(img.shape[1], img.shape[0], img.tobytes(),
                         channels=1)
        w, h, ch, px = decode_png(png)
        arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
        rec.append(recognize_text(arr)[0])
    return _detect_tables([line_runs(ln) for ln in rec])


def test_gate_constants_match_spec():
    total = sum(
        len(make_table_spec(random.Random(f"ocr-table-spec:{d}"))["rows"])
        for d in range(_N_OCRTABLE_DOCS)
    )
    assert total == _OCRTABLE_ROWS


def test_every_gate_doc_recovers_exactly():
    for doc_id in range(_N_OCRTABLE_DOCS):
        spec = make_table_spec(random.Random(f"ocr-table-spec:{doc_id}"))
        assert _recover(spec, doc_id) == [spec["rows"]], doc_id


def test_line_runs_positions_and_grouping():
    runs = line_runs("alpha beta   gamma  x")
    assert runs == [
        {"x": 0.0, "text": "alpha beta"},   # single space stays in-cell
        {"x": 13.0, "text": "gamma"},
        {"x": 20.0, "text": "x"},
    ]
    assert line_runs("   lead") == [{"x": 3.0, "text": "lead"}]
    assert line_runs("") == []


def test_prose_lines_detect_no_table():
    # non-aligned prose must NOT produce a table: 2-run lines with
    # arbitrary offsets can neither open nor join a region
    rng = random.Random("ocr-tables-prose")
    lines = []
    for _ in range(6):
        a, b = rng.randint(0, 4), rng.randint(12, 29)
        lines.append([{"x": float(a), "text": "lorem ipsum"},
                      {"x": float(b), "text": "dolor"}])
    assert _detect_tables(lines) == []


def test_fixed_pitch_layout_alignment():
    # every non-empty cell must start at its column's shared char offset
    for doc_id in range(10):
        spec = make_table_spec(random.Random(f"ocr-table-spec:{doc_id}"))
        lines = table_spec_fixed_pitch(spec)
        n_cols = len(spec["rows"][0])
        starts = [None] * n_cols
        colw = [
            max([len(c) for r in spec["rows"] if (c := r[j]) is not None]
                or [0]) + 3
            for j in range(n_cols)
        ]
        offs = [sum(colw[:j]) for j in range(n_cols)]
        for row, line in zip(spec["rows"], lines):
            for j, cell in enumerate(row):
                if cell is None:
                    continue
                assert line[offs[j]:offs[j] + len(cell)] == cell
