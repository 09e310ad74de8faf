"""Multi-page table merge (q_table_merge; VERDICT round-4 item 6 — the
reference's aspirational multi-page merge, generate_word_doc.py:88-96,
never shipped).  The kernel exposes per-table column x-centers
(detect_tables_with_cols) and the merge itself is relational in the gate;
here the signature rule and the generator's split fixtures are pinned."""

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.pdf import parse_pdf
from pdf_extractor_spark.sources.synth import (
    expected_merged_tables,
    make_pdf,
    make_split_table_spec,
)


def test_split_halves_detected_with_matching_signatures():
    for doc_id in range(8):
        full, top, bot = make_split_table_spec(
            random.Random(f"tm:{doc_id}"))
        pdf, _ = make_pdf(random.Random(f"tmg:{doc_id}"), doc_id,
                          n_pages=2, page_tables=[top, bot])
        r = parse_pdf(pdf)
        tabs = [(p_i, t, c) for p_i, p in enumerate(r["pages"])
                for t, c in zip(p["tables"], p["table_cols"])]
        assert [(p, t) for p, t, _ in tabs] == \
               [(0, top["rows"]), (1, bot["rows"])]
        # both halves carry the SAME column signature (the merge key)
        (_, _, ca), (_, _, cb) = tabs
        assert len(ca) == len(cb)
        assert max(abs(a - b) for a, b in zip(ca, cb)) <= 3.0
        # stitching the halves reproduces the unsplit spec
        assert top["rows"] + bot["rows"] == full["rows"]


def test_expected_merge_rule_positive_and_negative():
    top = {"rows": [["a", "b", "c"]] * 3, "col_x": [72.0, 200.0, 330.0]}
    bot = {"rows": [["d", "e", "f"]] * 3, "col_x": [72.0, 201.5, 331.0]}
    # consecutive pages + centers within 3.0 -> one merged table
    assert expected_merged_tables([top, bot]) == [
        top["rows"] + bot["rows"]]
    # same column count but shifted centers -> NO merge
    far = {"rows": bot["rows"], "col_x": [72.0, 250.0, 331.0]}
    assert expected_merged_tables([top, far]) == [top["rows"], far["rows"]]
    # a page gap -> NO merge
    assert expected_merged_tables([top, None, bot]) == [
        top["rows"], bot["rows"]]
    # different column count -> NO merge
    wide = {"rows": [["x", "y", "z", "w"]] * 3,
            "col_x": [72.0, 200.0, 330.0, 450.0]}
    assert expected_merged_tables([top, wide]) == [
        top["rows"], wide["rows"]]


def test_shifted_columns_do_not_merge_end_to_end():
    """Same column COUNT on consecutive pages but different x layout: the
    detected signatures must differ by more than the tolerance, so the
    relational rule refuses the merge (mirrors the 'far' case above
    through the real kernel)."""
    full, top, _ = make_split_table_spec(random.Random("shift"))
    shifted = {
        "rows": top["rows"],
        "col_x": [x + 40.0 for x in top["col_x"]],
    }
    pdf, _ = make_pdf(random.Random("shiftg"), 1, n_pages=2,
                      page_tables=[top, shifted])
    r = parse_pdf(pdf)
    sigs = [c for p in r["pages"] for c in p["table_cols"]]
    assert len(sigs) == 2 and len(sigs[0]) == len(sigs[1])
    assert max(abs(a - b) for a, b in zip(sigs[0], sigs[1])) > 3.0
    assert expected_merged_tables([top, shifted]) == [
        top["rows"], shifted["rows"]]
