"""PDF-native table detection (OP-61, round-4 item 1).

The reference extracts PDF tables via pdfplumber's word-cluster text
strategy (/root/reference/pdf_extractor/extractors/table_extractor.py:42-135,
detection at :65); the kernel's from-scratch analogue x-clusters run starts
into columns over the reading-order line stream (kernels/pdf.py
_detect_tables).  Tests follow the generator/parser-honesty discipline: the
grid spec is drawn independently of both parsers, rendered as positioned PDF
runs AND as an HTML <table>, and all three views must agree on cell data.
"""

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels import dom
from pdf_extractor_spark.kernels.dispatch import extract_document
from pdf_extractor_spark.kernels.pdf import (
    _detect_tables,
    _group_lines,
    parse_pdf,
)
from pdf_extractor_spark.sources.synth import (
    make_pdf,
    make_table_spec,
    table_expected_lines,
    table_spec_html,
)


def _runs(cells, y, xs):
    """One line of runs: a run per non-None cell at the given x-starts."""
    return [
        {"x": x, "y": y, "text": c + " ", "size": 11.0}
        for x, c in zip(xs, cells)
        if c is not None
    ]


class TestDetectorUnit:
    XS = [72.0, 180.0, 300.0]

    def test_three_by_three_grid(self):
        runs = []
        want = [["a", "b", "c"], ["d", "e", "f"], ["g", "h", "i"]]
        for i, row in enumerate(want):
            runs += _runs(row, 700 - 18 * i, self.XS)
        tables = _detect_tables(_group_lines(runs))
        assert tables == [want]

    def test_none_for_empty_cells(self):
        rows = [["a", "b", "c"], ["d", None, "f"], ["g", "h", None],
                ["x", "y", "z"]]
        runs = []
        for i, row in enumerate(rows):
            runs += _runs(row, 700 - 18 * i, self.XS)
        # rows 2/3 carry only 2 runs: they must still JOIN via the >=2
        # shared-column rule, and the empty cells surface as None
        tables = _detect_tables(_group_lines(runs))
        assert tables == [rows]

    def test_two_rows_is_not_a_table(self):
        runs = []
        for i, row in enumerate([["a", "b", "c"], ["d", "e", "f"]]):
            runs += _runs(row, 700 - 18 * i, self.XS)
        assert _detect_tables(_group_lines(runs)) == []

    def test_two_columns_is_not_a_table(self):
        runs = []
        for i in range(5):
            runs += _runs(["a", "b"], 700 - 18 * i, [72.0, 200.0])
        assert _detect_tables(_group_lines(runs)) == []

    def test_paragraph_splits_two_tables(self):
        g1 = [["a", "b", "c"]] * 3
        g2 = [["p", "q", "r"]] * 3
        runs = []
        y = 700.0
        for row in g1:
            runs += _runs(row, y, self.XS)
            y -= 18
        runs.append({"x": 72.0, "y": y, "text": "an ordinary paragraph line",
                     "size": 12.0})
        y -= 18
        for row in g2:
            runs += _runs(row, y, self.XS)
            y -= 18
        tables = _detect_tables(_group_lines(runs))
        assert tables == [g1, g2]

    def test_unaligned_lines_are_not_a_table(self):
        # >=3 runs per line but drifting x-starts: no 2 shared columns
        runs = []
        for i in range(4):
            xs = [72.0 + 11 * i, 180.0 + 11 * i, 300.0 + 11 * i]
            runs += _runs(["a", "b", "c"], 700 - 18 * i, xs)
        assert _detect_tables(_group_lines(runs)) == []


class TestGeneratorTwins:
    def test_pdf_html_spec_three_way_equality(self):
        for doc_id in range(24):
            n_pages = 1 + doc_id % 3
            specs = [
                make_table_spec(random.Random(f"table-spec:{doc_id}:{p}"))
                for p in range(n_pages)
            ]
            pdf_bytes, exp_lines = make_pdf(
                random.Random(f"table-gate:{doc_id}"), doc_id,
                n_pages=n_pages,
                dialect="modern" if doc_id % 2 else "classic",
                page_tables=specs)
            r = parse_pdf(pdf_bytes)
            want = [s["rows"] for s in specs]
            assert [t for p in r["pages"] for t in p["tables"]] == want
            # grid rows join the reading-order text below the paragraphs
            for p, el in zip(r["pages"], exp_lines):
                assert p["text"] == "\n".join(el)
            html = ("<html><head><title>t</title></head><body>"
                    + "".join(table_spec_html(s) for s in specs)
                    + "</body></html>")
            assert dom.parse_html(html.encode())["tables"] == want

    def test_expected_lines_helper_matches_spec(self):
        spec = make_table_spec(random.Random("helper"))
        lines = table_expected_lines(spec)
        assert len(lines) == len(spec["rows"])
        for line, row in zip(lines, spec["rows"]):
            assert line == " ".join(c for c in row if c is not None)

    def test_default_corpus_has_no_false_positives(self):
        for doc_id in range(40):
            b, _ = make_pdf(random.Random(f"fp:{doc_id}"), doc_id,
                            dialect="modern" if doc_id % 2 else "classic")
            for p in parse_pdf(b)["pages"]:
                assert p["tables"] == []

    def test_dispatch_carries_pdf_tables(self):
        spec = make_table_spec(random.Random("table-spec:7:0"))
        pdf_bytes, _ = make_pdf(random.Random("dispatch"), 7, n_pages=1,
                                page_tables=[spec])
        r = extract_document(pdf_bytes)
        assert r["status"] == "ok" and r["kind"] == "pdf"
        assert r["pages"][0]["tables"] == [spec["rows"]]


def test_gate_constants_match_spec():
    """q_pdf_tables oracle constants re-derived from the spec rng (the
    kernel-independence discipline of test_pipeline_kinds_spec)."""
    from pdf_extractor_spark.operators.pipeline_queries import (
        _N_TABLE_DOCS,
        _TABLE_ROWS,
        _TABLE_TOTAL,
    )

    tot_tables = tot_rows = 0
    for doc_id in range(_N_TABLE_DOCS):
        for p in range(1 + doc_id % 3):
            s = make_table_spec(random.Random(f"table-spec:{doc_id}:{p}"))
            tot_tables += 1
            tot_rows += len(s["rows"])
    assert tot_tables == _TABLE_TOTAL
    assert tot_rows == _TABLE_ROWS
