"""Substring-level dedup (winnowing fingerprints, round 4).

Pins the two load-bearing claims of q_substring_dedup:
* the winnowing guarantee — any substring shared across docs spanning
  >= K+W-1 whitespace tokens produces at least one common fingerprint —
  holds on constructed cases the query has never seen;
* the Spark formulation equals an independent pure-Python
  implementation of the same (K, W) scheme on real corpus data.
"""

import hashlib
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.operators.dedup import (
    _BENCH_MOD,
    _SUB_K,
    _SUB_W,
    q_decontaminate,
    q_substring_dedup,
)


def _py_fingerprints(text: str) -> set:
    """Independent reimplementation (stdlib only, no Spark expressions)."""
    toks = re.split(r"\s+", text.strip().lower()) if text.strip() else []
    if len(toks) < _SUB_K:
        return set()
    grams = [
        hashlib.md5(" ".join(toks[i:i + _SUB_K]).encode()).hexdigest()
        for i in range(len(toks) - _SUB_K + 1)
    ]
    if len(grams) < _SUB_W:
        return set()
    return {
        min(grams[i:i + _SUB_W]) for i in range(len(grams) - _SUB_W + 1)
    }


def test_winnowing_guarantee_on_shared_span():
    """Two texts sharing an 11-token run (K+W-1) MUST share a fingerprint;
    disjoint-vocabulary texts must not."""
    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    a = "left filler words here " + span + " and a right tail"
    b = "completely different prefix tokens " + span + " other suffix"
    fa, fb = _py_fingerprints(a), _py_fingerprints(b)
    assert fa & fb, "winnowing guarantee violated on a shared 11-token span"
    c = "unrelated vocabulary entirely " + " ".join(f"w{i}" for i in range(20))
    assert not (_py_fingerprints(c) & fa)


def test_query_matches_independent_python(spark, sf_dir):
    rows = q_substring_dedup(spark, sf_dir).collect()
    got = {r.doc_id: (r.n_fp, r.n_shared, r.dup_frac) for r in rows}

    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"select doc_id, text from read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    fps = {d: _py_fingerprints(t) for d, t in docs}
    counts: dict = {}
    for f in fps.values():
        for x in f:
            counts[x] = counts.get(x, 0) + 1
    expect = {}
    for d, f in fps.items():
        if not f:
            continue
        n_sh = sum(1 for x in f if counts[x] > 1)
        expect[d] = (len(f), n_sh, round(n_sh / len(f), 6))
    assert got == expect
    # the fixture corpus must exercise the interesting branch
    assert any(v[1] > 0 for v in expect.values()), "no shared spans in fixture"


def test_decontaminate_matches_independent_python(spark, sf_dir):
    rows = q_decontaminate(spark, sf_dir).collect()
    got = {r.doc_id: (r.n_fp, r.n_hits, r.contaminated) for r in rows}

    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"select doc_id, text from read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    fps = {d: _py_fingerprints(t) for d, t in docs}
    bench: set = set()
    for d, f in fps.items():
        if d % _BENCH_MOD == 0:
            bench |= f
    expect = {}
    for d, f in fps.items():
        if d % _BENCH_MOD == 0 or not f:
            continue
        hits = sum(1 for x in f if x in bench)
        expect[d] = (len(f), hits, 1 if hits else 0)
    assert got == expect
    assert any(v[2] for v in expect.values()), "no contamination in fixture"


def test_short_docs_are_total_not_crashing(spark, tmp_path):
    # sequence(1, n) in Spark turns DESCENDING for n < 1 ([1, 0, ...]), so
    # if the optimizer ever evaluates the gram transform before the
    # size(t) >= K guard (filter pushdown / subexpression elimination can
    # both inline it into a predicate — witnessed on sf0.1), slice(t, 0, K)
    # throws.  The greatest(..., 1) bounds keep the expression TOTAL: short
    # docs yield one throwaway gram and are filtered, never a crash.
    from pdf_extractor_spark.operators.dedup import _winnow_fp_rows
    from pdf_extractor_spark.operators.registry import fan_out

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "only three tokens"),            # < K tokens
         (2, "a b c d e f g"),                # K-1 tokens
         (3, "a b c d e f g h i j"),          # K..K+W-2 grams < W windows
         (4, " ".join(f"w{i % 5}" for i in range(40))),  # real doc
         (5, None), (6, "  ")],
        "doc_id long, text string").write.parquet(p)
    df = fan_out(spark.read.parquet(p), "doc_id")
    out = _winnow_fp_rows(df)
    out.write.format("noop").mode("overwrite").save()
    rows = out.collect()
    assert rows and {r.doc_id for r in rows} == {4}
