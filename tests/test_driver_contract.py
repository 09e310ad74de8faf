"""Driver-contract harness: every registered query vs its DuckDB oracle.

Mimics the driver's CORRECTNESS gate (SURVEY.md §5.2 layer 3): run the Spark
DataFrame query and the oracle SQL on the same parquet tables, then compare
column names, row counts, and an order-insensitive value set.  Cells are
stringified the way a value-hash would see them, so any engine divergence
(decimal vs float rendering, HUGEINT→float64 coercion, regexp semantics)
fails loudly here before the driver sees it.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _norm_cell(v):
    """Canonical string form of one cell — the comparison's hash input.

    Decimals and datetimes are *rejected*: their pandas rendering differs
    between engines (registry.py portability rules)."""
    if v is None:
        return "∅"
    if isinstance(v, decimal.Decimal):
        raise AssertionError(f"Decimal leaked into output: {v!r}")
    if isinstance(v, (datetime.datetime, datetime.date)):
        raise AssertionError(f"raw timestamp leaked into output: {v!r}")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        raise AssertionError(f"boolean leaked into output: {v!r}")
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _spark_rows(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    cols = df.columns
    rows = [tuple(_norm_cell(r[c]) for c in sorted(cols)) for r in df.collect()]
    return sorted(cols), sorted(rows)


def _duck_rows(name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.execute(ORACLES[name])
    cols = [d[0] for d in cur.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    raw = cur.fetchall()
    rows = [tuple(_norm_cell(r[i]) for i in idx) for r in raw]
    con.close()
    return sorted(cols), sorted(rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    s_cols, s_rows = _spark_rows(spark, name)
    d_cols, d_rows = _duck_rows(name)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    if s_rows != d_rows:
        diff_a = [r for r in s_rows if r not in set(d_rows)][:5]
        diff_b = [r for r in d_rows if r not in set(s_rows)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {diff_a}\n oracle-only: {diff_b}"
        )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, name):
    """Non-SQL-expressible queries: driver records a rows-only check."""
    df = QUERIES[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_cap_constants_embedded_in_oracles():
    """Demo-window caps live in ONE named constant per query family and the
    oracle SQL must embed exactly that value (round-2 VERDICT: caps as twin
    literals could silently desynchronize query and oracle)."""
    from pdf_extractor_spark.operators.dedup import LSH_CAP, NGRAM_CAP
    from pdf_extractor_spark.operators.similarity import COSINE_CAP

    assert f"doc_id < {NGRAM_CAP} " in ORACLES["q_dedup_ngram"]
    for key in ("q_minhash_lsh", "q_dedup_verify", "q_pagerank_iter",
                "q_dup_clusters"):
        assert f"doc_id < {LSH_CAP} " in ORACLES[key]
    assert ORACLES["q_dedup_cosine"].count(f"< {COSINE_CAP} ") + \
        ORACLES["q_dedup_cosine"].count(f"< {COSINE_CAP}\n") >= 1


def test_priority_rotation_guard():
    """Driver-cap rotation (VERDICT.md round-2 finding): every key that is
    NEW or whose defining module changed since its last green CORRECTNESS
    row must register before every still-certified key, and all stale keys
    must fit inside the driver's ~50-row verification cap so no stale green
    row survives a round silently."""
    import hashlib
    import json
    import sys
    from pathlib import Path

    repo = Path(entry_mod.__file__).resolve().parent
    manifest_path = repo / "VERIFIED.json"
    assert manifest_path.exists(), "VERIFIED.json missing — run scripts/update_verified.py"
    manifest = json.loads(manifest_path.read_text())

    queries = entry_mod.queries()  # already priority-ordered
    order = list(queries)

    def is_stale(key):
        ent = manifest.get(key)
        if ent is None:
            return True
        mod = Path(sys.modules[entry_mod.registry.QUERIES[key].__module__].__file__)
        return ent["module_md5"] != hashlib.md5(mod.read_bytes()).hexdigest()

    staleness = [is_stale(k) for k in order]
    n_stale = sum(staleness)
    # stale block is a strict prefix
    assert staleness == [True] * n_stale + [False] * (len(order) - n_stale), (
        "stale keys must all register before certified keys: "
        + str([k for k, s in zip(order, staleness) if s])
    )
    # The driver verifies at most 50 keys/round.  Ideally every stale key
    # gets a row; module-level staleness is deliberately CONSERVATIVE (one
    # helper edit marks every key in the module stale), so a small overflow
    # is tolerated when it is provably the least-risk tail: the overflow
    # keys must each carry a green row from the LATEST recorded round (the
    # most recently certified), never a never-verified key — those must all
    # sit inside the window.  Overflow keys lead the NEXT round's window by
    # construction (stale sorts round-ascending), and the local full-oracle
    # suite (this file) value-verifies every key each run regardless.
    overflow = order[50:n_stale] if n_stale > 50 else []
    assert n_stale <= 55, (
        f"{n_stale} stale keys far exceed the driver's 50-row cap; split "
        "the change across rounds or re-verify modules incrementally"
    )
    latest_round = max(e["round"] for e in manifest.values())
    for k in overflow:
        ent = manifest.get(k)
        assert ent is not None, (
            f"never-verified key {k} fell outside the driver's 50-row "
            "window; reorder or reduce stale modules"
        )
        assert ent["round"] == latest_round, (
            f"overflow key {k} last certified in round {ent['round']} < "
            f"{latest_round}; only the most recently certified keys may "
            "defer to the next round"
        )
    # certified keys rotate oldest-round-first so old certifications refresh
    fresh_rounds = [manifest[k]["round"] for k in order[n_stale:]]
    assert fresh_rounds == sorted(fresh_rounds)
