"""KMV cardinality sketch (operators/textstats.q_kmv_distinct): the sketch
must be the true order statistic (pure-Python recompute over the raw
parquet) and the estimate must land within sketch theory's error band."""

import hashlib
import math
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from pdf_extractor_spark.operators.textstats import _KMV_K, q_kmv_distinct


def _shingle_hashes(sf_dir):
    rows = duckdb.sql(
        f"select text from read_parquet('{sf_dir}/documents.parquet') "
        f"where trim(text) <> ''"
    ).fetchall()
    hs = set()
    for (text,) in rows:
        t = [w for w in re.split(r"\s+", text.strip().lower()) if w]
        for i in range(max(len(t) - 2, 0)):
            g = " ".join(t[i:i + 3])
            hs.add(hashlib.md5(g.encode()).hexdigest())
    return hs


def test_sketch_matches_stdlib_order_statistics(spark, sf_dir):
    r = q_kmv_distinct(spark, sf_dir).collect()[0]
    hs = _shingle_hashes(sf_dir)
    assert r.exact_distinct == len(hs)
    kmin = sorted(hs)[:_KMV_K]
    assert r.k_used == len(kmin)
    assert r.kth == kmin[-1]          # the sketch IS the kth order statistic
    assert r.kth_frac == int(kmin[-1][:12], 16) / 16 ** 12  # exact in double


def test_estimate_within_error_band(spark, sf_dir):
    r = q_kmv_distinct(spark, sf_dir).collect()[0]
    assert r.k_used == _KMV_K         # the sketch path actually exercises
    sigma = 1.0 / math.sqrt(_KMV_K - 2)
    rel_err = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
    assert rel_err < 4 * sigma, (r.est_distinct, r.exact_distinct)
