"""Dedup graph construction: star edges vs clique pairs (round-4 scale
work).  `minhash_star_edges` replaces within-bucket clique enumeration
with doc->bucket-hub links; these tests pin the load-bearing claim that
components — and therefore q_dup_clusters labels — are identical, while
the edge relation is strictly smaller.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.operators.dedup import (
    LSH_CAP,
    _shingle_array,
    minhash_lsh_pairs,
    minhash_star_edges,
    q_dup_clusters,
)


def _components(edges):
    """Reference union-find over an edge list."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_edges_same_components_as_clique(spark, sf_dir):
    base = _shingle_array(spark, sf_dir, LSH_CAP).persist()
    clique = [(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(base).collect()]
    star = [(r.doc_a, r.doc_b) for r in minhash_star_edges(base).collect()]
    assert clique, "fixture corpus must contain near-dups"
    assert len(star) <= len(clique)
    # identical node sets and identical min-label components
    assert {n for e in star for n in e} == {n for e in clique for n in e}
    assert _components(star) == _components(clique)
    base.unpersist()


def test_star_edges_bounded_by_band_rows(spark, sf_dir):
    base = _shingle_array(spark, sf_dir, LSH_CAP)
    n_docs = base.count()
    n_star = minhash_star_edges(base).count()
    assert n_star <= 8 * n_docs  # distinct (hub, doc) <= band rows


def test_dup_clusters_match_union_find_truth(spark, sf_dir):
    # q_dup_clusters now propagates over star edges; its labels must equal
    # union-find over the CLIQUE pairs (the semantic definition)
    base = _shingle_array(spark, sf_dir, LSH_CAP)
    clique = [(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(base).collect()]
    want = _components(clique)
    got = {r.doc_id: r.cluster for r in q_dup_clusters(spark, sf_dir).collect()}
    assert got == want
