"""Driver contract for the PySpark extraction engine.

``queries()``/``oracle_sql()`` are populated from the operator registry
(pdf_extractor_spark/operators/*): every SQL-expressible operator from
SURVEY.md §2 plus the training-data-pipeline suite (dedup, similarity,
text analysis, multimodal plumbing).  ``entry()`` runs the flagship
end-to-end extraction: synthesize Common-Crawl-style pages from the
sf0.001 documents table, run the vectorized kernel pass, and return the
per-language document summary.
"""

from __future__ import annotations

import hashlib
import json
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO))

# Importing these modules populates the registry via @query decorators.
# Imports are UNCONDITIONAL: a module broken by a future change must fail the
# contract loudly, not silently shrink queries()/oracle_sql().
from pdf_extractor_spark.operators import registry  # noqa: E402
from pdf_extractor_spark.operators import (  # noqa: E402,F401
    dedup,
    multimodal,
    ocr,
    pipeline_queries,
    pretrain,
    relational,
    salted,
    similarity,
    textstats,
)

# The driver verifies queries in registration order with a PER-RUN CAP
# (empirically 50 of 86 get CORRECTNESS rows).  A key's old green row only
# certifies the CURRENT code while its defining module is byte-unchanged, so
# ordering is computed, not hand-maintained (VERDICT.md round-2 "rotation
# risk"): VERIFIED.json records, per key, the round of its latest green
# driver row and the md5 of its defining module AT that round
# (scripts/update_verified.py regenerates it from CORRECTNESS_r*.json).
# Keys that are NEW or whose defining module has CHANGED since their green
# row register first (stalest round first); still-certified keys follow,
# oldest certification first, so the cap rotates re-verification through
# the whole registry.  tests/test_driver_contract.py asserts the invariant.


def _module_md5(path: Path, _cache: dict = {}) -> str:
    if path not in _cache:
        _cache[path] = hashlib.md5(path.read_bytes()).hexdigest()
    return _cache[path]


def key_is_stale(key: str, manifest: dict) -> bool:
    """True when the key needs a fresh driver CORRECTNESS row: never
    verified, or its recorded fingerprint no longer matches current code.
    Round-5 ADVICE fix: staleness is PER-KEY (``key_sha`` — the query
    function's transitive same-module source closure + oracle SQL, see
    registry.key_fingerprint) so an unrelated edit elsewhere in the module
    stops staling certified keys; entries predating ``key_sha`` fall back
    to the old whole-module md5."""
    ent = manifest.get(key)
    if ent is None:
        return True
    if "key_sha" in ent:
        return ent["key_sha"] != registry.key_fingerprint(key)
    fn = registry.QUERIES[key]
    mod_file = Path(sys.modules[fn.__module__].__file__).resolve()
    return ent["module_md5"] != _module_md5(mod_file)


def priority_order(queries: dict) -> list[str]:
    """Stale/new keys first (oldest green round first), then fresh keys
    (oldest green round first); registration order breaks ties."""
    try:
        manifest = json.loads((_REPO / "VERIFIED.json").read_text())
    except (OSError, ValueError):
        manifest = {}
    stale: list[tuple] = []
    fresh: list[tuple] = []
    for reg_idx, key in enumerate(queries):
        ent = manifest.get(key)
        if key_is_stale(key, manifest):
            stale.append((ent["round"] if ent else -1, reg_idx, key))
        else:
            fresh.append((ent["round"], reg_idx, key))
    stale.sort()
    fresh.sort()
    return [k for _, _, k in stale] + [k for _, _, k in fresh]


def _ordered(d: dict) -> dict:
    order = priority_order(registry.QUERIES)
    out = {k: d[k] for k in order if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: pages → kernel extraction →
    per-language summary (the Spark form of reference extract_text_only,
    /root/reference/pdf_extractor/core/extractor.py:235-241)."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.pipeline_queries import pages_from_documents
    from pdf_extractor_spark.plans.pipeline import extracted_docs

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    docs = extracted_docs(pages)
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("total_chars").cast("long").alias("total_chars"),
            F.sum("total_words").cast("long").alias("total_words"),
            F.sum("total_links").cast("long").alias("total_links"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(registry.ORACLES)
