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

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Importing these modules populates the registry via @query decorators.
from pdf_extractor_spark.operators import registry  # noqa: E402
from pdf_extractor_spark.operators import relational  # noqa: E402,F401

for _mod in ("dedup", "similarity", "textstats", "multimodal", "pipeline_queries",
             "salted"):
    try:  # modules land incrementally; the registry only lists what exists
        __import__(f"pdf_extractor_spark.operators.{_mod}")
    except ImportError:
        pass


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
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
