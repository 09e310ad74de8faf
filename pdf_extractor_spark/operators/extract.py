"""Vectorized extraction UDF (SURVEY.md OP-59/60/61/64/65 as one Arrow pass).

One scalar pandas UDF over the binary payload column: each Arrow batch is
processed in a single Python round-trip (no per-row Python at the Spark
level, per BASELINE.json input_hint).  Replaces the reference's triple
document parse (/root/reference/pdf_extractor/core/extractor.py:116,149,201)
with a single kernel pass per document.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..kernels.dispatch import extract_document
from ..schema import EXTRACTION_SCHEMA

__all__ = ["extract_udf", "with_extraction"]

_FIELDS = [f.name for f in EXTRACTION_SCHEMA.fields]


@pandas_udf(EXTRACTION_SCHEMA)
def extract_udf(payload: pd.Series) -> pd.DataFrame:
    """binary -> full extraction struct (kind/status/title/pages/metadata)."""
    results = [extract_document(bytes(b) if b is not None else b"") for b in payload]
    return pd.DataFrame({name: [r[name] for r in results] for name in _FIELDS})


def with_extraction(df, payload_col: str = "html", out_col: str = "ext"):
    """Attach the extraction struct column; callers select/prune fields so
    only needed data crosses later shuffles."""
    return df.withColumn(out_col, extract_udf(F.col(payload_col)))
