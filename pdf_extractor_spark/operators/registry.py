"""Driver-contract query registry.

Every SQL-expressible operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (when expressible) a DuckDB
oracle SQL string over the same parquet tables.  ``__spark_entry__.py``
exposes these dicts verbatim to the driver.

Portability rules baked into every pair (learned by probing DuckDB 1.0 vs
Spark 4.1 — see tests/test_driver_contract.py which enforces them):

* no DECIMAL / raw TIMESTAMP / BOOLEAN in final outputs — money math runs in
  exact DECIMAL(18,2) then casts to DOUBLE at the end; timestamps are
  formatted to strings; counts/sums of ints are cast to BIGINT (DuckDB's
  sum(INTEGER) is HUGEINT which pandas would coerce to float64);
* per-row derived doubles are bit-identical across engines (same IEEE ops on
  the same parquet values) and may be output raw; *aggregated* doubles are
  order-sensitive in the last ulp and must be decimal-exact or rounded;
* DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all; DuckDB list lambdas use 1-based indices vs posexplode's
  0-based ``pos``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def query(name: str, oracle: str | None = None):
    """Register a driver-contract query (and its DuckDB oracle, if any)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table (plain parquet scan — pushdown-friendly)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition a SMALL scan before CPU-heavy per-row work (explode /
    hash / kernel UDF).  A few-MB parquet file maps to 1-2 input partitions
    (spark.sql.files.maxPartitionBytes), which serializes the expensive
    stage onto 1-2 cores; at 100 TB the scan itself is wide and this is a
    no-op cost-wise (one narrow shuffle of the slim input columns)."""
    sc = df.sparkSession.sparkContext
    n = max(8, sc.defaultParallelism * 2)
    cols = [df[k] for k in keys] if keys else []
    return df.repartition(n, *cols) if cols else df.repartition(n)
