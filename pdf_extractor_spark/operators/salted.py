"""Explicit skew salting (north rule: "explicit salting for skewed hosts").

Two-phase salted aggregation: phase 1 aggregates on (key, salt) — the hot
key's rows split across ``n_salts`` reducers — phase 2 merges the partials
on the key alone.  AQE's size-based skew splitting cannot see *UDF compute
time* skew (SURVEY.md §4.3.1), so the salt is explicit.

Only algebraic aggregates participate (count/sum/min/max — partials merge
losslessly), which is exactly what the extraction pipeline's host-level
rollups need.  ``host_of`` derives the skew key (host) from the url the
same way on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import T, fan_out, query

__all__ = ["host_of", "salted_agg", "host_stats"]


def host_of(url: Column) -> Column:
    """url -> host (reference analogue: per-source grouping of crawled docs)."""
    return F.parse_url(url, F.lit("HOST"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    counts: list[tuple[str, str]] = (),
    sums: list[tuple[str, str]] = (),
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-phase salted groupBy.

    counts: [(alias, '*')] entries; sums: [(alias, source_col)] entries.
    Result is value-identical to the plain ``df.groupBy(keys).agg(...)`` —
    proven by the driver oracle (q_salted_agg) — but the first shuffle
    spreads each hot key over ``n_salts`` partitions.

    ``salt_col``: optional deterministic per-row expression (e.g.
    ``F.col("url")``) hashed into the salt.  Defaults to hashing ALL input
    columns.  The salt MUST be a deterministic function of row content: a
    nondeterministic shuffle key (rand / monotonically_increasing_id) is the
    SPARK-23207-class hazard — on partial stage replay a re-run map task
    re-salts rows differently, so reducers that fetched the old output vs
    reducers fetching the new one can double-count or drop partials.
    """
    basis = [salt_col] if salt_col is not None else [F.col(c) for c in df.columns]
    salt = F.pmod(F.xxhash64(*basis), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            *[F.count(F.lit(1)).alias(f"_c_{a}") for a, _ in counts],
            *[F.sum(src).alias(f"_s_{a}") for a, src in sums],
        )
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_c_{a}").alias(a) for a, _ in counts],
        *[F.sum(f"_s_{a}").alias(a) for a, _ in sums],
    )


def host_stats(pages: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-host doc/byte rollup of a pages table, salt-protected against the
    heavy-host skew (30% of a crawl on one host is normal)."""
    with_host = pages.select(
        host_of(F.col("url")).alias("host"),
        F.length("html").cast("long").alias("n_bytes"),
        "url",
    )
    return salted_agg(
        with_host, ["host"], n_salts,
        counts=[("n_docs", "*")],
        sums=[("total_bytes", "n_bytes")],
        salt_col=F.col("url"),  # unique per row -> uniform deterministic salt
    ).select("host", "n_docs", "total_bytes")


@query(
    "q_host_salted",
    """
    SELECT source || '.example.org' AS host,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source
    """,
)
def q_host_salted(spark: SparkSession, sf: str) -> DataFrame:
    """North-rule salting on the REAL url shape: synthesize per-doc urls
    (https://{source}.example.org/{doc_id} — the pages_from_documents
    convention), derive host via parse_url, and run the two-phase salted
    rollup.  Few distinct sources x many docs each == every host is hot, the
    exact shape the salt exists for.  Oracle is the plain GROUP BY: salting
    must be invisible in the result."""
    d = T(spark, sf, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("doc_id").cast("string"),
    )
    with_host = d.select(
        host_of(url).alias("host"),
        F.col("n_chars").cast("long").alias("n_chars"),
        "doc_id",
    )
    return salted_agg(
        with_host, ["host"], n_salts=16,
        counts=[("n_docs", "*")],
        sums=[("total_chars", "n_chars")],
        salt_col=F.col("doc_id"),
    ).select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_chars").cast("long").alias("total_chars"),
    )


@query(
    "q_salted_agg",
    """
    SELECT k, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      SELECT CASE WHEN user_id % 10 < 3 THEN 'heavy'
                  ELSE 'u' || CAST(user_id AS VARCHAR) END AS k,
             value
      FROM events)
    GROUP BY k
    """,
)
def q_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Salted two-phase aggregation over an artificially skewed key (30% of
    rows share one key — the heavy-host shape).  The oracle is the PLAIN
    group-by: salting must be invisible in the result."""
    e = T(spark, sf, "events")
    k = F.when(F.col("user_id") % 10 < 3, F.lit("heavy")).otherwise(
        F.concat(F.lit("u"), F.col("user_id").cast("string"))
    )
    skewed = e.select(
        k.alias("k"), F.col("value").cast("decimal(18,2)").alias("v"), "event_id"
    )
    out = salted_agg(
        skewed, ["k"], n_salts=16,
        counts=[("n_events", "*")],
        sums=[("total_value", "v")],
        salt_col=F.col("event_id"),  # unique, deterministic across retries
    )
    return out.select(
        "k",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_value").cast("double").alias("total_value"),
    )
