"""Skew-salting layer (SURVEY.md §4.3.1 / north rule)."""

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.salted import host_of, host_stats
from pdf_extractor_spark.sources.pages import corpus_df
from pdf_extractor_spark.sources.synth import HEAVY_HOST


def test_host_stats_equals_plain_groupby(spark):
    pages = corpus_df(spark, 400, seed=11, host_skew=0.3)
    salted = {
        (r["host"], r["n_docs"], r["total_bytes"])
        for r in host_stats(pages, n_salts=8).collect()
    }
    plain = {
        (r["host"], r["n_docs"], r["total_bytes"])
        for r in pages.select(
            host_of(F.col("url")).alias("host"),
            F.length("html").cast("long").alias("n_bytes"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .collect()
    }
    assert salted == plain


def test_salt_expression_is_deterministic(spark):
    """The salt must be a pure function of row content (SPARK-23207-class
    retry hazard): no rand / monotonically_increasing_id in the plan, and
    re-computing the salted partials yields identical (key, salt) partials."""
    from pdf_extractor_spark.operators.salted import salted_agg

    pages = corpus_df(spark, 200, seed=11, host_skew=0.3)
    plan = host_stats(pages, n_salts=8)._jdf.queryExecution().analyzed().toString()
    assert "monotonically_increasing_id" not in plan
    assert "rand(" not in plan

    df = pages.select(
        host_of(F.col("url")).alias("host"),
        F.length("html").cast("long").alias("n_bytes"),
        "url",
    )
    # identical input => identical per-(key,salt) partials on every attempt
    def partials():
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(8))
        return {
            (r["host"], r["s"], r["n"])
            for r in df.withColumn("s", salt)
            .groupBy("host", "s")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    assert partials() == partials()


def test_heavy_host_is_actually_skewed(spark):
    """The fixture corpus puts ~30% of docs on one host — the skew the salt
    exists for."""
    pages = corpus_df(spark, 400, seed=11, host_skew=0.3)
    counts = {r["host"]: r["n_docs"] for r in host_stats(pages).collect()}
    assert counts[HEAVY_HOST] > 0.2 * 400
    assert max(c for h, c in counts.items() if h != HEAVY_HOST) < 0.05 * 400
