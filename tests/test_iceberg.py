"""Iceberg-real validation (round-3 item 5 / VERDICT.md "Iceberg untested").

Network probe refreshed 2026-08-18 (round 5): DNS resolution to Maven
Central still fails (``urlopen error Name or service not known``), so the
jar remains unobtainable in-sandbox and this module still skips with the
exact precondition below.

This sandbox ships no Iceberg runtime jar and has no network, so the
Iceberg-specific semantics (snapshot lineage, MERGE, time travel) cannot be
exercised here — sources/pages.py transparently falls back to Parquet.
This test makes the precondition EXACT and the validation automatic the
moment a jar is available:

    export ICEBERG_SPARK_RUNTIME_JAR=/path/to/iceberg-spark-runtime-4.0_2.13-<v>.jar

Maven coordinate (PySpark 4.1.x / Scala 2.13):
    org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0
(or the latest ``iceberg-spark-runtime`` published for the Spark 4 line).

With the jar present the test builds a session with a local Hadoop catalog,
writes the corpus as an Iceberg table, checks snapshot history after an
append (the resume/lineage primitive run_extraction's manifest relies on),
and reads a time-travel snapshot.
"""

from __future__ import annotations

import os

import pytest

JAR_ENV = "ICEBERG_SPARK_RUNTIME_JAR"
COORD = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"

jar = os.environ.get(JAR_ENV, "")

pytestmark = pytest.mark.skipif(
    not (jar and os.path.exists(jar)),
    reason=(
        f"no Iceberg runtime jar: set {JAR_ENV} to a local "
        f"iceberg-spark-runtime jar (maven: {COORD}); this sandbox has no "
        "network, so the Parquet fallback path (tests/test_resume.py) is "
        "what certifies the pipeline here"
    ),
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-validate")
        .config("spark.jars", jar)
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.local",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", wh)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_iceberg_write_snapshot_timetravel(iceberg_spark):
    from pdf_extractor_spark.sources.pages import corpus_df, iceberg_available

    spark = iceberg_spark
    assert iceberg_available(spark)
    df = corpus_df(spark, 200, parts=4)
    df.writeTo("local.db.pages").using("iceberg").createOrReplace()
    n0 = spark.table("local.db.pages").count()
    assert n0 == 200

    # append -> second snapshot (the per-bucket lineage unit of
    # run_extraction's manifest: one snapshot id per completed bucket)
    corpus_df(spark, 50, parts=2).writeTo("local.db.pages").append()
    snaps = spark.sql(
        "SELECT snapshot_id, parent_id FROM local.db.pages.snapshots "
        "ORDER BY committed_at"
    ).collect()
    assert len(snaps) >= 2
    assert snaps[1]["parent_id"] == snaps[0]["snapshot_id"]

    # time travel back to the pre-append snapshot
    back = spark.read.option(
        "snapshot-id", snaps[0]["snapshot_id"]
    ).table("local.db.pages")
    assert back.count() == n0
    assert spark.table("local.db.pages").count() == n0 + 50


def test_iceberg_merge_upsert(iceberg_spark):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.sources.pages import corpus_df

    spark = iceberg_spark
    corpus_df(spark, 100, parts=2).writeTo("local.db.merge_t").using(
        "iceberg").createOrReplace()
    updates = corpus_df(spark, 120, parts=2).withColumn(
        "lang", F.lit("xx"))
    updates.createOrReplaceTempView("updates")
    spark.sql(
        "MERGE INTO local.db.merge_t t USING updates s ON t.url = s.url "
        "WHEN MATCHED THEN UPDATE SET t.lang = s.lang "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    out = spark.table("local.db.merge_t")
    assert out.count() == 120
    assert out.filter(F.col("lang") == "xx").count() == 120
