"""Structured-Streaming incremental extraction (SURVEY.md §2.K stretch).

The reference has no streaming constructs; its "incremental extraction" is
an aspirational bullet (/root/reference/generate_word_doc.py:354).  Here the
batch pipeline runs unchanged under Structured Streaming because every stage
is stateless per-url:

* ``stream_extract`` — file-source stream over the pages table →
  ``trigger(availableNow=True)`` → foreachBatch running the SAME
  ``extracted_docs`` plan → per-microbatch partition-overwrite parquet
  (idempotent under retry: batch N always rewrites directory batch=N).
  The stream checkpoint replaces the batch manifest: a killed run resumes
  at the next unprocessed file.
* ``stream_host_windows`` — event-time windowed per-host rollup over
  ``warc_ts`` with a watermark for late data: the crawl-monitoring query.

At 100 TB this is the continuous-ingest shape: new crawl segments land as
files; availableNow drains whatever is new and exits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.pipeline import extracted_docs
from ..schema import PAGES_INPUT_SCHEMA

__all__ = ["stream_extract", "stream_host_windows"]


def stream_extract(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Incremental extraction: drain all new files, then stop (availableNow).

    Output layout ``{out_path}/batch=N`` is overwritten per micro-batch id —
    a retried batch rewrites its own directory, never duplicates it.
    """
    reader = spark.readStream.schema(PAGES_INPUT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_path)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        extracted_docs(batch_df).write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_host_windows(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    table_name: str = "host_windows",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Watermarked event-time windowed rollup: docs/bytes per (host, window).

    Late rows inside the watermark still update their window; older rows are
    dropped — the standard late-data contract.  Complete output mode into an
    in-memory table (the monitoring surface in tests; a real deployment
    would foreachBatch-MERGE into the metrics table)."""
    stream = spark.readStream.schema(PAGES_INPUT_SCHEMA).parquet(in_path)
    agg = (
        stream.select(
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
            "warc_ts",
            F.length("html").cast("long").alias("n_bytes"),
        )
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
