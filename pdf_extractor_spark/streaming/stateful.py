"""Custom stateful streaming operator (applyInPandasWithState).

Per-host crawl accounting that SURVIVES restarts: for every host, maintain
(n_docs, total_bytes, last_seen_ts) in group state; each micro-batch emits
the updated totals.  The state store lives in the stream checkpoint, so an
``availableNow`` drain picks up exactly where the previous one stopped —
the stateful complement of the stateless incremental extraction
(streaming/incremental.py).

This is the template for any custom per-key streaming operator the built-in
windowed aggregates can't express (session gaps, per-host rate limits,
dedup-within-horizon): grouped Arrow batches in, explicit state in/out.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schema import PAGES_INPUT_SCHEMA

__all__ = ["host_state_stream", "dedup_stream"]

_OUT_SCHEMA = "host string, n_docs long, total_bytes long, last_ts timestamp"
_STATE_SCHEMA = "n_docs long, total_bytes long, last_ts timestamp"


def _update_host(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_docs, total_bytes, last_ts = state.get
    else:
        n_docs, total_bytes, last_ts = 0, 0, None
    for pdf in pdfs:
        n_docs += len(pdf)
        total_bytes += int(pdf["n_bytes"].sum())
        batch_max: Any = pdf["warc_ts"].max()
        if last_ts is None or (batch_max is not None and batch_max > last_ts):
            last_ts = batch_max
    state.update((n_docs, total_bytes, last_ts))
    yield pd.DataFrame(
        {"host": [key[0]], "n_docs": [n_docs], "total_bytes": [total_bytes],
         "last_ts": [last_ts]}
    )


_DEDUP_OUT = "h string, url string, n_dups long"
_DEDUP_STATE = "n_seen long, keeper string"


def _dedup_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """First occurrence of a content hash becomes the KEEPER (stored in
    state); every batch that touches the hash — first sighting or later
    re-crawls, same run or post-restart — emits the updated
    (hash, keeper, n_dups) row, so duplicate counts stay observable in
    update mode instead of freezing at the first emission."""
    if state.exists:
        n_seen, keeper = state.get
    else:
        n_seen, keeper = 0, None
    for pdf in pdfs:
        for url in pdf["url"]:
            if n_seen == 0:
                keeper = url
            n_seen += 1
    state.update((n_seen, keeper))
    yield pd.DataFrame(
        {"h": [key[0]], "url": [keeper], "n_dups": [n_seen - 1]}
    )


def dedup_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """Streaming exact dedup (dedup-within-horizon): md5 of the raw payload
    -> stateful first-occurrence filter via applyInPandasWithState.  The
    batch text-canonical formulation is operators/dedup.q_dedup_exact; here
    the "have I seen this hash" set IS the group state, so duplicates are
    suppressed across micro-batches AND across restarts (checkpointed state
    store).  At scale the state is hash-partitioned by the content hash —
    the same shuffle key the batch groupBy uses."""
    stream = spark.readStream.schema(PAGES_INPUT_SCHEMA).parquet(in_path)
    hashed = stream.select(F.md5(F.col("html")).alias("h"), "url")
    deduped: DataFrame = hashed.groupBy("h").applyInPandasWithState(
        _dedup_group,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return (
        deduped.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def host_state_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """File-source stream -> per-host stateful running totals (update mode).

    Sink is foreachBatch -> per-micro-batch partition overwrite (the memory
    sink cannot recover a checkpointed query; foreachBatch can, and the
    batch=N overwrite is retry-idempotent like streaming/incremental.py)."""
    stream = spark.readStream.schema(PAGES_INPUT_SCHEMA).parquet(in_path)
    keyed = stream.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        "warc_ts",
        F.length("html").cast("long").alias("n_bytes"),
    )
    updated: DataFrame = keyed.groupBy("host").applyInPandasWithState(
        _update_host,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return (
        updated.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
