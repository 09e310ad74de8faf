"""Multimodal column plumbing (task brief §extras).

Images/audio/video ride as opaque ``binary`` columns with typed metadata.
The Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
signature, partitioning — is real and oracle-tested; the actual codec step
is stubbed (this container ships no image/audio libraries): the stub
"decode" derives metadata as a pure deterministic function of the payload
bytes, so the DuckDB oracle can state the expected output exactly and the
driver's value-hash verifies the full executor-side Python path.

``decode_image_real`` is the marked integration point for a real codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import T, query

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, fmt string"
)
FRAME_SCHEMA = "doc_id long, frame_idx long"


def decode_image_real(payload: bytes) -> dict:
    """Real image decode — NOT IMPLEMENTED in this environment (no Pillow /
    libjpeg in the container).  Swap this in for ``_decode_stub`` when a
    codec is available; the Spark plumbing (schema, batching, partitioning)
    is identical either way."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "deterministic stub (_decode_stub) is used instead"
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decode: metadata as a pure function of the bytes."""
    n = len(payload)
    width = n % 640 + 1
    height = (n * 7) % 480 + 1
    fmt = "png" if n % 2 == 0 else "jpeg"
    return n, width, height, fmt


def _payloads(spark: SparkSession, sf: str) -> DataFrame:
    """documents.text cast to binary plays the opaque media payload."""
    return T(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )


@query(
    "q_mm_decode",
    """
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(strlen(text) % 640 + 1 AS BIGINT) AS width,
           CAST((strlen(text) * 7) % 480 + 1 AS BIGINT) AS height,
           CASE WHEN strlen(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt
    FROM documents
    """,
)
def q_mm_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Binary decode plumbing: mapInPandas over Arrow batches of binary
    payloads → typed metadata rows.  The oracle restates the stub formula in
    SQL, so the driver verifies the whole executor-Python round trip."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_stub(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "fmt": [m[3] for m in metas],
                }
            )

    return _payloads(spark, sf).mapInPandas(decode, schema=DECODE_SCHEMA)


@query(
    "q_mm_frames",
    """
    SELECT doc_id, CAST(f AS BIGINT) AS frame_idx
    FROM (SELECT doc_id, unnest(range(0, strlen(text) % 7 + 1)) AS f
          FROM documents)
    WHERE f % 2 = 0
    """,
)
def q_mm_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-sampling plumbing: one payload → N frame rows (every 2nd frame),
    emitted from the same mapInPandas shape a video frame-sampler would use
    (variable fan-out per input row)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(bytes(b)) % 7 + 1
                for f in range(0, n_frames, 2):
                    ids.append(int(doc_id))
                    idxs.append(f)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs})

    return _payloads(spark, sf).mapInPandas(frames, schema=FRAME_SCHEMA)


def enhance_image_real(payload: bytes) -> bytes:
    """Real image enhance/thumbnail (reference simple_extract.py:52-78:
    contrast x1.3, sharpness x1.5, 600x600 LANCZOS) — NOT IMPLEMENTED here
    (no Pillow in this container, and resampling output is
    library-version-dependent, out of byte-identity scope per SURVEY OP-63)."""
    raise NotImplementedError(
        "image codec not available; deterministic stub (q_mm_thumbnail) "
        "exercises the Spark plumbing instead"
    )


@query(
    "q_mm_thumbnail",
    """
    SELECT doc_id,
           CAST(least(strlen(text) % 640 + 1, 600) AS BIGINT) AS thumb_w,
           CAST(least((strlen(text) * 7) % 480 + 1, 600) AS BIGINT) AS thumb_h,
           CAST(strlen(text) % 997 AS BIGINT) AS payload_hash
    FROM documents
    """,
)
def q_mm_thumbnail(spark: SparkSession, sf: str) -> DataFrame:
    """Enhance/thumbnail plumbing (SURVEY OP-63; ref simple_extract.py:52-78):
    binary in -> binary out through mapInPandas, with the 600x600 bounding-box
    rule on the stub metadata; the oracle restates the deterministic stub."""

    def thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, hh = [], [], []
            for b in pdf["payload"]:
                n, w, h, _f = _decode_stub(bytes(b))
                ws.append(min(w, 600))
                hs.append(min(h, 600))
                hh.append(n % 997)  # stands in for the re-encoded payload id
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "thumb_w": ws, "thumb_h": hs, "payload_hash": hh}
            )

    return _payloads(spark, sf).mapInPandas(
        thumb, schema="doc_id long, thumb_w long, thumb_h long, payload_hash long"
    )
