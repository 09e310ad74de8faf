"""End-to-end pipeline queries for the driver contract.

These exercise the REAL extraction path — synthesize input-hint-shaped pages
``(url, warc_ts, html, text, lang)``, run the vectorized kernel UDF
(operators/extract.py), reassemble text — inside a driver query.  The HTML
wrapper template is controlled, so the DOM kernel's output (boilerplate
classification per kernels/dom.py thresholds: MIN_CONTENT_WORDS=8,
noise tags, heading demotion) is *predictable in SQL*: the oracle states
exactly what the Arrow-UDF pipeline must produce per document.  This turns
the driver's value-hash comparison into a true kernel-correctness gate, not
just a rows-only smoke check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import with_extraction
from .registry import T, fan_out, query

# One-line template: no inter-tag whitespace => no stray whitespace-only
# DOM blocks; nav/footer are link-only noise; the article carries the
# document text verbatim.
_PREFIX = (
    '<html><head><meta charset="utf-8"><title>Doc {i}</title></head><body>'
    '<header><nav><a href="/home">home</a> <a href="/about">about</a></nav>'
    "</header><article><h1>Doc {i}</h1><p>"
)
_SUFFIX = (
    '</p></article><footer><a href="/terms">terms of use</a></footer>'
    "</body></html>"
)


def pages_from_documents(spark: SparkSession, sf: str) -> DataFrame:
    """documents table -> input-hint pages table (url, warc_ts, html, text,
    lang).  Deterministic: html is a pure SQL function of (doc_id, text)."""
    d = fan_out(T(spark, sf, "documents"), "doc_id")
    ident = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><head><meta charset="utf-8"><title>Doc '), ident,
        F.lit("</title></head><body>"
              '<header><nav><a href="/home">home</a> <a href="/about">about</a>'
              "</nav></header><article><h1>Doc "), ident,
        F.lit("</h1><p>"), F.col("text"), F.lit(_SUFFIX),
    )
    return d.select(
        "doc_id",
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.org/"), ident).alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.lit("").alias("text"),
        "lang",
    )


# Shared oracle fragment: the DOM kernel's normalized article body and its
# word count, stated relationally.
_BODY_CTE = """
  WITH prep AS (
    SELECT doc_id,
           regexp_replace(trim(text), '\\s+', ' ', 'g') AS body,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS wc
    FROM documents)
"""


@query(
    "q_extract_text",
    _BODY_CTE
    + """
    SELECT doc_id,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           CASE WHEN wc >= 8
                THEN 'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || body
                ELSE '' END AS text
    FROM prep
    """,
)
def q_extract_text(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship kernel gate (OP-64/65 + OP-43b): full Arrow-UDF DOM
    extraction must reproduce, byte-identically, the SQL-stated expectation —
    heading + article body when the body clears MIN_CONTENT_WORDS, else
    empty (heading demoted, kernels/dom.py _classify).  Uses the slim
    doc-level kernel (flat mapInPandas, no nested structs over Arrow); its
    text is proven equal to the full-struct doc_text_expr path in tests."""
    from ..operators.extract import extracted_docs_frame

    pages = pages_from_documents(spark, sf)
    return extracted_docs_frame(pages).select("doc_id", "title", "text")


@query(
    "q_extract_links",
    """
    SELECT doc_id, CAST(3 AS BIGINT) AS n_links,
           '/home,/about,/terms' AS links_csv
    FROM documents
    """,
)
def q_extract_links(spark: SparkSession, sf: str) -> DataFrame:
    """Link harvesting through the kernel (OP-23/31; ref
    extract_cam_followers.py:96-99): every wrapped page carries exactly the
    template's three hrefs, in document order."""
    pages = pages_from_documents(spark, sf)
    ext = with_extraction(pages)
    links = F.col("ext.pages")[0]["links"]
    return ext.select(
        "doc_id",
        F.size(links).cast("long").alias("n_links"),
        F.concat_ws(",", links).alias("links_csv"),
    )


@query(
    "q_extract_blocks",
    _BODY_CTE
    + """
    SELECT doc_id,
           CAST(CASE WHEN wc = 0 THEN 4 ELSE 5 END AS BIGINT) AS n_blocks,
           CAST(CASE WHEN wc >= 8 THEN 2 ELSE 0 END AS BIGINT)
             AS n_content_blocks
    FROM prep
    """,
)
def q_extract_blocks(spark: SparkSession, sf: str) -> DataFrame:
    """Block classification counts (OP-34/64): title + nav + h1 + p + footer
    blocks; exactly {h1, p} classified content when the body has >=8 words."""
    pages = pages_from_documents(spark, sf)
    ext = with_extraction(pages)
    blocks = F.col("ext.pages")[0]["blocks"]
    return ext.select(
        "doc_id",
        F.size(blocks).cast("long").alias("n_blocks"),
        F.size(F.filter(blocks, lambda b: b["is_content"]))
        .cast("long")
        .alias("n_content_blocks"),
    )


@query(
    "q_pipeline_kinds",
    # PDF/raw payload generation isn't SQL-expressible, but the corpus is a
    # pure function of (seed=42, doc_id) — so the expected per-kind summary
    # for the first 300 docs is a CONSTANT, precomputed by running the
    # kernels single-process (the same goldens discipline as tests/golden/).
    """
    SELECT * FROM (VALUES
      ('html', 'ok', CAST(210 AS BIGINT), CAST(210 AS BIGINT)),
      ('pdf',  'ok', CAST(47  AS BIGINT), CAST(109 AS BIGINT)),
      ('raw',  'ok', CAST(43  AS BIGINT), CAST(43  AS BIGINT)))
      t(kind, status, n_docs, total_pages)
    """,
)
def q_pipeline_kinds(spark: SparkSession, sf: str) -> DataFrame:
    """Mixed-dialect corpus gate (OP-01/59/64/65): generate the deterministic
    synthetic corpus (html+pdf+raw, seed=42, 300 docs) executor-side, run the
    full kernel dispatch, summarize per kind — and match the literal expected
    values.  Per-byte goldens for this path live in tests/test_goldens.py."""
    from ..sources.pages import corpus_df

    pages = corpus_df(spark, 300, parts=8)
    ext = with_extraction(pages)
    return (
        ext.select(F.col("ext.kind").alias("kind"),
                   F.col("ext.status").alias("status"),
                   F.col("ext.n_pages").alias("n_pages"))
        .groupBy("kind", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_pages").cast("long").alias("total_pages"))
    )
