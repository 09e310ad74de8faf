"""SURVEY.md §2 relational operators as driver-contract queries.

Each query re-expresses one reference dataflow operator (cited per entry)
over the driver's synthetic tables, with a value-identical DuckDB oracle.
All queries are pure DataFrame API — Catalyst handles pushdown/pruning; the
only shuffles are the groupBy/join/window the semantics genuinely require.

Scale notes are inline: every groupBy keys on a bounded-cardinality column
or a pre-filtered subset; every join is either broadcast-sized or
key-partitioned; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import T, query

# ---------------------------------------------------------------------------
# A. Scans / metadata (OP-03, OP-04, OP-06)
# ---------------------------------------------------------------------------


@query(
    "q_doc_stats",
    """
    SELECT doc_id, lang, source, n_chars,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
    """,
)
def q_doc_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Metadata scan (OP-06; ref core/extractor.py:196-223): plain projection
    + derived byte/char size, no shuffle, column-pruned at the parquet scan."""
    return T(spark, sf, "documents").select(
        "doc_id", "lang", "source", "n_chars",
        F.length("text").cast("long").alias("text_len"),
    )


@query(
    "q_page_subset",
    """
    SELECT l_linenumber, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem WHERE l_linenumber IN (1, 2, 3)
    GROUP BY l_linenumber
    """,
)
def q_page_subset(spark: SparkSession, sf: str) -> DataFrame:
    """Page-subset scan (OP-03; ref core/extractor.py:119-120): the IN-list
    predicate reaches the parquet scan (PushedFilters), then a partial+final
    hash agg on a 3-value key — no skew possible."""
    li = T(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_linenumber").isin(1, 2, 3))
        .groupBy("l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "q_source_dedupe_sort",
    """
    SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS rk
    FROM (SELECT DISTINCT source FROM documents)
    """,
)
def q_source_dedupe_sort(spark: SparkSession, sf: str) -> DataFrame:
    """Glob-source dedupe+sort (OP-04/50/57; ref simple_extract.py:105-111):
    distinct then rank.  The global window is fine here because the distinct
    key space is tiny (sources), never the raw rows."""
    src = T(spark, sf, "documents").select("source").distinct()
    w = Window.orderBy("source")
    return src.withColumn("rk", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# C. Projections / scalar functions
# ---------------------------------------------------------------------------


@query(
    "q_trim",
    "SELECT doc_id, trim(substr(text, 1, 60)) AS trimmed FROM documents",
)
def q_trim(spark: SparkSession, sf: str) -> DataFrame:
    """Text strip (OP-12; ref text_extractor.py:56)."""
    return T(spark, sf, "documents").select(
        "doc_id", F.trim(F.substring("text", 1, 60)).alias("trimmed")
    )


@query(
    "q_char_word_count",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS char_count,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                AS BIGINT) AS word_count
    FROM documents
    """,
)
def q_char_word_count(spark: SparkSession, sf: str) -> DataFrame:
    """Char/word counts (OP-13; ref extraction_result.py:20-23) — derived
    relationally (length / size(split)), never stored Python-side."""
    d = T(spark, sf, "documents")
    trimmed = F.trim(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("char_count"),
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("long")
        .alias("word_count"),
    )


@query(
    "q_ws_collapse",
    """
    SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS collapsed
    FROM documents
    """,
)
def q_ws_collapse(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace collapse (OP-14; ref table_extractor.py:127-129)."""
    return T(spark, sf, "documents").select(
        "doc_id",
        F.regexp_replace(F.trim(F.col("text")), r"\s+", " ").alias("collapsed"),
    )


@query(
    "q_coalesce",
    """
    SELECT event_id, coalesce(nullif(event_type, 'error'), 'none') AS et
    FROM events
    """,
)
def q_coalesce(spark: SparkSession, sf: str) -> DataFrame:
    """Null→default coalesce (OP-15; ref table_extractor.py:123-124)."""
    e = T(spark, sf, "events")
    return e.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("none"))
        .alias("et"),
    )


@query(
    "q_sanitize",
    """
    SELECT p_partkey,
           CASE WHEN t = '' THEN 'unnamed' ELSE substr(t, 1, 200) END AS safe
    FROM (
      SELECT p_partkey,
             trim(regexp_replace(p_name || ': <v1>/x ', '[<>:"/\\\\|?*]', '_', 'g'),
                  ' .') AS t
      FROM part
    )
    """,
)
def q_sanitize(spark: SparkSession, sf: str) -> DataFrame:
    """Filename sanitize (OP-16; ref file_utils.py:63-80): forbidden-char
    regex → strip ' .' → cap 200 → 'unnamed' fallback."""
    p = T(spark, sf, "part")
    dirty = F.concat(F.col("p_name"), F.lit(": <v1>/x "))
    cleaned = F.regexp_replace(dirty, r'[<>:"/\\|?*]', "_")
    p = p.select("p_partkey", cleaned.alias("t0"))
    p = p.withColumn("t", F.expr("trim(BOTH ' .' FROM t0)"))
    return p.select(
        "p_partkey",
        F.when(F.col("t") == "", F.lit("unnamed"))
        .otherwise(F.substring("t", 1, 200))
        .alias("safe"),
    )


@query(
    "q_artifact_name",
    """
    SELECT event_id,
           printf('page_%04d_%s_%03d.%s',
                  event_id % 9999, event_type, user_id % 999, 'png') AS artifact
    FROM events
    """,
)
def q_artifact_name(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic artifact naming (OP-17; ref file_utils.py:27-60)."""
    e = T(spark, sf, "events")
    return e.select(
        "event_id",
        F.format_string(
            "page_%04d_%s_%03d.%s",
            F.col("event_id") % 9999,
            F.col("event_type"),
            F.col("user_id") % 999,
            F.lit("png"),
        ).alias("artifact"),
    )


@query(
    "q_stem",
    """
    SELECT doc_id,
           regexp_extract('/data/' || source || '/' || CAST(doc_id AS VARCHAR)
                          || '.html', '([^/]+)\\.[^.]+$', 1) AS stem
    FROM documents
    """,
)
def q_stem(spark: SparkSession, sf: str) -> DataFrame:
    """File-stem extraction (OP-18; ref file_utils.py:83-93)."""
    d = T(spark, sf, "documents")
    path = F.concat(
        F.lit("/data/"), F.col("source"), F.lit("/"),
        F.col("doc_id").cast("string"), F.lit(".html"),
    )
    return d.select(
        "doc_id", F.regexp_extract(path, r"([^/]+)\.[^.]+$", 1).alias("stem")
    )


@query(
    "q_kb_round",
    "SELECT doc_id, round(n_chars / 1024.0, 2) AS kb FROM documents",
)
def q_kb_round(spark: SparkSession, sf: str) -> DataFrame:
    """KB rounding (OP-20; ref simple_extract.py:48).  n_chars/1024 is always
    binary-exact, so HALF_UP (Spark) and half-away (DuckDB) agree."""
    return T(spark, sf, "documents").select(
        "doc_id", F.round(F.col("n_chars") / 1024.0, 2).alias("kb")
    )


# ---------------------------------------------------------------------------
# D. Filters / predicates
# ---------------------------------------------------------------------------


@query(
    "q_bounds",
    """
    SELECT l_linenumber, CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem WHERE l_linenumber BETWEEN 2 AND 5
    GROUP BY l_linenumber
    """,
)
def q_bounds(spark: SparkSession, sf: str) -> DataFrame:
    """Range-bounds predicate (OP-24; ref core/extractor.py:126)."""
    li = T(spark, sf, "lineitem")
    return (
        li.filter((F.col("l_linenumber") >= 2) & (F.col("l_linenumber") <= 5))
        .groupBy("l_linenumber")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "q_min_size",
    """
    SELECT p_partkey, p_size, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE)
           AS price
    FROM part WHERE p_size >= 25 AND p_retailprice >= 1000
    """,
)
def q_min_size(spark: SparkSession, sf: str) -> DataFrame:
    """Min-size conjunctive filter (OP-25; ref image_extractor.py:124-128) —
    applied before any expensive projection, mirroring the reference's
    filter-before-PNG-encode ordering."""
    p = T(spark, sf, "part")
    return p.filter((F.col("p_size") >= 25) & (F.col("p_retailprice") >= 1000)).select(
        "p_partkey", "p_size",
        F.col("p_retailprice").cast("decimal(18,2)").cast("double").alias("price"),
    )


@query(
    "q_block_type",
    "SELECT event_id, user_id FROM events WHERE event_type = 'click'",
)
def q_block_type(spark: SparkSession, sf: str) -> DataFrame:
    """Block-type equality filter (OP-26; ref text_extractor.py:142-143)."""
    return T(spark, sf, "events").filter(F.col("event_type") == "click").select(
        "event_id", "user_id"
    )


@query(
    "q_nonempty",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE trim(text) <> ''
    """,
)
def q_nonempty(spark: SparkSession, sf: str) -> DataFrame:
    """Non-empty text filter (OP-27; ref text_extractor.py:144-145)."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "q_row_nonempty",
    """
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words
    FROM documents
    WHERE trim(text) <> ''
      AND len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                          w -> length(w) > 6)) > 0
    """,
)
def q_row_nonempty(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order EXISTS filter (OP-28; ref table_extractor.py:131-133):
    keep rows where any array element passes the predicate."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    words = F.split(F.trim(F.col("text")), r"\s+")
    return d.filter(F.exists(words, lambda w: F.length(w) > 6)).select(
        "doc_id", F.size(words).cast("long").alias("n_words")
    )


@query(
    "q_conf",
    """
    SELECT event_id, value FROM events
    WHERE value > 30 AND event_type <> 'error'
    """,
)
def q_conf(spark: SparkSession, sf: str) -> DataFrame:
    """Confidence filter (OP-29; ref ocr_extractor.py:152-156)."""
    return T(spark, sf, "events").filter(
        (F.col("value") > 30) & (F.col("event_type") != "error")
    ).select("event_id", "value")


@query(
    "q_ext_filter",
    """
    SELECT doc_id, lower(ext) AS ext FROM (
      SELECT doc_id,
             CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'JPG' WHEN 1 THEN 'png'
                  WHEN 2 THEN 'txt' WHEN 3 THEN 'Gif' ELSE 'bmp' END AS ext
      FROM documents)
    WHERE lower(ext) IN ('jpg', 'png', 'gif')
    """,
)
def q_ext_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Case-insensitive extension whitelist (OP-30; ref simple_extract.py:105-109)."""
    d = T(spark, sf, "documents")
    ext = (
        F.when(F.col("doc_id") % 5 == 0, "JPG")
        .when(F.col("doc_id") % 5 == 1, "png")
        .when(F.col("doc_id") % 5 == 2, "txt")
        .when(F.col("doc_id") % 5 == 3, "Gif")
        .otherwise("bmp")
    )
    d = d.select("doc_id", ext.alias("ext"))
    return d.filter(F.lower(F.col("ext")).isin("jpg", "png", "gif")).select(
        "doc_id", F.lower(F.col("ext")).alias("ext")
    )


@query(
    "q_valid_suffix",
    """
    SELECT doc_id, path FROM (
      SELECT doc_id, '/d/' || CAST(doc_id AS VARCHAR) ||
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '.pdf' WHEN 1 THEN '.PDF'
                  ELSE '.html' END AS path
      FROM documents)
    WHERE lower(path) LIKE '%.pdf'
    """,
)
def q_valid_suffix(spark: SparkSession, sf: str) -> DataFrame:
    """Suffix validation (OP-32; ref file_utils.py:96-117) as a filter with an
    error side-channel instead of a raise."""
    d = T(spark, sf, "documents")
    path = F.concat(
        F.lit("/d/"), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, ".pdf")
        .when(F.col("doc_id") % 3 == 1, ".PDF")
        .otherwise(".html"),
    )
    d = d.select("doc_id", path.alias("path"))
    return d.filter(F.lower(F.col("path")).like("%.pdf"))


# ---------------------------------------------------------------------------
# E. Explode / flatten
# ---------------------------------------------------------------------------


@query(
    "q_explode_pages",
    """
    SELECT doc_id, u.w AS word, CAST(u.i AS BIGINT) AS wpos
    FROM (
      SELECT doc_id,
             unnest(list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                   (w, i) -> struct_pack(w := w, i := i))) AS u
      FROM documents WHERE doc_id < 50 AND trim(text) <> '')
    """,
)
def q_explode_pages(spark: SparkSession, sf: str) -> DataFrame:
    """Doc→items positional explode (OP-33; ref core/extractor.py:124-131).
    posexplode is 0-based; DuckDB lambdas are 1-based → emit pos+1."""
    d = T(spark, sf, "documents").filter(
        (F.col("doc_id") < 50) & (F.trim(F.col("text")) != "")
    )
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "word"),
    ).select("doc_id", "word", (F.col("pos") + 1).cast("long").alias("wpos"))


@query(
    "q_explode_blocks",
    """
    SELECT vec_id, CAST(u.i AS BIGINT) AS dim,
           round(CAST(u.v AS DOUBLE), 4) AS val
    FROM (
      SELECT vec_id,
             unnest(list_transform(embedding,
                                   (v, i) -> struct_pack(v := v, i := i))) AS u
      FROM embeddings WHERE vec_id < 20)
    """,
)
def q_explode_blocks(spark: SparkSession, sf: str) -> DataFrame:
    """Array-column positional explode (OP-34/35; ref text_extractor.py:140-149)."""
    e = T(spark, sf, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(F.col("v").cast("double"), 4).alias("val"),
    )


@query(
    "q_explode_props",
    """
    SELECT vec_id, CAST(u.i AS BIGINT) AS dim,
           round(CAST(u.v AS DOUBLE), 4) AS val
    FROM (
      SELECT vec_id,
             unnest(list_transform(embedding[1:8],
                                   (v, i) -> struct_pack(v := v, i := i))) AS u
      FROM embeddings WHERE vec_id < 40)
    """,
)
def q_explode_props(spark: SparkSession, sf: str) -> DataFrame:
    """Slice-then-explode (OP-35/38): array slice prunes before the explode
    fan-out — at scale this bounds the row multiplication factor."""
    e = T(spark, sf, "embeddings").filter(F.col("vec_id") < 40)
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "v")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(F.col("v").cast("double"), 4).alias("val"),
    )


@query(
    "q_nested_explode",
    """
    SELECT doc_id, CAST(s.i AS BIGINT) AS seg_idx, CAST(w.i AS BIGINT) AS word_idx,
           w.w AS word
    FROM (
      SELECT doc_id, s,
             unnest(list_transform(regexp_split_to_array(trim(s.seg), '\\s+'),
                                   (w, i) -> struct_pack(w := w, i := i))) AS w
      FROM (
        SELECT doc_id,
               unnest(list_transform(string_split(text, ' the '),
                                     (seg, i) -> struct_pack(seg := seg, i := i)))
               AS s
        FROM documents WHERE doc_id < 30)
      WHERE trim(s.seg) <> '')
    """,
)
def q_nested_explode(spark: SparkSession, sf: str) -> DataFrame:
    """Nested explode: table→rows→cells (OP-37; ref table_extractor.py:117-133)."""
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 30)
    segs = d.select(
        "doc_id", F.posexplode(F.split("text", " the ")).alias("spos", "seg")
    ).filter(F.trim(F.col("seg")) != "")
    return segs.select(
        "doc_id",
        (F.col("spos") + 1).cast("long").alias("seg_idx"),
        F.posexplode(F.split(F.trim(F.col("seg")), r"\s+")).alias("wpos", "word"),
    ).select(
        "doc_id", "seg_idx",
        (F.col("wpos") + 1).cast("long").alias("word_idx"), "word",
    )


# ---------------------------------------------------------------------------
# F. Aggregations
# ---------------------------------------------------------------------------


@query(
    "q_group_collect",
    """
    SELECT user_id, string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)
           AS event_ids
    FROM events GROUP BY user_id
    """,
)
def q_group_collect(spark: SparkSession, sf: str) -> DataFrame:
    """Group-and-collect (OP-39; ref ocr_extractor.py:326-333).  collect_list
    order is nondeterministic → always array_sort before serializing."""
    e = T(spark, sf, "events")
    ids = F.array_sort(F.collect_list("event_id"))
    return e.groupBy("user_id").agg(
        F.concat_ws(",", F.transform(ids, lambda x: x.cast("string")))
        .alias("event_ids")
    )


@query(
    "q_page_summary",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clicks,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_page_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Per-key conditional summary (OP-40; ref extraction_result.py:100-104)."""
    e = T(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n_clicks"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
        .alias("total_value"),
    )


@query(
    "q_doc_summary",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def q_doc_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc→corpus summary rollup (OP-41; ref extraction_result.py:126-130)."""
    return T(spark, sf, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "q_count_by_key",
    """
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_count_by_key(spark: SparkSession, sf: str) -> DataFrame:
    """Count-by-key detection (OP-42; ref table_extractor.py:217-248)."""
    return T(spark, sf, "lineitem").groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q_totals",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_text_len,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def q_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Global running totals (OP-43/46/47; ref extract_cam_followers.py:44-45)."""
    return T(spark, sf, "documents").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_text_len"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "q_ordered_concat",
    """
    SELECT lang, string_agg(substr(text, 1, 10), chr(10) ORDER BY doc_id) AS body
    FROM documents GROUP BY lang
    """,
)
def q_ordered_concat(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered text reassembly (OP-43b; ref ocr_extractor.py:293-298) — the
    byte-identity-critical aggregate: explicit sort key (doc_id), never row
    order.  array_sort on (doc_id, snip) structs sorts by doc_id first."""
    d = T(spark, sf, "documents").select(
        "lang", F.struct("doc_id", F.substring("text", 1, 10).alias("snip")).alias("s")
    )
    return d.groupBy("lang").agg(
        F.concat_ws(
            "\n", F.transform(F.array_sort(F.collect_list("s")), lambda s: s["snip"])
        ).alias("body")
    )


@query(
    "q_analyze",
    """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents GROUP BY source
    """,
)
def q_analyze(spark: SparkSession, sf: str) -> DataFrame:
    """Analyze projection (OP-44; ref core/extractor.py:275-284)."""
    return T(spark, sf, "documents").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )


@query(
    "q_table_shape",
    """
    SELECT doc_id, CAST(len(grid) AS BIGINT) AS n_rows,
           CAST(list_max(list_transform(grid, r -> len(r))) AS BIGINT) AS n_cols
    FROM (
      SELECT doc_id,
             list_transform(string_split(text, ' the '),
                            seg -> regexp_split_to_array(trim(seg), '\\s+')) AS grid
      FROM documents WHERE doc_id < 60)
    """,
)
def q_table_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Ragged-grid shape (OP-45; ref extraction_result.py:69-72):
    rows=len(grid), cols=max row width via higher-order transform."""
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 60)
    grid = F.transform(
        F.split("text", " the "), lambda seg: F.split(F.trim(seg), r"\s+")
    )
    d = d.select("doc_id", grid.alias("grid"))
    return d.select(
        "doc_id",
        F.size("grid").cast("long").alias("n_rows"),
        F.array_max(F.transform("grid", lambda r: F.size(r))).cast("long")
        .alias("n_cols"),
    )


# ---------------------------------------------------------------------------
# G. Sorts / windows / ranking
# ---------------------------------------------------------------------------


@query(
    "q_reading_order",
    """
    SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS trail
    FROM events GROUP BY user_id
    """,
)
def q_reading_order(spark: SparkSession, sf: str) -> DataFrame:
    """Reading-order sort (OP-48; ref text_extractor.py:53): multi-key (y,x)
    ≙ (ts, event_id) order inside each group, shuffle-once groupBy —
    struct array_sort keeps it off the Window path (no extra exchange)."""
    e = T(spark, sf, "events").select(
        "user_id", F.struct("ts", "event_id", "event_type").alias("s")
    )
    return e.groupBy("user_id").agg(
        F.concat_ws(
            ">", F.transform(F.array_sort(F.collect_list("s")), lambda s: s["event_type"])
        ).alias("trail")
    )


@query(
    "q_multikey_sort",
    """
    SELECT user_id, CAST(rn AS BIGINT) AS rn, event_id, value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events)
    WHERE rn <= 3
    """,
)
def q_multikey_sort(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k per key via multi-key window sort (OP-49; ref
    ocr_extractor.py:336-341).  Ties broken by event_id → deterministic."""
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", F.col("rn").cast("long").alias("rn"), "event_id", "value")
    )


@query(
    "q_row_number",
    """
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    """,
)
def q_row_number(spark: SparkSession, sf: str) -> DataFrame:
    """Per-partition item index (OP-51/52; ref image_extractor.py:67)."""
    d = T(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return d.select(
        "doc_id", "lang", F.row_number().over(w).cast("long").alias("rn")
    )


# ---------------------------------------------------------------------------
# H. Joins
# ---------------------------------------------------------------------------


@query(
    "q_outer_zip",
    """
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_clicks,
           CAST(coalesce(p.n, 0) AS BIGINT) AS n_purchases
    FROM (SELECT user_id, count(*) n FROM events WHERE event_type = 'click'
          GROUP BY user_id) c
    FULL OUTER JOIN
         (SELECT user_id, count(*) n FROM events WHERE event_type = 'purchase'
          GROUP BY user_id) p
    ON c.user_id = p.user_id
    """,
)
def q_outer_zip(spark: SparkSession, sf: str) -> DataFrame:
    """Per-page result zip = full outer join with [] default (OP-53; ref
    core/extractor.py:158-167).  Both sides pre-aggregated and co-partitioned
    on the join key → single shuffle each, no broadcast needed."""
    e = T(spark, sf, "events")
    c = e.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cn")
    )
    p = e.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("pn")
    )
    j = c.join(p, "user_id", "full_outer")
    return j.select(
        "user_id",
        F.coalesce(F.col("cn"), F.lit(0)).cast("long").alias("n_clicks"),
        F.coalesce(F.col("pn"), F.lit(0)).cast("long").alias("n_purchases"),
    )


@query(
    "q_left_join",
    """
    SELECT c.c_custkey, c.c_mktsegment, CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN
         (SELECT o_custkey, count(*) n FROM orders GROUP BY o_custkey) o
    ON c.c_custkey = o.o_custkey
    """,
)
def q_left_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-join enrich (OP-54; ref core/extractor.py:289-293): customers with
    zero orders kept, count coalesced to 0."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_mktsegment",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
    )


@query(
    "q_equi_join",
    """
    SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q_equi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Dimension equi-join (OP-55; ref generate_word_doc.py:239-247): fact ⋈
    small dim → broadcast the dim explicitly so the fact side never shuffles
    for the join (only the final tiny agg shuffles)."""
    li = T(spark, sf, "lineitem")
    p = T(spark, sf, "part").select("p_partkey", "p_brand")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@query(
    "q_cross_filter",
    """
    SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_pairs
    FROM region r CROSS JOIN nation n
    WHERE r.r_regionkey <> n.n_regionkey
    GROUP BY r.r_name
    """,
)
def q_cross_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Cartesian generate + constraint filter (OP-56; ref
    generate_word_doc.py:230-237).  Only ever on bounded dims (5×25)."""
    r = T(spark, sf, "region")
    n = T(spark, sf, "nation")
    return (
        r.crossJoin(n)
        .filter(F.col("r_regionkey") != F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# I. Set operations
# ---------------------------------------------------------------------------


@query(
    "q_distinct",
    "SELECT DISTINCT lang, source FROM documents",
)
def q_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Dedupe (OP-57; ref simple_extract.py:111)."""
    return T(spark, sf, "documents").select("lang", "source").distinct()


@query(
    "q_union",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT doc_id, lang FROM documents WHERE lang = 'en'
      UNION
      SELECT doc_id, lang FROM documents WHERE n_chars < 200
    ) GROUP BY lang
    """,
)
def q_union(spark: SparkSession, sf: str) -> DataFrame:
    """Union + dedupe (OP-58; ref simple_extract.py:107-109)."""
    d = T(spark, sf, "documents")
    a = d.filter(F.col("lang") == "en").select("doc_id", "lang")
    b = d.filter(F.col("n_chars") < 200).select("doc_id", "lang")
    return a.unionByName(b).distinct().groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q_rollup",
    """
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def q_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical rollup (SURVEY §F note: the natural per-lang/per-source
    corpus summary).  Spark ROLLUP and ANSI ROLLUP agree on the NULL
    indicator convention for aggregated-out levels."""
    return T(spark, sf, "documents").rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "q_semi_join",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join (customers having orders).  Semi joins ship only the
    join key of the probe side — the cheapest existence test at scale."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_anti_join",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join (customers without orders) — the checkpoint-resume
    restart primitive (SURVEY §H: skip urls already extracted)."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_dedup_apply",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
    FROM documents d
    JOIN (SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS h,
                 min(doc_id) AS keeper
          FROM documents GROUP BY 1) k
      ON d.doc_id = k.keeper
    GROUP BY lang
    """,
)
def q_dedup_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup APPLICATION: keep exactly one doc (smallest doc_id) per
    canonical-text hash group and count survivors per language — the
    semi-join-shaped second half of exact dedup (q_dedup_exact finds the
    groups; this prunes the corpus)."""
    d = T(spark, sf, "documents")
    h = F.md5(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")).cast("binary")
    )
    keepers = (
        d.select(h.alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keeper"))
        .select("keeper")
    )
    return (
        d.join(keepers, d.doc_id == keepers.keeper, "left_semi")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@query(
    "q_asof_join",
    """
    SELECT p.event_id, p.user_id,
           CAST(min(date_diff('microsecond', v.ts, p.ts)) AS BIGINT)
             AS view_gap_us
    FROM events p JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
)
def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (custom-operator list): each purchase matched to the
    latest prior view by the same user — composed as equi-join on the user
    key + time predicate + min-gap, so the only shuffle is the user-key hash
    join both sides already need.  (Purchases with no prior view drop out —
    inner as-of.)  Output is the exact gap in MICROSECONDS: integer epoch
    arithmetic on the stored TIMESTAMP_NTZ values — engine- and
    timezone-independent, unlike formatted timestamps."""
    e = T(spark, sf, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    gap = F.expr("timestampdiff(MICROSECOND, v_ts, p_ts)")
    return (
        p.join(v, (p.user_id == v.v_user) & (v.v_ts <= p.p_ts))
        .groupBy("event_id", "user_id")
        .agg(F.min(gap).cast("long").alias("view_gap_us"))
    )


@query(
    "q_range_join",
    """
    SELECT a.event_id, CAST(count(*) AS BIGINT) AS n_nearby
    FROM events a JOIN events b
      ON b.user_id = a.user_id AND b.event_id <> a.event_id
     AND b.ts BETWEEN a.ts - INTERVAL 30 MINUTE AND a.ts + INTERVAL 30 MINUTE
    WHERE a.event_type = 'error'
    GROUP BY a.event_id
    """,
)
def q_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Range (interval) join (custom-operator list): events within ±30 min
    of each error by the same user.  The equi user key carries the hash
    join; the time range is a post-join band filter — the standard Spark
    range-join shape (a real deployment adds a time-bucket key to bound the
    band, same as the LSH bucketing idea)."""
    e = T(spark, sf, "events")
    a = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("a_ts")
    )
    b = e.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    half = F.expr("INTERVAL 30 MINUTE")
    return (
        a.join(
            b,
            (a.user_id == b.b_user)
            & (b.b_id != a.event_id)
            & (b.b_ts >= a.a_ts - half)
            & (b.b_ts <= a.a_ts + half),
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_nearby"))
    )


@query(
    "q_pivot",
    """
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
             AS click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
             AS view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS purchase
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (long→wide): per-user counts by event type with an EXPLICIT
    value list — open-ended pivots require a distinct-values pre-pass that
    is a full extra scan at 100 TB."""
    return (
        T(spark, sf, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .count()
        .select(
            "user_id",
            F.coalesce("click", F.lit(0)).cast("long").alias("click"),
            F.coalesce("view", F.lit(0)).cast("long").alias("view"),
            F.coalesce("purchase", F.lit(0)).cast("long").alias("purchase"),
        )
    )


@query(
    "q_cube",
    """
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY CUBE (lang, source)
    """,
)
def q_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets (all 4 aggregation levels in one pass)."""
    return T(spark, sf, "documents").cube("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q_moving_avg",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS mavg
    FROM events
    """,
)
def q_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-spec window (3-event moving average per user): rowsBetween
    arithmetic over a deterministic (ts, event_id) order — frame sums are
    sequential, so the doubles match across engines before the round."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return T(spark, sf, "events").select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("mavg")
    )


@query(
    "q_fuzzy",
    """
    SELECT p_partkey, p_brand, CAST(levenshtein(lower(p_brand), 'brand#33') AS
           BIGINT) AS dist
    FROM part WHERE levenshtein(lower(p_brand), 'brand#33') <= 2
    """,
)
def q_fuzzy(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy matching by edit distance (typo-tolerant dimension lookup).
    At scale this runs per-row against a broadcast pattern set, never as a
    string cross-join."""
    p = T(spark, sf, "part")
    dist = F.levenshtein(F.lower(F.col("p_brand")), F.lit("brand#33"))
    return p.filter(dist <= 2).select(
        "p_partkey", "p_brand", dist.cast("long").alias("dist")
    )


@query(
    "q_array_ops",
    """
    SELECT doc_id,
           CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
           CAST(len(list_intersect(list_distinct(ws),
                ['the','a','and','of','to'])) AS BIGINT) AS n_stop,
           CAST(len(list_filter(ws, w -> length(w) >= 6)) AS BIGINT) AS n_long
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
          FROM documents WHERE trim(text) <> '')
    """,
)
def q_array_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Array algebra on tokenized docs (distinct/intersect/filter) — outputs
    SIZES only: element order of array_distinct/intersect differs between
    engines, cardinalities don't."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    stop = F.array(*[F.lit(w) for w in ("the", "a", "and", "of", "to")])
    return d.select(
        "doc_id",
        F.size(F.array_distinct(ws)).cast("long").alias("n_distinct"),
        F.size(F.array_intersect(F.array_distinct(ws), stop)).cast("long")
        .alias("n_stop"),
        F.size(F.filter(ws, lambda w: F.length(w) >= 6)).cast("long")
        .alias("n_long"),
    )
