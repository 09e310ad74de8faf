"""Text-analysis operators for a training-data pipeline (task brief §extras).

Language ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex classes), and rolling 4-gram document
fingerprinting — all pure relational Spark (JVM-side, codegen-friendly; no
Python UDFs), each with a value-identical DuckDB oracle.

Scale notes: every query is a narrow projection + one bounded groupBy; the
fingerprint query's explode fan-out is ~n_words per doc and re-groups on
doc_id (the natural partition key of the corpus), so at 100 TB these run as
single-shuffle map-heavy jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import T, query


def _occ(padded: Column, pat: str) -> Column:
    """Occurrence count of literal ``pat`` (left-to-right, non-overlapping) —
    replace-based so it stays inside whole-stage codegen."""
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit(""))))
        / len(pat)
    ).cast("long")


def _occ_sql(padded: str, pat: str) -> str:
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{pat}', '')))"
        f" / {len(pat)} AS BIGINT)"
    )


_STOPWORDS = {
    "en": [" the ", " a ", " and "],
    "de": [" der ", " die ", " und "],
    "es": [" el ", " la ", " los "],
    "fr": [" le ", " la ", " les "],
}


def _pad_sql() -> str:
    return "' ' || regexp_replace(trim(text), '\\s+', ' ', 'g') || ' '"


def _score_sql(lang: str) -> str:
    return " + ".join(_occ_sql("pad", w) for w in _STOPWORDS[lang])


@query(
    "q_lang_id",
    f"""
    SELECT doc_id, s_en, s_de, s_es, s_fr,
           CASE WHEN s_en = m THEN 'en' WHEN s_de = m THEN 'de'
                WHEN s_es = m THEN 'es' ELSE 'fr' END AS pred_lang
    FROM (
      SELECT doc_id, s_en, s_de, s_es, s_fr,
             greatest(s_en, s_de, s_es, s_fr) AS m
      FROM (
        SELECT doc_id,
               {_score_sql('en')} AS s_en,
               {_score_sql('de')} AS s_de,
               {_score_sql('es')} AS s_es,
               {_score_sql('fr')} AS s_fr
        FROM (SELECT doc_id, {_pad_sql()} AS pad FROM documents
              WHERE trim(text) <> '')))
    """,
)
def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-hit language ID: per-language hit counts, argmax with a fixed
    tie-break order (en>de>es>fr) so the prediction is deterministic."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    pad = F.concat(
        F.lit(" "), F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), F.lit(" ")
    )
    d = d.select("doc_id", pad.alias("pad"))
    for lang, words in _STOPWORDS.items():
        score = None
        for w in words:
            c = _occ(F.col("pad"), w)
            score = c if score is None else score + c
        d = d.withColumn(f"s_{lang}", score.cast("long"))
    m = F.greatest("s_en", "s_de", "s_es", "s_fr")
    pred = (
        F.when(F.col("s_en") == m, "en")
        .when(F.col("s_de") == m, "de")
        .when(F.col("s_es") == m, "es")
        .otherwise("fr")
    )
    return d.select("doc_id", "s_en", "s_de", "s_es", "s_fr", pred.alias("pred_lang"))


@query(
    "q_quality",
    f"""
    SELECT doc_id, n_tokens, stop_hits,
           CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
           n_punct,
           CASE WHEN n_tokens BETWEEN 20 AND 2000
                     AND CAST(stop_hits AS DOUBLE) / n_tokens < 0.4
                     AND n_punct * 10 < n_tokens
                THEN 'ok' ELSE 'low' END AS quality
    FROM (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             {_occ_sql('pad', ' the ')} + {_occ_sql('pad', ' a ')}
               + {_occ_sql('pad', ' and ')} AS stop_hits,
             CAST(length(lower(text))
                  - length(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'))
                  AS BIGINT) AS n_punct
      FROM (SELECT doc_id, text, {_pad_sql()} AS pad FROM documents
            WHERE trim(text) <> ''))
    """,
)
def q_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Document quality score: token count bounds, stopword ratio, punctuation
    density — the length/punct/stopword heuristics of a pretraining filter.
    stop_ratio is a per-row double (identical IEEE division both engines)."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    pad = F.concat(
        F.lit(" "), F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), F.lit(" ")
    )
    lower = F.lower(F.col("text"))
    d = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        (_occ(pad, " the ") + _occ(pad, " a ") + _occ(pad, " and ")).alias("stop_hits"),
        (
            F.length(lower)
            - F.length(F.regexp_replace(lower, r"[^a-z0-9\s]", ""))
        ).cast("long").alias("n_punct"),
    )
    ratio = F.col("stop_hits").cast("double") / F.col("n_tokens")
    quality = F.when(
        F.col("n_tokens").between(20, 2000)
        & (ratio < 0.4)
        & (F.col("n_punct") * 10 < F.col("n_tokens")),
        "ok",
    ).otherwise("low")
    return d.select(
        "doc_id", "n_tokens", "stop_hits", ratio.alias("stop_ratio"),
        "n_punct", quality.alias("quality"),
    )


@query(
    "q_token_count",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text),
                    '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpeish,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
             AS n_ws
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex class
    split (letters / digits / single punctuation) — the pretokenizer shape of
    byte-pair encoders."""
    d = T(spark, sf, "documents")
    trimmed = F.trim(F.col("text"))
    return d.select(
        "doc_id",
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"))
        .cast("long")
        .alias("n_bpeish"),
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("long")
        .alias("n_ws"),
    )


@query(
    "q_fingerprint",
    """
    SELECT doc_id, min(g) AS fingerprint, CAST(count(*) AS BIGINT) AS n_grams
    FROM (
      SELECT doc_id,
             md5(w || ' ' || w1 || ' ' || w2 || ' ' || w3) AS g
      FROM (
        SELECT doc_id, w,
               lead(w, 1) OVER win AS w1,
               lead(w, 2) OVER win AS w2,
               lead(w, 3) OVER win AS w3
        FROM (
          SELECT doc_id, u.w AS w, u.i AS i
          FROM (SELECT doc_id,
                       unnest(list_transform(
                         regexp_split_to_array(trim(text), '\\s+'),
                         (w, i) -> struct_pack(w := w, i := i))) AS u
                FROM documents WHERE trim(text) <> ''))
        WINDOW win AS (PARTITION BY doc_id ORDER BY i))
      WHERE w3 IS NOT NULL)
    GROUP BY doc_id
    """,
)
def q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling 4-gram fingerprint (winnowing-style min-hash of word 4-grams):
    explode words with positions, window-lead to build grams, min(md5) per
    doc.  The window partitions on doc_id — corpus-partition-aligned, so the
    only shuffle is the doc_id hash partitioning it shares with every other
    per-doc stage."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    words = d.select(
        "doc_id", F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("i", "w")
    )
    win = Window.partitionBy("doc_id").orderBy("i")
    grams = words.select(
        "doc_id", "w",
        F.lead("w", 1).over(win).alias("w1"),
        F.lead("w", 2).over(win).alias("w2"),
        F.lead("w", 3).over(win).alias("w3"),
    ).filter(F.col("w3").isNotNull())
    g = F.md5(
        F.concat_ws(" ", "w", "w1", "w2", "w3").cast("binary")
    )
    return grams.select("doc_id", g.alias("g")).groupBy("doc_id").agg(
        F.min("g").alias("fingerprint"),
        F.count(F.lit(1)).alias("n_grams"),
    )
