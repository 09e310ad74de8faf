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

from .registry import T, fan_out, query


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
    """Rolling 4-gram fingerprint (winnowing-style min-hash of word 4-grams)
    — ARRAY-NATIVE (round 2): grams are built per row by a ``transform``
    over the words array and reduced with ``array_min``.  ZERO shuffles —
    the round-1 posexplode + window-lead + groupBy formulation shuffled the
    exploded words twice; this is a pure projection, the plan you want when
    the corpus is 100 TB.  The oracle (unchanged) still states the
    window-lead formulation — same values, different physics."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    d = d.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 4)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("ws")) - 3),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.element_at(F.col("ws"), i),
                F.element_at(F.col("ws"), i + 1),
                F.element_at(F.col("ws"), i + 2),
                F.element_at(F.col("ws"), i + 3),
            ).cast("binary")
        ),
    )
    # materialize the gram array once (a repeated `grams` expression would
    # recompute every md5 twice — no CSE across projection outputs)
    return d.select("doc_id", grams.alias("gs")).select(
        "doc_id",
        F.array_min(F.col("gs")).alias("fingerprint"),
        F.size(F.col("gs")).cast("long").alias("n_grams"),
    )


_QUERY_TERMS = ("data", "spark", "table")


@query(
    "q_bm25",
    f"""
    WITH words AS (
      SELECT doc_id, u.w AS w
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     regexp_split_to_array(trim(text), '\\s+'),
                     (w, i) -> struct_pack(w := w, i := i))) AS u
            FROM documents WHERE trim(text) <> '')),
    tf AS (
      SELECT doc_id, w, count(*) AS tf FROM words
      WHERE w IN ('data', 'spark', 'table') GROUP BY doc_id, w),
    df AS (
      SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w),
    n AS (SELECT count(*) AS n_docs FROM documents WHERE trim(text) <> '')
    SELECT tf.doc_id,
           round(sum(tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df)), 6) AS score,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM tf JOIN df ON tf.w = df.w CROSS JOIN n
    GROUP BY tf.doc_id
    """,
)
def q_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """Term-weighted retrieval scoring (tf x rational idf — the BM25 shape
    with a log-free idf so both engines compute bit-exact weights; only the
    per-doc sum needs round()).

    ARRAY-NATIVE (round 2): per-term tf is a per-row ``size(filter(words))``
    — no words explode, no per-(doc,term) shuffle.  The corpus stats
    (n_docs + per-term df) collapse to ONE single-row aggregate that
    broadcast-cross-joins back; the round-1 plan exploded every word and
    shuffled twice before this join."""
    d = fan_out(
        T(spark, sf, "documents").filter(F.trim(F.col("text")) != ""), "doc_id"
    )
    ws = F.split(F.trim(F.col("text")), r"\s+")

    def _tf(term: str):
        # one-arg lambda only: a second (defaulted) parameter would receive
        # the element index from pyspark's filter, not the default
        return F.size(F.filter(ws, lambda w: w == F.lit(term)))

    tfs = d.select(
        "doc_id",
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(_QUERY_TERMS)],
    )
    stats = tfs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_QUERY_TERMS))
        ],
    )
    any_hit = None
    score = None
    n_terms = None
    for i in range(len(_QUERY_TERMS)):
        hit = F.col(f"tf_{i}") > 0
        term_s = F.when(
            hit, F.col(f"tf_{i}") * (F.col("n_docs") / F.col(f"df_{i}"))
        ).otherwise(F.lit(0.0))
        any_hit = hit if any_hit is None else (any_hit | hit)
        score = term_s if score is None else score + term_s
        n_terms = hit.cast("long") if n_terms is None else n_terms + hit.cast("long")
    return (
        tfs.crossJoin(F.broadcast(stats))
        .filter(any_hit)
        .select(
            "doc_id",
            F.round(score, 6).alias("score"),
            n_terms.alias("n_terms"),
        )
    )


@query(
    "q_gopher_quality",
    """
    SELECT doc_id, n_words,
           CAST(n_alpha_chars AS DOUBLE) / n_words AS mean_word_len,
           CAST(n_alpha_words AS DOUBLE) / n_words AS alpha_word_frac,
           CAST(n_hash AS BIGINT) AS n_hash,
           CAST(n_sents - n_distinct_sents AS BIGINT) AS n_dup_sents,
           CASE WHEN n_words BETWEEN 15 AND 5000
                     AND CAST(n_alpha_chars AS DOUBLE) / n_words BETWEEN 2 AND 12
                     AND CAST(n_alpha_words AS DOUBLE) / n_words >= 0.7
                     AND n_hash * 10 < n_words
                     AND (n_sents - n_distinct_sents) * 2 < n_sents + 1
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_words,
             length(regexp_replace(text, '\\s+', '', 'g')) AS n_alpha_chars,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             w -> regexp_matches(w, '[A-Za-z]')))
               AS n_alpha_words,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             len(regexp_split_to_array(trim(text), '\\. '))
               AS n_sents,
             len(list_distinct(regexp_split_to_array(trim(text), '\\. ')))
               AS n_distinct_sents
      FROM documents WHERE trim(text) <> '')
    """,
)
def q_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style pretraining quality rules (Rae et al. 2021 §A1.1.2,
    public paper): word-count bounds, mean word length 2-12, >=70% of words
    containing an alphabetic char, symbol(#)-to-word ratio, and a
    duplicate-sentence repetition bound — all per-row array/scalar
    expressions, zero shuffles.  Ratios are per-row integer divisions:
    bit-identical across engines."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    sents = F.split(F.trim(F.col("text")), r"\. ")
    d = d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.length(F.regexp_replace(F.col("text"), r"\s+", "")).alias("n_alpha_chars"),
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).alias("n_alpha_words"),
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
        ).alias("n_hash"),
        F.size(sents).alias("n_sents"),
        F.size(F.array_distinct(sents)).alias("n_distinct_sents"),
    )
    mean_wl = F.col("n_alpha_chars").cast("double") / F.col("n_words")
    alpha_frac = F.col("n_alpha_words").cast("double") / F.col("n_words")
    n_dup = F.col("n_sents") - F.col("n_distinct_sents")
    verdict = F.when(
        F.col("n_words").between(15, 5000)
        & mean_wl.between(2, 12)
        & (alpha_frac >= 0.7)
        & (F.col("n_hash") * 10 < F.col("n_words"))
        & (n_dup * 2 < F.col("n_sents") + 1),
        "keep",
    ).otherwise("drop")
    return d.select(
        "doc_id", "n_words",
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        F.col("n_hash").cast("long").alias("n_hash"),
        n_dup.cast("long").alias("n_dup_sents"),
        verdict.alias("verdict"),
    )


@query(
    "q_url_dedup",
    """
    WITH raw AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END)
             || (CASE WHEN doc_id % 3 = 0 THEN 'Site' ELSE 'site' END)
             || CAST((doc_id // 2) % 5 AS VARCHAR) || '.org'
             || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
             || '/path/' || CAST(doc_id // 2 AS VARCHAR)
             || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
             || (CASE WHEN doc_id % 3 = 1
                      THEN '#frag' || CAST(doc_id AS VARCHAR) ELSE '' END)
               AS url
      FROM documents),
    norm AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://'
             || regexp_replace(
                  lower(regexp_extract(url, '^[A-Za-z]+://([^/#]+)', 1)),
                  ':443$', '')
             || regexp_replace(
                  regexp_extract(url, '^[A-Za-z]+://[^/#]+([^#]*)', 1),
                  '/$', '')
               AS url_norm
      FROM raw)
    SELECT url_norm, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keeper
    FROM norm GROUP BY url_norm
    """,
)
def q_url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """URL canonicalization + dedup — the crawl-frontier primitive: lowercase
    scheme/host, strip the fragment, the :443 default port, and the trailing
    slash, then keep one doc per canonical url (min doc_id).  The synthetic
    raw urls vary case/port/slash/fragment per doc_id so each normalization
    rule is load-bearing; consecutive doc pairs collide by construction."""
    d = T(spark, sf, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://")).otherwise("HTTPS://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("Site")).otherwise("site"),
        ((F.col("doc_id") / 2).cast("long") % 5).cast("string"),
        F.lit(".org"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(":443")).otherwise(""),
        F.lit("/path/"),
        (F.col("doc_id") / 2).cast("long").cast("string"),
        F.when(F.col("doc_id") % 2 == 1, F.lit("/")).otherwise(""),
        F.when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("#frag"), F.col("doc_id").cast("string")),
        ).otherwise(""),
    )
    raw = d.select("doc_id", url.alias("url"))
    norm = F.concat(
        F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1)),
        F.lit("://"),
        F.regexp_replace(
            F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/#]+)", 1)),
            r":443$", "",
        ),
        F.regexp_replace(
            F.regexp_extract("url", r"^[A-Za-z]+://[^/#]+([^#]*)", 1),
            r"/$", "",
        ),
    )
    return (
        raw.select("doc_id", norm.alias("url_norm"))
        .groupBy("url_norm")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper"),
        )
    )


@query(
    "q_percentiles",
    """
    SELECT lang,
           round(quantile_cont(n_chars, 0.5), 4) AS p50,
           round(quantile_cont(n_chars, 0.9), 4) AS p90
    FROM documents GROUP BY lang
    """,
)
def q_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per language (corpus length profile).
    Spark `percentile` and DuckDB `quantile_cont` share the linear-
    interpolation definition; round(4) absorbs interpolation ulp."""
    return T(spark, sf, "documents").groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90"),
    )


@query(
    "q_histogram",
    """
    SELECT CAST(n_chars // 50 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram of document lengths (50-char buckets)."""
    return T(spark, sf, "documents").groupBy(
        F.floor(F.col("n_chars") / 50).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@query(
    "q_sessionize",
    """
    SELECT user_id, CAST(max(session_id) + 1 AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL THEN 0
                    WHEN date_diff('microsecond',
                                   lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id),
                                   ts) > 1800000000 THEN 1
                    ELSE 0 END AS is_new
        FROM events))
    GROUP BY user_id
    """,
)
def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative-sum of
    session boundaries — the batch formulation of the stateful streaming
    operator (streaming/stateful.py).  All logic is integer microsecond
    arithmetic: engine-exact."""
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
    )
    marked = e.select(
        "user_id", "ts", "event_id",
        F.when(gap_us.isNull(), 0).when(gap_us > 1_800_000_000, 1)
        .otherwise(0).alias("is_new"),
    )
    sessioned = marked.select(
        "user_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return sessioned.groupBy("user_id").agg(
        (F.max("session_id") + 1).cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q_sample_hash",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY lang
    """,
)
def q_sample_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ~12.5% corpus sample by content-free hash bucket
    (md5 first nibble) — reproducible sampling for eval splits; unlike
    rand()-based sampling it is stable across engines, runs, and retries."""
    d = T(spark, sf, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    return d.filter(nib.isin("0", "1")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )


@query(
    "q_bigram_fluency",
    """
    WITH grams AS (
      SELECT doc_id, g
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, length(text)),
                                         i -> substr(text, CAST(i AS INT), 2)))
                     AS g
            FROM documents WHERE length(text) >= 2)),
    counts AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
    scored AS (
      SELECT gr.doc_id, sum(ct.c) AS fl, count(*) AS n
      FROM grams gr JOIN counts ct ON gr.g = ct.g
      GROUP BY gr.doc_id)
    SELECT doc_id, CAST(fl AS BIGINT) AS fluency_sum,
           CAST(n AS BIGINT) AS n_bigrams,
           CAST(fl // n AS BIGINT) AS mean_freq
    FROM scored
    """,
)
def q_bigram_fluency(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical-fluency scoring — the integer-exact stand-in for a
    char-LM perplexity filter (the CCNet/Gopher 'remove gibberish' signal):
    build the corpus-wide character-bigram frequency table in one pass,
    then score every document by the sum/mean frequency of its bigrams.
    Gibberish (rare bigrams) scores low, fluent text high; all arithmetic
    is integer, so Spark and the oracle agree bit-for-bit.

    Plan shape (100 TB): bigram explode -> one groupBy(gram) builds the
    model; the model is vocabulary-bounded (charset² rows — ~10k for web
    text after normalization), so scoring BROADCASTS it to a map-side join
    against the exploded grams and one groupBy(doc) folds the score.  No
    driver collect; the model table is itself a DataFrame."""
    d = fan_out(
        T(spark, sf, "documents").filter(F.length("text") >= 2), "doc_id"
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1),"
                   " i -> substring(text, i, 2))")
        ).alias("g"),
    )
    counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    return (
        grams.join(F.broadcast(counts), "g")
        .groupBy("doc_id")
        .agg(F.sum("c").alias("fl"), F.count(F.lit(1)).alias("n"))
        .select(
            "doc_id",
            F.col("fl").cast("long").alias("fluency_sum"),
            F.col("n").cast("long").alias("n_bigrams"),
            F.floor(F.col("fl") / F.col("n")).cast("long").alias("mean_freq"),
        )
    )


@query(
    "q_paragraph_dedup",
    # CCNet-style paragraph-level exact dedup: explode documents into
    # paragraphs (sentence-ish units here: split on '. '), canonicalize,
    # hash, keep the first (doc_id, position) occurrence corpus-wide.
    """
    WITH paras AS (
      SELECT doc_id, u.p AS para, u.i - 1 AS pos
      FROM (SELECT doc_id,
                   unnest(list_transform(string_split(text, '. '),
                                         (p, i) -> struct_pack(p := p, i := i)))
                     AS u
            FROM documents)
      WHERE trim(u.p) <> ''),
    hashed AS (
      SELECT doc_id, pos,
             md5(lower(regexp_replace(trim(para), '\\s+', ' ', 'g'))) AS h
      FROM paras),
    keep AS (
      SELECT h, min(doc_id * 4294967296 + pos) AS first_key,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM hashed GROUP BY h)
    SELECT CAST(k.first_key // 4294967296 AS BIGINT) AS doc_id,
           CAST(k.first_key % 4294967296 AS BIGINT) AS pos,
           k.h, k.n_copies
    FROM keep k
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """PARAGRAPH-level exact dedup (the CCNet discipline: boilerplate
    sentences repeat across pages even when documents differ): explode to
    paragraph units, canonicalize (lower + whitespace collapse), md5, and
    keep one canonical (doc, position) survivor per hash corpus-wide.

    Plan shape (100 TB): posexplode is a map; the single shuffle is the
    hash groupBy — the same one-shuffle profile as doc-level q_dedup_exact,
    with the composite (doc_id, pos) survivor encoded into one min() so no
    window function or second shuffle is needed.  The encoding is
    doc_id * 2^32 + pos, exact in int64 while doc_id < 2^31 and
    pos < 2^32 — posexplode positions are 32-bit ints by construction, and
    a corpus with >= 2^31 documents would shard on a doc_id prefix long
    before this query sees it (bounds documented, not merely assumed)."""
    d = fan_out(T(spark, sf, "documents"), "doc_id")
    paras = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\. ")).alias("pos", "para"),
    ).filter(F.trim(F.col("para")) != "")
    h = F.md5(
        F.lower(
            F.regexp_replace(F.trim(F.col("para")), r"\s+", " ")
        ).cast("binary")
    )
    return (
        paras.select("doc_id", "pos", h.alias("h"))
        .groupBy("h")
        .agg(
            F.min(
                F.col("doc_id") * F.lit(4294967296) + F.col("pos")
            ).alias("first_key"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
        .select(
            # decode via shifts, not double division (exact beyond 2^53)
            F.shiftright(F.col("first_key"), 32).cast("long").alias("doc_id"),
            (F.col("first_key") % 4294967296).cast("long").alias("pos"),
            "h",
            "n_copies",
        )
    )


@query(
    "q_repetition",
    # Gopher/MassiveText repetition filters the r2 quality gate lacks:
    # duplicate-LINE fraction (share of sentence units that repeat within
    # the doc) and top-bigram fraction (share of word-bigram occurrences
    # taken by the single most common bigram).  All integer ratios.
    """
    WITH units AS (
      SELECT doc_id, trim(u) AS u
      FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS u
            FROM documents)
      WHERE trim(u) <> ''),
    line_stats AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(count(*) - count(DISTINCT u) AS BIGINT) AS n_dup_lines
      FROM units GROUP BY doc_id),
    words AS (
      SELECT doc_id, w, CAST(i AS BIGINT) AS i
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     regexp_split_to_array(trim(text), '\\s+'),
                     (w, i) -> struct_pack(w := w, i := i))) AS s
            FROM documents WHERE trim(text) <> '') t(doc_id, s),
           LATERAL (SELECT s.w AS w, s.i AS i)
      ),
    bigrams AS (
      SELECT a.doc_id, a.w || ' ' || b.w AS bg
      FROM words a JOIN words b
        ON a.doc_id = b.doc_id AND b.i = a.i + 1),
    bg_stats AS (
      SELECT doc_id,
             CAST(sum(cnt) AS BIGINT) AS n_bigrams,
             CAST(max(cnt) AS BIGINT) AS top_bigram_n
      FROM (SELECT doc_id, bg, count(*) AS cnt
            FROM bigrams GROUP BY doc_id, bg)
      GROUP BY doc_id)
    SELECT l.doc_id, l.n_lines, l.n_dup_lines,
           coalesce(g.n_bigrams, 0) AS n_bigrams,
           coalesce(g.top_bigram_n, 0) AS top_bigram_n,
           CASE WHEN l.n_dup_lines * 2 > l.n_lines
                  OR coalesce(g.top_bigram_n, 0) * 5 > coalesce(g.n_bigrams, 1)
                THEN 'repetitive' ELSE 'ok' END AS verdict
    FROM line_stats l LEFT JOIN bg_stats g ON l.doc_id = g.doc_id
    """,
)
def q_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition filters (Gopher §A1.3: duplicate-line fraction, top
    n-gram fraction) — the quality rules that catch templated/spun pages
    which length/stopword stats miss.  Flags a doc when >50% of its
    sentence units repeat or one word-bigram takes >20% of all bigram
    slots.  All per-doc integer arithmetic: ZERO cross-doc state, so at
    100 TB this is a pure map after the per-doc aggregations, and the only
    shuffles are the per-doc groupBys on the corpus partition key.

    ARRAY-NATIVE: sentence units and bigram counts are per-row higher-order
    folds — no explode of the token stream ships through a shuffle."""
    d = fan_out(
        T(spark, sf, "documents"), "doc_id"
    )
    units = F.filter(
        F.transform(F.split(F.col("text"), r"\. "), lambda u: F.trim(u)),
        lambda u: u != "",
    )
    words = F.split(F.trim(F.col("text")), r"\s+")
    bigrams = F.when(
        F.trim(F.col("text")) == "", F.array().cast("array<string>")
    ).otherwise(
        F.zip_with(
            F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
            F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )
    with_cols = d.select(
        "doc_id", units.alias("units"), bigrams.alias("bgs")
    )
    # per-row distinct/count folds (aggregate over the arrays);
    # top-bigram via a groupBy inside the doc would shuffle — instead sort
    # the bigram array and fold the longest equal run (same value, pure JVM)
    sorted_bgs = F.array_sort(F.col("bgs"))
    run_fold = F.aggregate(
        sorted_bgs,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
    )["best"]
    n_lines = F.size("units").cast("long")
    n_dup = (F.size("units") - F.size(F.array_distinct("units"))).cast("long")
    n_bg = F.size("bgs").cast("long")
    top_bg = F.coalesce(run_fold, F.lit(0)).cast("long")
    return with_cols.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_dup.alias("n_dup_lines"),
        n_bg.alias("n_bigrams"),
        top_bg.alias("top_bigram_n"),
        F.when(
            (n_dup * 2 > n_lines)
            | (top_bg * 5 > F.greatest(n_bg, F.lit(1).cast("long"))),
            "repetitive",
        ).otherwise("ok").alias("verdict"),
    )


# --- q_kmv_distinct ---------------------------------------------------------
_KMV_K = 256  # sketch size; estimate std-error ~ 1/sqrt(K-2) ~ 6%

# Fraction of the hash space below a fixed-length hex hash: the first 12 hex
# digits as an exact 48-bit integer over 16^12.  Every intermediate is an
# exact power-of-two-scaled integer < 2^48, so BOTH parses (Spark's conv()
# vs DuckDB's digit-sum) land on the SAME double bit pattern — the estimate
# division is then a single identical IEEE op in each engine.
_KMV_FRAC_SPARK = (
    "cast(conv(substring(kth, 1, 12), 16, 10) as double)"
    " / cast(pow(16, 12) as double)"
)
_KMV_FRAC_DUCK = (
    "list_sum(list_transform(range(12), i -> "
    "(strpos('0123456789abcdef', substring(kth, i + 1, 1)) - 1)"
    " * 16.0 ** (11 - i))) / 16.0 ** 12"
)


@query(
    "q_kmv_distinct",
    f"""
    WITH t AS (
      SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE trim(text) <> ''),
    h AS (
      SELECT DISTINCT md5(g) AS h
      FROM (SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 2)),
                          i -> array_to_string(list_slice(t, i, i + 2), ' ')))
                     AS g
            FROM t WHERE len(t) >= 3)),
    sk AS (SELECT max(h) AS kth, count(*) AS k_used
           FROM (SELECT h FROM h ORDER BY h LIMIT {_KMV_K})),
    ex AS (SELECT count(*) AS exact_distinct FROM h)
    SELECT CAST(k_used AS BIGINT) AS k_used, kth,
           ({_KMV_FRAC_DUCK.replace('kth', 'sk.kth')}) AS kth_frac,
           CASE WHEN k_used < {_KMV_K} THEN CAST(k_used AS DOUBLE)
                ELSE ({_KMV_K} - 1)
                     / ({_KMV_FRAC_DUCK.replace('kth', 'sk.kth')}) END
             AS est_distinct,
           CAST(exact_distinct AS BIGINT) AS exact_distinct
    FROM sk, ex
    """,
)
def q_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """KMV (k-minimum-values) cardinality sketch (Bar-Yossef et al. 2002)
    over distinct 3-token shingles — the "how much unique text is there"
    estimator that sizes dedup work without a full distinct count.
    Estimate = (K-1) / frac(kth smallest hash), with the standard exact
    fallback when fewer than K distinct values exist; fixed-length hex md5
    makes LEXICOGRAPHIC order numeric order, so the whole sketch is order
    statistics over strings both engines compute identically —
    bit-identical doubles, unlike HLL whose register layouts differ per
    implementation (Spark's approx_count_distinct can never oracle-match
    DuckDB's).

    Scale shape: shingling is a per-row transform (same gram machinery as
    q_substring_dedup); Catalyst runs the distinct as partial map-side
    dedup, and the k-min as TakeOrdered — the driver merges only K rows
    per partition.  A production variant pre-filters h < c*K/n_expected
    map-side so almost nothing shuffles at all.  exact_distinct is the
    gate's ground-truth column, not part of the sketch."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    t = d.select(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    ).filter(F.size("t") >= 3)
    # greatest(..., 1) keeps sequence() total for short rows (see
    # dedup._winnow_fp_rows — same latent-descending-sequence class)
    shingles = F.expr(
        "transform(sequence(1, greatest(size(t) - 2, 1)), "
        "i -> concat_ws(' ', slice(t, i, 3)))"
    )
    h = (
        t.select(F.explode(shingles).alias("g"))
        .select(F.md5(F.col("g").cast("binary")).alias("h"))
        .distinct()
    )
    sk = (
        h.orderBy("h").limit(_KMV_K)
        .agg(F.max("h").alias("kth"),
             F.count(F.lit(1)).cast("long").alias("k_used"))
    )
    ex = h.agg(F.count(F.lit(1)).cast("long").alias("exact_distinct"))
    frac = F.expr(_KMV_FRAC_SPARK)
    return (
        sk.crossJoin(ex)  # 1 row x 1 row
        .select(
            "k_used", "kth",
            frac.alias("kth_frac"),
            F.when(F.col("k_used") < _KMV_K,
                   F.col("k_used").cast("double"))
            .otherwise(F.lit(float(_KMV_K - 1)) / frac)
            .alias("est_distinct"),
            "exact_distinct",
        )
    )


# --- q_char_entropy ---------------------------------------------------------
@query(
    "q_char_entropy",
    """
    WITH c AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch
      FROM documents WHERE trim(text) <> ''),
    k AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt
          FROM c GROUP BY doc_id, ch)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_chars,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(log2(CAST(sum(cnt) AS DOUBLE))
                 - sum(cnt * log2(CAST(cnt AS DOUBLE)))
                   / CAST(sum(cnt) AS DOUBLE), 6) AS entropy
    FROM k GROUP BY doc_id
    """,
)
def q_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic cheap
    quality signal (low entropy flags repetitive boilerplate / padding /
    encoding garbage; high flags binary-ish noise).  Computed via the
    algebraic identity H = log2(n) - (sum c*log2 c)/n so the only float
    inputs are INTEGER counts; the cross-group sum is order-sensitive in
    the last ulp, so the result is rounded to 6 dp on both engines
    (registry portability rule for aggregated doubles).

    Scale shape (the q_hash_embed lesson applied): the char explode never
    reaches the shuffle — map-side partial aggregation collapses
    (doc_id, ch) to at most |alphabet| rows per doc per partition, so the
    shuffle is bounded by docs x alphabet, not by corpus characters.

    Codepoint semantics (round-4 ADVICE, low): ``split(text, '')`` runs on
    the JVM's UTF-16 string, so a non-BMP character (emoji, astral CJK)
    splits into TWO surrogate halves while DuckDB's string_split yields
    whole codepoints.  Decompose with substring over sequence(1, length)
    instead — Spark's length/substring count UTF-8 codepoints, matching
    DuckDB — so both engines see identical characters on any input
    (tests/test_entropy.py pins an astral-plane corpus)."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    k = (
        d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
            "text",
        )
        .select("doc_id", F.expr("substring(text, i, 1)").alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    n = F.sum("cnt").cast("double")
    return k.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.round(
            F.log2(n) - F.sum(F.col("cnt") * F.log2(F.col("cnt"))) / n, 6
        ).alias("entropy"),
    )
