"""Pre-training corpus-preparation operators (task brief §extras).

The four passes every large-scale LLM data pipeline runs between "extracted
text" and "training batches", each pure relational Spark (JVM-side, no
Python UDFs) with a value-identical DuckDB oracle:

* **PII redaction** (``q_pii_scrub``) — emails / phone numbers / IPv4
  addresses replaced with typed placeholders, with per-doc removal counts
  (the C4 / Dolma-style scrub pass).
* **Context-window chunking** (``q_chunk_tokens``) — overlapping
  fixed-token windows per document (stride < window), the shape fed to a
  tokenizer for long-document training or embedding indexing.
* **Stratified domain mixing** (``q_domain_mix``) — deterministic
  hash-based sampling at a per-source rate (the "data mixture" knob of
  GPT-3/PaLM-style recipes); the sample is a pure row predicate, so the
  SAME rows are kept on any cluster size or partitioning.
* **Sequence packing** (``q_pack_sequences``) — greedy contiguous packing
  of documents into fixed-token bins, parallel per hash bucket.

Scale notes (the 100 TB shapes):

* ``q_pii_scrub`` is a zero-shuffle projection — three ``regexp_replace``
  passes inside whole-stage codegen.
* ``q_chunk_tokens`` explodes only by ``ceil(n_tok / stride)`` per doc —
  output-proportional fan-out, no shuffle before it (the chunk stream is
  written straight out or re-grouped on doc_id, the scan's natural key).
* ``q_domain_mix`` decides membership per row from ``md5(doc_id)`` — no
  sort, no sampleBy state, ONE groupBy for the audit counts; at 100 TB the
  filter runs map-side and the audit agg ships 20 rows per task.
* ``q_pack_sequences`` packs per ``doc_id % N_BUCKETS`` partition with a
  bounded running-sum window — buckets are independent, so parallelism is
  the bucket count (here 32 for a 60k-row test table; a real run sizes
  buckets so each holds a few GB).  The only shuffle is the bucket
  repartition the window itself requires.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import T, query

# --- q_pii_scrub ----------------------------------------------------------
# Single-source pattern constants: the Spark query and the DuckDB oracle
# interpolate the SAME strings (RE2/Java-regex common subset: no lookaround,
# no backrefs; \b and ASCII \d behave identically in both engines).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+\d{1,3}-\d{3}-\d{4}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Deterministic PII injection (the corpus itself is synthetic prose with no
# PII, so the gate plants one of each shape per doc — stated identically in
# both engines; counts then prove the patterns actually fired).
_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS STRING)"
    " || '@mail.example.org or +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
    " || ' from 10.' || CAST(doc_id % 256 AS STRING)"
    " || '.0.' || CAST(doc_id % 100 AS STRING)"
)


@query(
    "q_pii_scrub",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(aug, '{_PII_EMAIL}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(aug, '{_PII_PHONE}')) AS BIGINT)
             AS n_phone,
           CAST(len(regexp_extract_all(aug, '{_PII_IP}')) AS BIGINT)
             AS n_ip,
           md5(regexp_replace(regexp_replace(regexp_replace(aug,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g')) AS redacted_md5
    FROM (SELECT doc_id, {_PII_AUG_SQL} AS aug
          FROM documents WHERE text IS NOT NULL)
    """,
)
def q_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction: count and replace emails, phone numbers, and IPv4
    addresses with typed placeholders.  Zero shuffles — three codegen'd
    regexp passes per row; at 100 TB this is scan-bound.  The gate injects
    one synthetic PII item of each class per doc (same expression in both
    engines) so every pattern is exercised on every row."""
    d = T(spark, sf, "documents").where(F.col("text").isNotNull())
    aug = F.expr(_PII_AUG_SQL)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>"),
            _PII_IP, "<IP>"),
        _PII_PHONE, "<PHONE>")
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count(aug, F.lit(_PII_PHONE)).cast("long").alias("n_phone"),
        F.regexp_count(aug, F.lit(_PII_IP)).cast("long").alias("n_ip"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


# --- q_chunk_tokens -------------------------------------------------------
_CHUNK = 16   # window size in whitespace tokens (config knob; small so the
_STRIDE = 12  # 60k-row test docs produce several overlapping chunks each)


@query(
    "q_chunk_tokens",
    f"""
    SELECT doc_id, chunk_id,
           CAST(len(list_slice(words, chunk_id * {_STRIDE} + 1,
                               chunk_id * {_STRIDE} + {_CHUNK})) AS BIGINT)
             AS n_chunk_tokens,
           md5(array_to_string(
                 list_slice(words, chunk_id * {_STRIDE} + 1,
                            chunk_id * {_STRIDE} + {_CHUNK}), ' '))
             AS chunk_md5
    FROM (
      SELECT doc_id, words,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM (
        SELECT doc_id, words,
               CASE WHEN len(words) <= {_CHUNK} THEN 1
                    ELSE 1 + (len(words) - {_CHUNK} + {_STRIDE} - 1)
                             // {_STRIDE}
               END AS n_chunks
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS words
              FROM documents WHERE trim(text) <> '')))
    """,
)
def q_chunk_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping context-window chunking: split each document into
    ``_CHUNK``-token windows advancing by ``_STRIDE`` tokens (overlap =
    window - stride, the standard long-document training / embedding-index
    shape).  The explode is output-proportional (one row per emitted chunk,
    ~n_tok/stride per doc) and happens map-side — no shuffle at all; chunk
    text is hashed so the driver compare stays value-exact."""
    d = T(spark, sf, "documents")
    trimmed = F.trim(F.col("text"))
    words = d.where(trimmed != "").select(
        "doc_id", F.split(trimmed, r"\s+").alias("words"))
    n = F.size("words")
    n_chunks = (
        F.when(n <= _CHUNK, F.lit(1))
        .otherwise(F.lit(1) + F.expr(
            f"(size(words) - {_CHUNK} + {_STRIDE} - 1) div {_STRIDE}"))
    ).cast("int")
    chunked = words.select(
        "doc_id", "words",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("words"),
        F.col("chunk_id") * _STRIDE + 1,
        _CHUNK,
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(piece, " ").cast("binary")).alias("chunk_md5"),
    )


# --- q_domain_mix ---------------------------------------------------------
# Per-source keep rate: source index mod 4 -> 20/40/60/80 % — encoded as an
# 8-hex-digit threshold over the first 32 bits of md5(doc_id).  Lexicographic
# compare of lowercase hex == numeric compare; md5 is identical in both
# engines, so the SAME rows are kept everywhere (cluster-size invariant).
_MIX_THRESH_SQL = (
    "CASE CAST(substr(source, 4) AS INTEGER) % 4"
    " WHEN 0 THEN '33333333' WHEN 1 THEN '66666666'"
    " WHEN 2 THEN '99999999' ELSE 'cccccccc' END"
)


@query(
    "q_domain_mix",
    f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(keep) AS BIGINT) AS n_kept,
           CAST(sum(keep * n_chars) AS BIGINT) AS n_kept_chars
    FROM (
      SELECT source, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       < {_MIX_THRESH_SQL}
                  THEN 1 ELSE 0 END AS keep
      FROM documents)
    GROUP BY source
    ORDER BY source
    """,
)
def q_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified domain-mixing sampler: keep each document with a
    per-source probability (20-80 % by source index) decided purely by
    ``md5(doc_id)`` against a hex threshold — no RNG state, no sampleBy, so
    membership is reproducible row-local work and the audit rollup is ONE
    groupBy over 20 strata.  The mixture-weights CASE is single-source
    (shared with the oracle SQL)."""
    d = T(spark, sf, "documents")
    keep = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")),
                    1, 8) < F.expr(_MIX_THRESH_SQL),
        F.lit(1)).otherwise(F.lit(0))
    return (
        d.select("source", "n_chars", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum("keep").cast("long").alias("n_kept"),
            F.sum(F.col("keep") * F.col("n_chars")).cast("long")
            .alias("n_kept_chars"),
        )
        .orderBy("source")
    )


# --- q_bpe_merge_step -----------------------------------------------------
_BPE_TOP = 10  # merges reported per step


@query(
    "q_bpe_merge_step",
    f"""
    WITH vocab AS (
      SELECT w, CAST(count(*) AS BIGINT) AS wc
      FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                     AS w
            FROM documents WHERE trim(text) <> '')
      GROUP BY w),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                                   i -> substring(w, i, 2))) AS pair,
             wc
      FROM vocab WHERE length(w) >= 2)
    SELECT pair, CAST(sum(wc) AS BIGINT) AS weight
    FROM pairs GROUP BY pair
    ORDER BY weight DESC, pair LIMIT {_BPE_TOP}
    """,
)
def q_bpe_merge_step(spark: SparkSession, sf: str) -> DataFrame:
    """One BPE-training merge step (Sennrich et al. 2016): the corpus-wide
    adjacent-symbol-pair counts whose argmax is the next merge, reported as
    the top-{_BPE_TOP} candidates (count desc, pair asc tie-break — fully
    deterministic).

    The classic BPE trick IS the scale story: pairs are counted over the
    DISTINCT-WORD vocabulary weighted by word frequency, never over corpus
    positions — after the first vocab groupBy every later stage is
    vocabulary-bounded (Heaps' law: sublinear in corpus size).  Top-K runs
    as TakeOrderedAndProject (per-partition heads, single tiny merge)."""
    d = T(spark, sf, "documents").where(F.trim(F.col("text")) != "")
    vocab = (
        d.select(F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    # greatest(..., 1) keeps the bound total (sequence descends below 1 —
    # same latent-crash class fixed in dedup._winnow_fp_rows); 1-char words
    # are filtered before the transform anyway
    pairs = vocab.where(F.length("w") >= 2).select(
        F.explode(F.expr(
            "transform(sequence(1, greatest(length(w) - 1, 1)),"
            " i -> substring(w, i, 2))")).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("pair"))
        .limit(_BPE_TOP)
    )


# --- q_quality_model ------------------------------------------------------
# Fixed linear model over the per-row features — a fastText-style quality
# classifier stand-in with public weights.  The combination is a SHARED
# expression string (identical operand order -> bit-identical doubles in
# both engines; the features themselves are exact integer divisions).
_QUALITY_Z_SQL = (
    "-3.0 + 0.35 * mean_word_len + 4.0 * alpha_word_frac"
    " + 0.002 * least(n_words, 1000)"
)


@query(
    "q_quality_model",
    f"""
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac,
           {_QUALITY_Z_SQL} AS z,
           CAST(CASE WHEN {_QUALITY_Z_SQL} > 0.5 THEN 1 ELSE 0 END AS BIGINT)
             AS keep
    FROM (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_words,
             CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\\s+'))
               AS mean_word_len,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                  w -> regexp_matches(w, '[A-Za-z]')))
                  AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\\s+'))
               AS alpha_word_frac
      FROM documents WHERE trim(text) <> '')
    """,
)
def q_quality_model(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based quality scoring: a fixed linear classifier (the shape of
    fastText / logreg quality filters in CCNet-style pipelines) over per-row
    features — mean word length, alphabetic-word fraction, clipped word
    count.  Inference is a zero-shuffle projection: at 100 TB a broadcast
    weight vector against per-row folds, here inlined as literals shared
    verbatim with the oracle (single source, bit-identical arithmetic)."""
    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    feats = d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        (F.length(F.regexp_replace(F.col("text"), r"\s+", "")).cast("double")
         / F.size(ws)).alias("mean_word_len"),
        (F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("double")
         / F.size(ws)).alias("alpha_word_frac"),
    )
    z = F.expr(_QUALITY_Z_SQL)
    return feats.select(
        "doc_id", "n_words", "mean_word_len", "alpha_word_frac",
        z.alias("z"),
        F.when(z > 0.5, F.lit(1)).otherwise(F.lit(0)).cast("long")
        .alias("keep"),
    )


# --- q_pack_sequences -----------------------------------------------------
_N_BUCKETS = 32   # packing parallelism (a real run sizes this so one bucket
_BIN_TOKENS = 256  # holds a few GB); bin capacity in tokens


@query(
    "q_pack_sequences",
    f"""
    SELECT bucket, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM (
      SELECT bucket, n_tok,
             (CAST(sum(n_tok) OVER win AS BIGINT) - n_tok) // {_BIN_TOKENS}
               AS bin_id
      FROM (
        SELECT doc_id, doc_id % {_N_BUCKETS} AS bucket,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
               END AS n_tok
        FROM documents WHERE text IS NOT NULL)
      WINDOW win AS (PARTITION BY bucket ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING))
    GROUP BY bucket, bin_id
    ORDER BY bucket, bin_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy contiguous sequence packing: within each of ``_N_BUCKETS``
    hash buckets, documents (in doc_id order) are laid end-to-end and a doc
    joins the bin where its first token lands (running-sum window //
    capacity).  Buckets are independent — the pack is embarrassingly
    parallel across them and the window never sees more than one bucket's
    rows; the ONLY shuffle is the bucket repartition the window requires."""
    d = T(spark, sf, "documents").where(F.col("text").isNotNull())
    trimmed = F.trim(F.col("text"))
    n_tok = (
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("long")
    )
    base = d.select(
        "doc_id",
        (F.col("doc_id") % _N_BUCKETS).alias("bucket"),
        n_tok.alias("n_tok"),
    )
    win = (
        Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = base.select(
        "bucket", "n_tok",
        F.sum("n_tok").over(win).cast("long").alias("cum"),
    ).select(
        "bucket", "n_tok",
        F.expr(f"(cum - n_tok) div {_BIN_TOKENS}").alias("bin_id"),
    )
    return (
        binned.groupBy("bucket", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("bucket", "bin_id")
    )


# --- q_unicode_norm ---------------------------------------------------------
# NFC normalization bank: deterministic per-doc suffixes that exercise every
# UAX #15 composition class — decomposed latin (e+U+0301), combining-mark
# REORDERING (U+1E0B dot-above + U+0323 dot-below recomposes to U+1E0D
# U+0307), Hangul jamo composition (LV -> one syllable), a SINGLETON
# (U+212B ANGSTROM SIGN -> U+00C5, changed but same length), and two
# NFC-stable controls.  The bank is the single source for BOTH engines; the
# normalizers are fully independent implementations (CPython unicodedata vs
# DuckDB's utf8proc), so value equality is a real cross-check, not an echo.
_NFC_BANK = [
    "caf\u00e9 composed",               # NFC-stable (precomposed \u00e9)
    "cafe\u0301 decomposed",            # e + combining acute -> \u00e9
    "man\u0303ana tilde",               # n + combining tilde -> \u00f1
    "A\u030angstr\u00f6m ring",        # A + combining ring -> \u00c5
    "\u1e0b\u0323 reorder",            # dot-above then dot-below, recomposes
    "\u1100\u1161 hangul jamo",        # L + V jamo -> U+AC00
    "\u212b angstrom sign",             # singleton -> U+00C5 (length-preserving)
    "plain ascii tail",                  # NFC-stable
]
_NFC_CASE = (
    "CASE doc_id % 8 "
    + " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(_NFC_BANK))
    + " END"
)
# Shared augmentation expression (ANSI subset both engines parse verbatim).
_NFC_AUG = f"trim(text) || ' ' || ({_NFC_CASE})"


@query(
    "q_unicode_norm",
    f"""
    SELECT doc_id,
           CAST(length(aug) AS BIGINT) AS n_cp_before,
           CAST(length(norm) AS BIGINT) AS n_cp_after,
           CAST(CASE WHEN aug <> norm THEN 1 ELSE 0 END AS BIGINT) AS changed,
           md5(norm) AS nfc_md5
    FROM (SELECT doc_id, aug, nfc_normalize(aug) AS norm
          FROM (SELECT doc_id, {_NFC_AUG} AS aug
                FROM documents WHERE trim(text) <> ''))
    """,
)
def q_unicode_norm(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode NFC normalization — the canonicalization pass every
    tokenizer-bound corpus runs before BPE training (GPT-NeoX / Llama
    recipes normalize to NFC; un-normalized text splits identical words
    into distinct tokens).  Each document is augmented with a deterministic
    suffix from an 8-entry bank covering decomposition, combining-mark
    reordering, Hangul jamo composition, and singleton substitution, then
    normalized.

    Spark has no JVM NFC builtin, so normalization runs in a VECTORIZED
    Arrow pandas UDF over CPython's unicodedata (UAX #15 implementation #1);
    the oracle normalizes with DuckDB's utf8proc (implementation #2) — the
    value-hash equality of md5(norm) is a genuine two-implementation
    conformance check.  Plan shape: pure per-row projection, ZERO exchanges
    (audit-asserted) — at 100 TB this is a map-only pass fused into the
    extraction scan."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x))

    d = T(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    aug = d.select("doc_id", F.expr(_NFC_AUG).alias("aug"))
    n = aug.withColumn("norm", nfc(F.col("aug")))
    return n.select(
        "doc_id",
        F.length("aug").cast("long").alias("n_cp_before"),
        F.length("norm").cast("long").alias("n_cp_after"),
        F.when(F.col("aug") != F.col("norm"), F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("changed"),
        F.md5(F.encode(F.col("norm"), "UTF-8")).alias("nfc_md5"),
    )
