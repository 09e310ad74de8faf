"""Deduplication operators for a training-data pipeline (task brief §extras).

Four families, all expressed relationally (JVM-side; md5 is the portable
hash both Spark and the DuckDB oracle share):

* exact dedup           — normalize → hash → groupBy
* n-gram Jaccard        — char-5-gram shingles, pair overlap via shingle join
* MinHash + LSH banding — 16 lexicographic-min md5 signatures, 8 bands of 2,
                          band-bucket join for candidate pairs
* SimHash               — 16-bit sign-of-sum sketch from per-token md5 bits

Scale notes (100 TB): the shingle self-join is the textbook near-dup plan —
shuffle keyed on the shingle/band value, so hot shingles are the skew risk;
the MinHash variant exists precisely because its band buckets bound the join
fan-out (band collisions ≈ true near-dups, not vocabulary overlap).  The
pairwise Jaccard query is capped to a doc_id window here; at scale it runs
only WITHIN LSH buckets (candidate verification), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import T, fan_out, query

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    """
    SELECT h, CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS keeper
    FROM (SELECT doc_id,
                 md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS h
          FROM documents)
    GROUP BY h
    """,
)
def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: canonicalize (lower + whitespace collapse) → md5 →
    hash-groupBy keeping the smallest doc_id (deterministic keeper)."""
    d = T(spark, sf, "documents")
    h = F.md5(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")).cast("binary")
    )
    return d.select("doc_id", h.alias("h")).groupBy("h").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").cast("long").alias("keeper"),
    )


# ---------------------------------------------------------------------------
# Shared shingle fragments
# ---------------------------------------------------------------------------

# Test-scale doc_id windows, shared verbatim between each Spark query and
# its oracle SQL (single source of truth — VERDICT.md round-2 note: caps as
# separate literals in two places could silently desynchronize on an sf
# bump).  tests/test_driver_contract.py asserts the oracle embeds them.
NGRAM_CAP = 100   # all-pairs Jaccard baseline window (demo-bounded)
LSH_CAP = 200     # MinHash/LSH family corpus window

_SHINGLES_SQL = """
  shingles AS (
    SELECT DISTINCT doc_id, sh FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, length(text) - 3),
                                   i -> substr(text, CAST(i AS INT), 5))) AS sh
      FROM documents WHERE doc_id < {cap} AND length(text) >= 5))
"""


def _shingle_array(spark: SparkSession, sf: str, cap: int) -> DataFrame:
    """Per-doc DISTINCT char-5-gram shingle ARRAY — the round-2 shape: one
    row per doc, shingle set intact, so signatures and set intersections run
    as per-row higher-order folds instead of exploded-row shuffles."""
    d = fan_out(
        T(spark, sf, "documents").filter(
            (F.col("doc_id") < cap) & (F.length("text") >= 5)
        ),
        "doc_id",
    )
    shs = F.array_distinct(
        F.expr("transform(sequence(1, length(text) - 4), i -> substring(text, i, 5))")
    )
    return d.select("doc_id", shs.alias("shs"))


def _shingles(spark: SparkSession, sf: str, cap: int) -> DataFrame:
    d = fan_out(
        T(spark, sf, "documents").filter(
            (F.col("doc_id") < cap) & (F.length("text") >= 5)
        ),
        "doc_id",
    )
    sh = F.explode(
        F.expr("transform(sequence(1, length(text) - 4), i -> substring(text, i, 5))")
    )
    return d.select("doc_id", sh.alias("sh")).distinct()


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


@query(
    "q_dedup_ngram",
    "WITH "
    + _SHINGLES_SQL.format(cap=NGRAM_CAP)
    + """,
  sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
  pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
    FROM shingles a JOIN shingles b
      ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id)
    SELECT p.doc_a, p.doc_b, CAST(p.inter AS BIGINT) AS n_common,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.25
    """,
)
def q_dedup_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """Char-5-gram Jaccard near-dup pairs (threshold 0.25) over a doc_id
    window — the PEDAGOGICAL all-pairs formulation (the window cap is what
    makes it runnable).  The production-shaped composition is q_dedup_verify:
    identical Jaccard math, but scoped to MinHash-LSH candidate buckets so
    no all-pairs join ever runs.  jaccard = |A∩B| / (|A|+|B|-|A∩B|) is a
    per-pair integer ratio — bit-identical across engines."""
    sh = _shingles(spark, sf, NGRAM_CAP)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    j = F.col("inter").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("inter")
    )
    return (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(j >= 0.25)
        .select(
            "doc_a", "doc_b",
            F.col("inter").cast("long").alias("n_common"),
            F.col("sa.n").cast("long").alias("n_a"),
            F.col("sb.n").cast("long").alias("n_b"),
            j.alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

_N_HASHES = 16
_BAND_SIZE = 2  # 8 bands of 2


@query(
    "q_minhash_lsh",
    "WITH "
    + _SHINGLES_SQL.format(cap=LSH_CAP)
    + f""",
  sig AS (
    SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS mh
    FROM shingles, range(0, {_N_HASHES}) r(seed)
    GROUP BY doc_id, seed),
  bands AS (
    SELECT doc_id, CAST(seed // {_BAND_SIZE} AS INT) AS band,
           md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
    FROM sig GROUP BY doc_id, CAST(seed // {_BAND_SIZE} AS INT))
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    """,
)
def q_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash(16) + LSH(8 bands × 2 rows) candidate pairs.  The min of md5
    hex strings is a valid uniform min-hash (lexicographic order over a
    uniform hash), and — unlike integer-conversion tricks — is portable to
    the DuckDB oracle verbatim.

    ARRAY-NATIVE (round 2): the 16 signatures are per-row ``array_min``
    folds over the shingle array and bands explode to just 8 rows/doc — the
    round-1 formulation exploded shingles x 16 seeds (~4800 rows per doc)
    through two groupBy shuffles before the band join.  Now the ONLY
    shuffle is the band-bucket join itself, which is the algorithm.

    At scale: the band-bucket join replaces the all-pairs Jaccard; bucket
    sizes are the skew control (band width tunes precision/recall)."""
    return minhash_lsh_pairs(_shingle_array(spark, sf, LSH_CAP))


def _band_rows(base: DataFrame) -> DataFrame:
    """(doc_id, shs) -> (doc_id, band, bkey): 16 per-row array_min MinHash
    signatures folded into 8 two-row band keys — 8 rows per doc, no
    shuffle."""

    def _sig(seed: int):
        # nb: the lambda MUST take exactly one arg — a second parameter
        # (even defaulted) makes pyspark pass the element INDEX into it
        return F.array_min(
            F.transform(
                F.col("shs"),
                lambda sh: F.md5(F.concat_ws(":", F.lit(seed), sh).cast("binary")),
            )
        )

    sigs = [_sig(seed) for seed in range(_N_HASHES)]
    band_structs = [
        F.struct(
            F.lit(b // _BAND_SIZE).cast("int").alias("band"),
            F.md5(
                F.concat_ws("|", *sigs[b:b + _BAND_SIZE]).cast("binary")
            ).alias("bkey"),
        )
        for b in range(0, _N_HASHES, _BAND_SIZE)
    ]
    return base.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))


def minhash_lsh_pairs(base: DataFrame) -> DataFrame:
    """(doc_id, shs) -> DISTINCT (doc_a, doc_b) LSH candidate pairs; the
    parameterized plan q_minhash_lsh runs at LSH_CAP and
    scripts/bench_lsh_growth.py runs uncapped for the candidate-growth
    measurement.

    SCALE NOTE (measured, scripts/bench_lsh_growth.py): enumerating every
    within-bucket pair is quadratic in DUP-CLUSTER SIZE — on a corpus whose
    clusters grow with n (boilerplate/template pages at web scale), pair
    output itself goes ~n^2 even though the algorithm never compares
    non-colliding docs.  That is inherent to emitting the pair RELATION
    (the true near-dup pair count is quadratic too); consumers that only
    need components/dedup decisions should take ``minhash_star_edges``
    instead, whose edge count is bounded by the band ROWS (8n)."""
    bands = _band_rows(base)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_star_edges(base: DataFrame) -> DataFrame:
    """Per-bucket STAR edges (every doc -> the bucket's min doc) instead of
    within-bucket cliques: connected components are IDENTICAL (any two docs
    in a bucket are linked through its hub; transitive closure across
    buckets is untouched) while edge count is bounded by the band rows
    (<= 8 per doc, so O(n) vs the clique join's O(sum bucket^2)) — the
    standard trick that makes LSH dedup linear when duplicate clusters grow
    with the corpus.  Measured: scripts/bench_lsh_growth.py (clique pairs
    x99 per 10x docs vs star edges x~10).  One window shuffle on
    (band, bkey); equality of downstream clusters is pinned by
    tests/test_dedup.py::test_star_edges_same_clusters."""
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bkey")
    bands = _band_rows(base)
    return (
        bands
        .withColumn("hub", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Substring-level dedup (winnowing fingerprints)
# ---------------------------------------------------------------------------

# Token-8-gram hashes sampled by winnowing (min hash per window of 4
# consecutive grams — Schleimer et al., the MOSS scheme): any substring
# shared between two documents that spans >= K+W-1 = 11 whitespace tokens
# is guaranteed to contribute at least one common fingerprint.
_SUB_K = 8   # gram size, in tokens
_SUB_W = 4   # winnowing window, in grams

# Shared winnowing CTE chain — the SINGLE SOURCE of the (K, W) scheme on
# the oracle side, embedded verbatim by both q_substring_dedup and
# q_decontaminate so the two oracles can never desynchronize (the same
# discipline as the NGRAM_CAP/LSH_CAP constants above).
_WINNOW_CTES = f"""toks AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE trim(text) <> ''
    ),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - {_SUB_K - 2}),
                            i -> md5(array_to_string(
                                     list_slice(t, i, i + {_SUB_K - 1}), ' '))) AS g
      FROM toks WHERE len(t) >= {_SUB_K}
    ),
    fps AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(g) - {_SUB_W - 2}),
                            i -> list_min(list_slice(g, i, i + {_SUB_W - 1})))) AS f
      FROM grams WHERE len(g) >= {_SUB_W}
    ),
    expl AS (SELECT doc_id, unnest(f) AS fp FROM fps)"""


def _winnow_fp_rows(base: DataFrame) -> DataFrame:
    """(doc_id, text, ...) -> exploded (doc_id, fp) winnowing fingerprint
    rows.  Grams and the window-min sample are per-row JVM array folds —
    nothing explodes until the ~1/W sampled fingerprints.  The Spark twin
    of _WINNOW_CTES."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    # One combined filter on the TOKEN count, not on the computed gram
    # array: for size(t) >= K, size(g) == size(t) - K + 1 exactly, so
    # "size(g) >= W" is equivalent to "size(t) >= K + W - 1".  Filtering on
    # size(g) inlines the whole md5-gram transform into the predicate, and
    # filter pushdown then evaluates it BELOW the fan-out exchange — every
    # gram hashed twice, the first time single-task (measured 5.0 s -> the
    # cheap-predicate form at sf0.1).  Same selected rows as the oracle's
    # len(t) >= K / len(g) >= W chain.
    t = (
        base.filter(F.trim(F.col("text")) != "")
        .select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= _SUB_K + _SUB_W - 1)
    )
    # greatest(..., 1) keeps the sequence bound TOTAL: sequence(1, n) turns
    # DESCENDING for n < 1 (it emits [1, 0, ...]), and Catalyst's filter
    # pushdown may inline these transforms into a combined predicate that
    # evaluates BEFORE the size(t)/size(g) guards — slice(t, 0, k) then
    # throws.  Short rows compute one throwaway gram and are filtered as
    # before; surviving rows are unchanged.
    grams = F.expr(
        f"transform(sequence(1, greatest(size(t) - {_SUB_K - 1}, 1)), "
        f"i -> md5(cast(concat_ws(' ', slice(t, i, {_SUB_K})) as binary)))"
    )
    g = t.select("doc_id", grams.alias("g"))  # size(g) >= W by the filter above
    fps = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size(g) - {_SUB_W - 1}, 1)), "
            f"i -> array_min(slice(g, i, {_SUB_W})))"
        )
    )
    return g.select("doc_id", F.explode(fps).alias("fp"))


@query(
    "q_substring_dedup",
    f"""
    WITH {_WINNOW_CTES},
    cnt AS (SELECT fp, count(*) AS nd FROM expl GROUP BY fp)
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_fp,
           CAST(sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           round(sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS dup_frac
    FROM expl e JOIN cnt c ON e.fp = c.fp
    GROUP BY e.doc_id
    """,
)
def q_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SUBSTRING-level dedup via winnowing fingerprints — the third dedup
    granularity next to document-level (q_dedup_exact/q_minhash_lsh) and
    paragraph-level (q_paragraph_dedup): training-data pipelines remove
    repeated SPANS (boilerplate, licenses, chain letters) that survive both
    coarser passes (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" — their ExactSubstr pass; reference analogue:
    none, this is a north-star pipeline extra).

    Per doc, ALL token-8-gram md5s and the winnowed sample (min per window
    of 4) are per-row JVM array folds — nothing explodes until the sampled
    fingerprints (~1/W of grams).  Then: one groupBy(fp) for document
    frequency, one fp-keyed join back, one groupBy(doc).  At 100 TB this is
    the linear plan: no pair enumeration anywhere; a boilerplate
    fingerprint shared by millions of docs is a single hot reduce key whose
    count still partial-aggregates map-side, and the join fan-out is
    bounded by the input row count.  Output: per-doc fingerprint count,
    how many are shared with ANY other doc, and the duplicated fraction
    (the ExactSubstr removal signal)."""
    ex = _winnow_fp_rows(fan_out(T(spark, sf, "documents"), "doc_id"))
    cnt = ex.groupBy("fp").agg(F.count(F.lit(1)).alias("nd"))
    shared = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
    return (
        ex.join(cnt, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fp"),
            shared.cast("long").alias("n_shared"),
        )
        .withColumn("dup_frac", F.round(F.col("n_shared") / F.col("n_fp"), 6))
    )


# The deterministic stand-in for a held-out evaluation set: every 7th doc.
# A real deployment swaps this split for the actual benchmark table; the
# plan shape (small broadcast side) is the point being exercised.
_BENCH_MOD = 7


@query(
    "q_decontaminate",
    f"""
    WITH {_WINNOW_CTES},
    bench AS (SELECT DISTINCT fp FROM expl WHERE doc_id % {_BENCH_MOD} = 0),
    corpus AS (SELECT doc_id, fp FROM expl WHERE doc_id % {_BENCH_MOD} <> 0)
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_fp,
           CAST(sum(CASE WHEN b.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hits,
           CAST(CASE WHEN sum(CASE WHEN b.fp IS NOT NULL THEN 1 ELSE 0 END) > 0
                THEN 1 ELSE 0 END AS BIGINT) AS contaminated
    FROM corpus c LEFT JOIN bench b ON c.fp = b.fp
    GROUP BY c.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark DECONTAMINATION — the standard pre-training hygiene pass
    (GPT-3 appendix C / PaLM / Llama all report n-gram-overlap decontam
    against eval sets): flag training docs that share any winnowed
    substring fingerprint (same (K, W) scheme as q_substring_dedup, via
    the shared _winnow_fp_rows/_WINNOW_CTES machinery) with a benchmark
    set — here the deterministic doc_id % _BENCH_MOD == 0 slice standing
    in for the eval table.

    The 100-TB plan shape is the point: benchmark sets are tiny (at most
    ~1e5 docs), so their fingerprint set BROADCASTS — the corpus side is
    never shuffled for the membership test, only for the final per-doc
    rollup.  Output per corpus doc: fingerprint count, benchmark-hit
    count, and the contaminated flag used to drop or quarantine."""
    ex = _winnow_fp_rows(fan_out(T(spark, sf, "documents"), "doc_id"))
    bench = (
        ex.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("fp").distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = ex.filter(F.col("doc_id") % _BENCH_MOD != 0)
    hits = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (
        corpus.join(F.broadcast(bench), "fp", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fp"),
            hits.cast("long").alias("n_hits"),
        )
        .withColumn(
            "contaminated", (F.col("n_hits") > 0).cast("long")
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIM_BITS = 16


@query(
    "q_simhash",
    f"""
    WITH toks AS (
      SELECT doc_id, md5(u.w) AS h
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     regexp_split_to_array(trim(text), '\\s+'),
                     (w, i) -> struct_pack(w := w, i := i))) AS u
            FROM documents WHERE trim(text) <> '')),
    bits AS (
      SELECT doc_id, j,
             CASE WHEN sum(CASE WHEN substr(h, CAST(j AS INT), 1)
                                     IN ('8','9','a','b','c','d','e','f')
                                THEN 1 ELSE -1 END) > 0
                  THEN '1' ELSE '0' END AS bit
      FROM toks, range(1, {_SIM_BITS + 1}) r(j)
      GROUP BY doc_id, j)
    SELECT doc_id, string_agg(bit, '' ORDER BY j) AS sketch
    FROM bits GROUP BY doc_id
    """,
)
def q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """16-bit SimHash: per-token md5, bit j votes +1/-1 by the top bit of hex
    nibble j, sign of the per-doc sum is sketch bit j.  Docs sharing a sketch
    are near-dup candidates (exact-match join on the sketch at scale).

    ARRAY-NATIVE (round 2): token hashes are one per-row ``transform``, each
    sketch bit one integer ``aggregate`` fold — ZERO shuffles.  The round-1
    formulation exploded tokens x 16 bits (16x row inflation of the token
    stream) and re-grouped twice; this is a pure projection.  Oracle
    (exploded formulation) unchanged — same values, different physics."""
    d = fan_out(
        T(spark, sf, "documents").filter(F.trim(F.col("text")) != ""), "doc_id"
    )
    hashes = F.transform(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda w: F.md5(w.cast("binary")),
    )
    hd = d.select("doc_id", hashes.alias("hs"))
    hot = list("89abcdef")

    def bit(j: int):
        vote = F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.substring(h, j, 1).isin(hot), 1).otherwise(-1),
        )
        return F.when(vote > 0, "1").otherwise("0")

    return hd.select(
        "doc_id", F.concat(*[bit(j) for j in range(1, _SIM_BITS + 1)]).alias("sketch")
    )


@query(
    "q_dedup_verify",
    "WITH "
    + _SHINGLES_SQL.format(cap=LSH_CAP)
    + f""",
  sig AS (
    SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS mh
    FROM shingles, range(0, {_N_HASHES}) r(seed)
    GROUP BY doc_id, seed),
  bands AS (
    SELECT doc_id, CAST(seed // {_BAND_SIZE} AS INT) AS band,
           md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
    FROM sig GROUP BY doc_id, CAST(seed // {_BAND_SIZE} AS INT)),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
  sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
  inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter
    FROM cand c
    JOIN shingles a ON a.doc_id = c.doc_a
    JOIN shingles b ON b.doc_id = c.doc_b AND b.sh = a.sh
    GROUP BY c.doc_a, c.doc_b)
  SELECT i.doc_a, i.doc_b, CAST(i.inter AS BIGINT) AS n_common,
         CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard,
         CASE WHEN CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
              THEN 'dup' ELSE 'candidate' END AS verdict
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  """,
)
def q_dedup_verify(spark: SparkSession, sf: str) -> DataFrame:
    """The composed 100-TB dedup plan (VERDICT.md item 6): exact Jaccard
    verification scoped to the MinHash-LSH candidate pairs — never all-pairs.
    The pairwise-join bound is STRUCTURAL: shingle joins run only for pairs
    that already collided in a band bucket, so cost ∝ (candidate pairs x
    shingles/doc), not N².  (The doc_id < 200 window comes from the shared
    test-scale shingle CTE — it bounds the TEST corpus, not the algorithm;
    at scale the same plan runs uncapped because the LSH bucket join is the
    only quadratic-risk stage and banding bounds it.)

    Each candidate pair gets its true Jaccard and a verdict at threshold
    0.5 — the verify step the q_dedup_ngram docstring promises.

    ARRAY-NATIVE (round 2): each pair's overlap is ONE per-row
    ``array_intersect`` over the two intact shingle sets — the round-1 plan
    joined the exploded shingle rows of both sides through a
    per-pair-per-shingle shuffle.  Now only (doc_id -> shingle array) joins
    ship, keyed on the candidate ids."""
    return jaccard_verify(
        q_minhash_lsh(spark, sf), _shingle_array(spark, sf, LSH_CAP)
    )


def jaccard_verify(cand: DataFrame, base: DataFrame) -> DataFrame:
    """Exact-Jaccard verdicts scoped to ``cand`` pairs over ``base``
    (doc_id, shs) shingle arrays — the parameterized verify stage shared by
    q_dedup_verify and scripts/bench_lsh_growth.py."""
    a = base.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    paired = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("shs_a", "shs_b")).alias("inter"),
            F.size("shs_a").alias("n_a"),
            F.size("shs_b").alias("n_b"),
        )
    )
    j = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    )
    return paired.select(
        "doc_a", "doc_b",
        F.col("inter").cast("long").alias("n_common"),
        j.alias("jaccard"),
        F.when(j >= 0.5, "dup").otherwise("candidate").alias("verdict"),
    )


#: Per-(band, bkey) candidate cap for the CAPPED verify path — the 100-TB
#: mitigation for quadratic pair growth inside template-page mega-buckets
#: (measured by scripts/bench_lsh_growth.py: clique pairs grow ~n^2 when
#: duplicate clusters scale with the corpus).  Shared verbatim with the
#: oracle SQL (test_cap_constants_embedded_in_oracles).
VERIFY_BUCKET_CAP = 12


@query(
    "q_dedup_verify_capped",
    "WITH "
    + _SHINGLES_SQL.format(cap=LSH_CAP)
    + f""",
  sig AS (
    SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS mh
    FROM shingles, range(0, {_N_HASHES}) r(seed)
    GROUP BY doc_id, seed),
  bands AS (
    SELECT doc_id, CAST(seed // {_BAND_SIZE} AS INT) AS band,
           md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
    FROM sig GROUP BY doc_id, CAST(seed // {_BAND_SIZE} AS INT)),
  capped AS (
    SELECT doc_id, band, bkey FROM (
      SELECT doc_id, band, bkey,
             row_number() OVER (PARTITION BY band, bkey
                                ORDER BY doc_id) AS rn
      FROM bands)
    WHERE rn <= {VERIFY_BUCKET_CAP}),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
  sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
  inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter
    FROM cand c
    JOIN shingles a ON a.doc_id = c.doc_a
    JOIN shingles b ON b.doc_id = c.doc_b AND b.sh = a.sh
    GROUP BY c.doc_a, c.doc_b)
  SELECT i.doc_a, i.doc_b, CAST(i.inter AS BIGINT) AS n_common,
         CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard,
         CASE WHEN CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
              THEN 'dup' ELSE 'candidate' END AS verdict
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  """,
)
def q_dedup_verify_capped(spark: SparkSession, sf: str) -> DataFrame:
    """Pair-level verification with a PER-BUCKET candidate cap (VERDICT
    round-4 item 8): the LSH-growth experiment proved verified-pair
    enumeration is inherently ~quadratic when duplicate-cluster sizes
    scale with the corpus, so the 100-TB verify path keeps only the first
    VERIFY_BUCKET_CAP docs (deterministic: lowest doc_id) of each
    (band, bkey) bucket BEFORE pair enumeration — bounding pairs per
    bucket at cap*(cap-1)/2 regardless of bucket size, while component
    connectivity is preserved by the uncapped star-edge path
    (minhash_star_edges) that the clusters query uses.

    The cap is applied as a row_number window on the band rows ahead of
    the self-join (plan-audited: the Filter(rn <= cap) sits below the
    verify joins), and the cap constant is embedded verbatim in both
    engines' SQL."""
    from pyspark.sql import Window

    base = _shingle_array(spark, sf, LSH_CAP)
    w = Window.partitionBy("band", "bkey").orderBy("doc_id")
    capped = (
        _band_rows(base)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= VERIFY_BUCKET_CAP)
        .drop("rn")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return jaccard_verify(cand, base)


@query(
    "q_pagerank_iter",
    "WITH "
    + _SHINGLES_SQL.format(cap=LSH_CAP)
    + f""",
  sig AS (
    SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS mh
    FROM shingles, range(0, {_N_HASHES}) r(seed)
    GROUP BY doc_id, seed),
  bands AS (
    SELECT doc_id, CAST(seed // {_BAND_SIZE} AS INT) AS band,
           md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
    FROM sig GROUP BY doc_id, CAST(seed // {_BAND_SIZE} AS INT)),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
  edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM cand
    UNION ALL SELECT doc_b, doc_a FROM cand),
  deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)
  SELECT n.node AS doc_id,
         round(0.15 + 0.85 * coalesce(sum(1.0 / dg.d), 0), 6) AS pr
  FROM (SELECT DISTINCT src AS node FROM edges) n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n.node
  """,
)
def q_pagerank_iter(spark: SparkSession, sf: str) -> DataFrame:
    """One PageRank iteration (damping 0.85, uniform start pr=1) over the
    undirected MinHash near-dup graph — the centrality primitive for
    picking a canonical document per duplicate neighborhood.  Plan shape is
    the iterative step: edges join broadcast degrees, one groupBy(dst), so
    looping it is the standard Pregel-style pattern (same physics as
    q_dup_clusters' min-label loop)."""
    cand = q_minhash_lsh(spark, sf)
    edges = cand.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        cand.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    contrib = (
        edges.join(F.broadcast(deg), "src")
        .groupBy(F.col("dst").alias("doc_id"))
        .agg(F.sum(F.lit(1.0) / F.col("d")).alias("s"))
    )
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    return nodes.join(contrib, "doc_id", "left").select(
        "doc_id",
        F.round(0.15 + 0.85 * F.coalesce(F.col("s"), F.lit(0.0)), 6).alias("pr"),
    )


_CLUSTER_ORACLE = (
    "WITH RECURSIVE "
    + _SHINGLES_SQL.format(cap=LSH_CAP)
    + f""",
  sig AS (
    SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS mh
    FROM shingles, range(0, {_N_HASHES}) r(seed)
    GROUP BY doc_id, seed),
  bands AS (
    SELECT doc_id, CAST(seed // {_BAND_SIZE} AS INT) AS band,
           md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
    FROM sig GROUP BY doc_id, CAST(seed // {_BAND_SIZE} AS INT)),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
  nodes AS (SELECT DISTINCT doc_id FROM (
      SELECT doc_a AS doc_id FROM cand
      UNION ALL SELECT doc_b FROM cand)),
  edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM cand
    UNION ALL SELECT doc_b, doc_a FROM cand),
  walk(node, label) AS (
    SELECT doc_id, doc_id FROM nodes
    UNION
    SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node)
  SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster
  FROM walk GROUP BY node
"""
)


@query("q_dup_clusters", _CLUSTER_ORACLE)
def q_dup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-CLUSTER resolution: connected components over the MinHash
    candidate-pair graph by iterative min-label propagation — the step that
    turns pairwise near-dup hits into keep-one-per-cluster decisions.

    Spark side: the standard fixpoint loop (join labels to neighbors, take
    min, repeat until the label-sum checksum stabilizes) — the iterative
    pattern Catalyst cannot express in one plan.  Oracle side: a recursive
    CTE computing reachability labels; min reachable id == min component id
    on an undirected graph.  Both converge to identical labels because the
    min-label fixpoint is unique.

    Round 4: the Spark side propagates over ``minhash_star_edges`` (O(n)
    edges) while the oracle keeps the clique-pair formulation — components
    and therefore labels are identical (test-pinned), and the star graph is
    what survives a corpus whose dup clusters grow with n."""
    cand = minhash_star_edges(_shingle_array(spark, sf, LSH_CAP))
    nodes = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    edges = cand.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        cand.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("label")).persist()
    edges = edges.persist()
    prev_sum = None
    # Loop to the checksum fixpoint — min-label needs up to graph-diameter
    # iterations, which no fixed small cap can promise for chained near-dups.
    # The generous cap turns non-convergence (a bug) into a loud failure
    # instead of silently returning wrong clusters.
    max_iters = 1000
    converged = False
    for it in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nlabel", "label"))
                .alias("label"),
            )
            .persist()
        )
        if it % 5 == 4:
            # truncate lineage every k iterations: persist caches data but
            # the logical plan still grows per round — on a big graph the
            # planner cost and any recompute-after-eviction would blow up.
            # Unpersist the pre-checkpoint frame; the checkpoint holds its
            # own copy.  NB: unpersist() does NOT free localCheckpoint RDD
            # blocks — those are released by the ContextCleaner only when
            # the RDD is garbage-collected, so rebinding `labels` each round
            # (dropping the last reference) is what actually bounds the
            # checkpoint storage to O(1) recent copies.
            cp = new_labels.localCheckpoint(eager=True)
            new_labels.unpersist()
            new_labels = cp
        checksum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if checksum == prev_sum:
            converged = True
            break
        prev_sum = checksum
    if not converged:
        raise RuntimeError(
            f"q_dup_clusters: min-label propagation did not converge in "
            f"{max_iters} iterations — graph diameter exceeds cap or labels "
            f"oscillate (bug); refusing to return unconverged clusters"
        )
    out = labels.select("doc_id", F.col("label").cast("long").alias("cluster"))
    edges.unpersist()
    return out
