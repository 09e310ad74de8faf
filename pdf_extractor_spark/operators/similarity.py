"""Similarity search over the embedding column (task brief §extras).

Two paths over ``embeddings(vec_id, embedding: array<float>, label)``:

* brute-force cosine top-k — the correctness baseline: explode to
  (vec_id, dim, v), dot products via a dim-join, rank per query;
* random-hyperplane LSH ANN — the scale path: 8 deterministic md5-derived
  hyperplanes hash every vector to a sign-bit bucket; candidates share a
  bucket; exact cosine re-ranks only candidates.

Both are pure relational plans with DuckDB oracles.  Cosines are compared
through round(·, 6)-keyed ranks and never emitted raw: aggregation order
differs between engines in the last ulp (registry.py portability rules).

Scale notes (100 TB): brute-force is O(Q×N×d) — fine for a broadcast-sized
query set, unusable all-pairs; the LSH bucket join bounds candidate fan-out
to bucket size, the classic IVF/LSH trade.  Both plans broadcast the small
side (query dims / plane coefficients) so the big embedding table never
shuffles for the join, only for its own groupBy(vec_id) dot-product
aggregation, which is partition-aligned with the table's natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import T, fan_out, query

_PLANES = 8

_DIMS_SQL = """
  dims AS (
    SELECT vec_id, u.i AS dim, CAST(u.v AS DOUBLE) AS v
    FROM (SELECT vec_id,
                 unnest(list_transform(embedding,
                                       (v, i) -> struct_pack(v := v, i := i))) AS u
          FROM embeddings)),
  norms AS (
    SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM dims GROUP BY vec_id)
"""


def _dims(spark: SparkSession, sf: str) -> DataFrame:
    e = fan_out(T(spark, sf, "embeddings"), "vec_id")
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "vf")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )


def _norms(dims: DataFrame) -> DataFrame:
    return dims.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))


@query(
    "q_ann_topk",
    "WITH "
    + _DIMS_SQL
    + f"""
    SELECT q_id, CAST(rn AS BIGINT) AS rn, cand_id FROM (
      SELECT q_id, cand_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY c DESC, cand_id) AS rn
      FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS cand_id,
               round(sum(a.v * b.v) / (na.nrm * nb.nrm), 6) AS c
        FROM dims a
        JOIN dims b ON a.dim = b.dim AND a.vec_id < 20 AND b.vec_id <> a.vec_id
        JOIN norms na ON na.vec_id = a.vec_id
        JOIN norms nb ON nb.vec_id = b.vec_id
        GROUP BY a.vec_id, b.vec_id, na.nrm, nb.nrm))
    WHERE rn <= 5
    """,
)
def q_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-5 for 20 query vectors: the ANN correctness
    baseline.  Rank key is round(cosine, 6) with vec_id tie-break, which
    absorbs the engines' summation-order ulp differences."""
    dims = _dims(spark, sf)
    norms = _norms(dims)
    q = dims.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "dim", F.col("v").alias("qv")
    )
    dots = (
        dims.join(F.broadcast(q), "dim")
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum(F.col("v") * F.col("qv")).alias("dot"))
    )
    nq = norms.select(F.col("vec_id").alias("q_id"), F.col("nrm").alias("qn"))
    nc = norms.select(F.col("vec_id").alias("cand_id"), F.col("nrm").alias("cn"))
    cos = F.round(F.col("dot") / (F.col("qn") * F.col("cn")), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("c"), F.asc("cand_id"))
    return (
        dots.join(F.broadcast(nq), "q_id")
        .join(nc, "cand_id")
        .select("q_id", "cand_id", cos.alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", F.col("rn").cast("long").alias("rn"), "cand_id")
    )


@query(
    "q_ann_lsh",
    "WITH "
    + _DIMS_SQL
    + f""",
  planes AS (
    SELECT h, dim,
           strpos('0123456789abcdef',
                  substr(md5(CAST(h AS VARCHAR) || ':' || CAST(dim AS VARCHAR)),
                         1, 1)) - 1 - 7.5 AS coef
    FROM range(0, {_PLANES}) p(h), range(1, 65) d(dim)),
  buckets AS (
    SELECT vec_id, string_agg(bit, '' ORDER BY h) AS bucket FROM (
      SELECT d.vec_id, p.h,
             CASE WHEN sum(p.coef * d.v) > 0 THEN '1' ELSE '0' END AS bit
      FROM dims d JOIN planes p ON d.dim = p.dim
      GROUP BY d.vec_id, p.h)
    GROUP BY vec_id),
  cands AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM buckets a JOIN buckets b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b FROM (
      SELECT c.vec_a, c.vec_b,
             round(sum(da.v * db.v) / (na.nrm * nb.nrm), 6) AS cos
      FROM cands c
      JOIN dims da ON da.vec_id = c.vec_a
      JOIN dims db ON db.vec_id = c.vec_b AND db.dim = da.dim
      JOIN norms na ON na.vec_id = c.vec_a
      JOIN norms nb ON nb.vec_id = c.vec_b
      GROUP BY c.vec_a, c.vec_b, na.nrm, nb.nrm)
    WHERE cos >= 0.25
    """,
)
def q_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed ANN: 8 md5-derived hyperplanes (coefficients are a pure
    function of (plane, dim) — reproducible on any engine), sign-bit bucket,
    candidates share the full 8-bit bucket, exact cosine >= 0.25 confirms.
    This is the scale path: cost ∝ bucket sizes, not N²."""
    dims = _dims(spark, sf)
    norms = _norms(dims)
    planes = (
        spark.range(0, _PLANES).select(F.col("id").alias("h"))
        .crossJoin(spark.range(1, 65).select(F.col("id").alias("dim")))
        .select(
            "h", "dim",
            F.expr(
                "locate(substring(md5(cast(concat(cast(h as string), ':', "
                "cast(dim as string)) as binary)), 1, 1), '0123456789abcdef')"
            ).alias("pos1"),
        )
        .select("h", "dim", (F.col("pos1") - 1 - 7.5).alias("coef"))
    )
    bits = (
        dims.join(F.broadcast(planes), "dim")
        .groupBy("vec_id", "h")
        .agg(F.when(F.sum(F.col("coef") * F.col("v")) > 0, "1").otherwise("0").alias("bit"))
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("h", "bit"))), lambda s: s["bit"]
    )
    buckets = bits.groupBy("vec_id").agg(F.concat_ws("", ordered).alias("bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    cands = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    da = dims.select(F.col("vec_id").alias("vec_a"), "dim", F.col("v").alias("va"))
    db = dims.select(F.col("vec_id").alias("vec_b"), "dim", F.col("v").alias("vb"))
    dots = (
        cands.join(da, "vec_a").join(db, ["vec_b", "dim"])
        .groupBy("vec_a", "vec_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = _norms(dims).select(F.col("vec_id").alias("vec_a"), F.col("nrm").alias("na"))
    nb = _norms(dims).select(F.col("vec_id").alias("vec_b"), F.col("nrm").alias("nb"))
    cos = F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
    return (
        dots.join(F.broadcast(na), "vec_a")
        .join(F.broadcast(nb), "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= 0.25)
        .select("vec_a", "vec_b")
    )


@query(
    "q_dedup_cosine",
    "WITH "
    + _DIMS_SQL
    + """
    SELECT vec_a, vec_b FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(sum(a.v * b.v) / (na.nrm * nb.nrm), 6) AS cos
      FROM dims a
      JOIN dims b ON a.dim = b.dim AND a.vec_id < b.vec_id
                 AND a.vec_id < 150 AND b.vec_id < 150
      JOIN norms na ON na.vec_id = a.vec_id
      JOIN norms nb ON nb.vec_id = b.vec_id
      GROUP BY a.vec_id, b.vec_id, na.nrm, nb.nrm)
    WHERE cos >= 0.35
    """,
)
def q_dedup_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>= 0.35) within a vec_id window —
    the semantic-dedup primitive.  At scale this exact pass runs only inside
    LSH buckets (q_ann_lsh), never all-pairs."""
    dims = _dims(spark, sf).filter(F.col("vec_id") < 150)
    norms = _norms(dims)
    a = dims.select(F.col("vec_id").alias("vec_a"), "dim", F.col("v").alias("va"))
    b = dims.select(F.col("vec_id").alias("vec_b"), "dim", F.col("v").alias("vb"))
    dots = (
        a.join(b, ["dim"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("vec_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("vec_id").alias("vec_b"), F.col("nrm").alias("nb"))
    cos = F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
    return (
        dots.join(F.broadcast(na), "vec_a")
        .join(F.broadcast(nb), "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= 0.35)
        .select("vec_a", "vec_b")
    )


@query(
    "q_ann_ivf",
    "WITH "
    + _DIMS_SQL
    + """,
  cents AS (
    SELECT vec_id AS cid, dim, v AS cv FROM dims WHERE vec_id < 8),
  assign AS (
    SELECT vec_id, cid FROM (
      SELECT d.vec_id, c.cid,
             row_number() OVER (PARTITION BY d.vec_id
                                ORDER BY round(sum((d.v - c.cv) *
                                                   (d.v - c.cv)), 6), c.cid)
               AS rn
      FROM dims d JOIN cents c ON d.dim = c.dim
      GROUP BY d.vec_id, c.cid)
    WHERE rn = 1),
  cand AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id
    FROM assign q JOIN assign c
      ON q.cid = c.cid AND q.vec_id < 20 AND c.vec_id <> q.vec_id)
    SELECT q_id, CAST(rn AS BIGINT) AS rn, cand_id FROM (
      SELECT x.q_id, x.cand_id,
             row_number() OVER (PARTITION BY x.q_id
                                ORDER BY x.c DESC, x.cand_id) AS rn
      FROM (
        SELECT cd.q_id, cd.cand_id,
               round(sum(a.v * b.v) / (na.nrm * nb.nrm), 6) AS c
        FROM cand cd
        JOIN dims a ON a.vec_id = cd.q_id
        JOIN dims b ON b.vec_id = cd.cand_id AND b.dim = a.dim
        JOIN norms na ON na.vec_id = cd.q_id
        JOIN norms nb ON nb.vec_id = cd.cand_id
        GROUP BY cd.q_id, cd.cand_id, na.nrm, nb.nrm) x)
    WHERE rn <= 3
    """,
)
def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN: a training-free coarse quantizer (centroids = the
    first 8 vectors — deterministic, no k-means iterations to reproduce),
    every vector assigned to its nearest centroid cell, search probes ONLY
    the query's cell, exact cosine re-ranks to top-3.

    The scale story vs brute force: assignment is one pass over N, search
    cost ∝ cell size (~N/K), and cells are the partition key — the same
    inverted-file trade real IVF indexes make; swapping in k-means centroids
    changes recall, not the plan shape."""
    dims = _dims(spark, sf)
    norms = _norms(dims)
    cents = dims.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), "dim", F.col("v").alias("cv")
    )
    d2 = F.round(F.sum((F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))), 6)
    dist = (
        dims.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "cid")
        .agg(d2.alias("d2"))
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    assign = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    q = assign.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "cid"
    )
    cand = q.join(assign, "cid").filter(F.col("vec_id") != F.col("q_id")).select(
        "q_id", F.col("vec_id").alias("cand_id")
    )
    da = dims.select(F.col("vec_id").alias("q_id"), "dim", F.col("v").alias("va"))
    db = dims.select(F.col("vec_id").alias("cand_id"), "dim", F.col("v").alias("vb"))
    dots = (
        cand.join(da, "q_id").join(db, ["cand_id", "dim"])
        .groupBy("q_id", "cand_id")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("q_id"), F.col("nrm").alias("qn"))
    nb = norms.select(F.col("vec_id").alias("cand_id"), F.col("nrm").alias("cn"))
    cos = F.round(F.col("dot") / (F.col("qn") * F.col("cn")), 6)
    w2 = Window.partitionBy("q_id").orderBy(F.desc("c"), F.asc("cand_id"))
    return (
        dots.join(F.broadcast(na), "q_id").join(F.broadcast(nb), "cand_id")
        .select("q_id", "cand_id", cos.alias("c"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 3)
        .select("q_id", F.col("rn").cast("long").alias("rn"), "cand_id")
    )
