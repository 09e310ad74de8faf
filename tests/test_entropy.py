"""Character-entropy quality signal (operators/textstats.q_char_entropy):
independent stdlib recompute over the raw parquet, plus boundary semantics."""

import collections
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from pdf_extractor_spark.operators.textstats import q_char_entropy


def test_matches_stdlib_recompute(spark, sf_dir):
    got = {r.doc_id: r for r in q_char_entropy(spark, sf_dir).collect()}
    rows = duckdb.sql(
        f"select doc_id, text from read_parquet('{sf_dir}/documents.parquet')"
        f" where trim(text) <> ''"
    ).fetchall()
    assert len(rows) == len(got)
    for doc_id, text in rows:
        c = collections.Counter(text)
        n = sum(c.values())
        h = round(
            math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n, 6)
        r = got[doc_id]
        assert r.n_chars == n and r.n_distinct == len(c)
        assert abs(r.entropy - h) < 2e-6, (doc_id, r.entropy, h)


def test_entropy_orders_repetitive_below_diverse(spark, sf_dir):
    # sanity on the signal itself: a constant string has entropy 0; a
    # permutation-rich one approaches log2(alphabet)
    import pyspark.sql.functions as F

    from pdf_extractor_spark.operators import registry

    df = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaa"), (2, "abcdefghijklmnop")],
        "doc_id long, text string")
    df.createOrReplaceTempView("_ent_probe")
    k = (df.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
           .filter(F.col("ch") != "")
           .groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt")))
    n = F.sum("cnt").cast("double")
    ent = k.groupBy("doc_id").agg(
        F.round(F.log2(n) - F.sum(F.col("cnt") * F.log2(F.col("cnt"))) / n, 6)
        .alias("entropy"))
    vals = {r.doc_id: r.entropy for r in ent.collect()}
    assert vals[1] == 0.0
    assert abs(vals[2] - 4.0) < 1e-9


def test_astral_plane_matches_duckdb(spark, tmp_path):
    """Round-4 ADVICE: split(text,'') on the JVM yields UTF-16 surrogate
    halves for non-BMP chars while DuckDB yields codepoints; the substring
    decomposition must make both engines agree on emoji / astral CJK."""
    import duckdb as _d

    rows = [
        (1, "he\U0001F600llo \U0001F680\U0001F680"),   # emoji (non-BMP)
        (2, "\U00020000\U00020001 plain ascii"),        # CJK ext-B
        (3, "café ☃ bmp only"),
        (4, "\U0001F600"),                              # single astral char
    ]
    p = str(tmp_path / "documents.parquet")
    _d.sql(
        "COPY (SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)) TO '" + p + "' (FORMAT PARQUET)"
    )
    got = {r.doc_id: r for r in q_char_entropy(spark, str(tmp_path)).collect()}
    for doc_id, text in rows:
        c = collections.Counter(text)  # Python iterates codepoints
        n = sum(c.values())
        h = round(
            math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n, 6)
        r = got[doc_id]
        assert (r.n_chars, r.n_distinct) == (n, len(c)), (doc_id, r)
        assert abs(r.entropy - h) < 2e-6, (doc_id, r.entropy, h)
