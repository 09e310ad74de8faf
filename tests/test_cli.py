"""CLI parity layer (reference main.py flags over api.py) on the fixture
corpus — in-process with the shared session so no second JVM spins up."""

import json
import random

import pytest

from pdf_extractor_spark.cli import main, parse_arguments
from pdf_extractor_spark.sources.synth import make_html, make_pdf


@pytest.fixture()
def doc_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    rng = random.Random(3)
    (d / "a.pdf").write_bytes(make_pdf(rng, 1, n_pages=3)[0])
    (d / "b.pdf").write_bytes(make_pdf(rng, 2, n_pages=2, dialect="modern")[0])
    (d / "c.html").write_bytes(make_html(rng, 3, "en"))
    return d


def test_cli_extract_writes_datasets(spark, tmp_path, doc_dir, capsys):
    out = tmp_path / "out"
    rc = main([str(doc_dir), "--output-dir", str(out),
               "--image-format", "webp"], spark=spark)
    assert rc == 0
    captured = capsys.readouterr().out
    assert "EXTRACTION COMPLETE" in captured
    assert "Documents processed: 3" in captured
    assert "Pages processed: 6" in captured  # 3 + 2 + 1
    docs = spark.read.parquet(str(out / "docs"))
    assert docs.count() == 3
    assert {r["kind"] for r in docs.select("kind").collect()} == {"pdf", "html"}
    imgs = spark.read.parquet(str(out / "images"))
    # --image-format override renames artifacts without crashing (the
    # reference's main.py:135 crashes on this flag)
    for r in imgs.select("artifact_name").collect():
        assert r["artifact_name"].endswith(".webp")
        # exactly one suffix swap: no doubled '.webp.webp' (zero-width
        # second regex match) and the stem survives
        assert not r["artifact_name"].endswith(".webp.webp")
        assert r["artifact_name"].startswith("page_")
    assert (out / "json").is_dir() and (out / "tables").is_dir()


def test_cli_analyze_prints_json(spark, doc_dir, capsys):
    rc = main([str(doc_dir), "--analyze"], spark=spark)
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 6
    assert {"url", "page_number", "text_length", "image_count",
            "table_count", "link_count", "block_count"} <= set(rows[0])


def test_cli_toggles_and_pages(spark, tmp_path, doc_dir):
    out = tmp_path / "out2"
    rc = main([str(doc_dir), "--output-dir", str(out), "--no-images",
               "--no-tables", "--no-json", "--no-text", "--pages", "1,2"],
              spark=spark)
    assert rc == 0
    assert not (out / "images").exists()
    assert not (out / "tables").exists()
    assert not (out / "json").exists()
    docs = spark.read.parquet(str(out / "docs"))
    assert "text" not in docs.columns


def test_cli_pages_filters_every_written_artifact(spark, tmp_path, doc_dir):
    """--pages must shape the OUTPUT datasets, not just the summary: the
    3-page PDF contributes only page 1, and the doc text is reassembled
    from the surviving pages alone."""
    import pyspark.sql.functions as F

    out = tmp_path / "out3"
    rc = main([str(doc_dir), "--output-dir", str(out), "--pages", "1"],
              spark=spark)
    assert rc == 0
    docs = spark.read.parquet(str(out / "docs"))
    assert {r["n_pages"] for r in docs.select("n_pages").collect()} == {1}
    pdf_text = docs.filter(F.col("kind") == "pdf").select("text").collect()
    for r in pdf_text:
        assert "=== Page 1 ===" in r["text"]
        assert "=== Page 2 ===" not in r["text"]
    imgs = spark.read.parquet(str(out / "images"))
    assert imgs.filter(F.col("page_number") != 1).count() == 0


def test_cli_bad_pages_and_missing_input(spark, tmp_path):
    assert main(["nonexistent-dir-xyz"], spark=spark) == 1
    assert main([str(tmp_path), "--pages", "1,x"], spark=spark) == 1


def test_cli_flag_surface_matches_reference():
    """Every reference main.py flag exists here (parity check by name)."""
    ns = parse_arguments(["in", "--output-dir", "o", "--pages", "1",
                          "--no-text", "--no-images", "--no-tables",
                          "--image-format", "png", "--min-image-size", "64",
                          "--analyze", "--verbose", "--no-json"])
    assert ns.min_image_size == 64 and ns.image_format == "png"
