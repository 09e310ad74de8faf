"""Reference-shaped API parity layer (api.py) + image/table long tables."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark import api
from pdf_extractor_spark.plans.pipeline import (
    extracted_images,
    extracted_tables,
    write_tables_csv,
)
from pdf_extractor_spark.schema import PAGES_INPUT_SCHEMA
from tests.gen_fixtures import GOLDEN_DIR, doc_key, fixture_rows


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(fixture_rows()), schema=PAGES_INPUT_SCHEMA
    ).repartition(8)


def test_extract_page_subset(spark, fixture_df):
    sub = api.extract(fixture_df, pages=[1, 2])
    assert sub.filter(~F.col("page_number").isin([1, 2])).count() == 0
    assert sub.count() > 0


def test_extract_text_only_matches_goldens(spark, fixture_df):
    got = {doc_key(r["url"]): r["text"] for r in
           api.extract_text_only(fixture_df).collect()}
    for p in GOLDEN_DIR.glob("*.txt"):
        assert got[p.stem] == p.read_bytes().decode("utf-8")


def test_images_min_size_filter_and_naming(spark, fixture_df):
    imgs = extracted_images(fixture_df).collect()
    assert imgs, "fixture corpus embeds PDF images"
    for r in imgs:
        assert r["width"] >= 50 and r["height"] >= 50  # OP-25 applied
        assert r["artifact_name"] == (
            f"page_{r['page_number']:04d}_image_{r['image_index']:03d}."
            f"{r['format']}"
        )
        assert r["size_bytes"] == len(r["payload"])
    # sub-50x50 images exist pre-filter and are dropped
    all_imgs = extracted_images(fixture_df, min_width=1, min_height=1).count()
    assert all_imgs > len(imgs)


def test_images_count_matches_goldens(spark, fixture_df):
    """Golden total_images counts the kernel's unfiltered inventory."""
    per_url = {
        r["url"]: r["n"]
        for r in extracted_images(fixture_df, min_width=1, min_height=1)
        .groupBy("url").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for url, n in per_url.items():
        g = json.loads((GOLDEN_DIR / f"{doc_key(url)}.json").read_text())
        assert n == g["total_images"]


def test_tables_cleaning_rules(spark, fixture_df):
    tables = extracted_tables(fixture_df)
    rows = tables.collect()
    assert rows, "fixture corpus contains HTML tables"
    for r in rows:
        assert r["n_rows"] == len(r["data"]) > 0
        assert r["n_cols"] == max(len(row) for row in r["data"])
        for row in r["data"]:
            assert any(c != "" for c in row)          # OP-28: no empty rows
            for c in row:
                assert c == c.strip()                  # OP-12
                assert "  " not in c                   # OP-14
                assert c is not None                   # OP-15


def test_detect_tables_counts(spark, fixture_df):
    det = {(r["url"], r["page_number"]): r["n_tables"]
           for r in api.detect_tables(fixture_df).collect()}
    # detection counts the RAW kernel inventory (pre-clean), like find_tables
    raw = {(r["url"], r["page_number"]): r["n"]
           for r in api.extract(fixture_df)
           .select("url", "page_number", F.size("tables").alias("n"))
           .filter(F.col("n") > 0).collect()}
    assert det == raw


def test_tables_csv_sink(spark, fixture_df, tmp_path):
    out = str(tmp_path / "tables_csv")
    write_tables_csv(extracted_tables(fixture_df), out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() > 0
    assert set(back.columns) == {
        "url", "page_number", "table_index", "row_index", "row_csv"
    }


def test_to_json_rows_roundtrip(spark, fixture_df):
    rows = api.to_json_rows(fixture_df).limit(5).collect()
    for r in rows:
        doc = json.loads(r["json"])
        assert doc["url"] == r["url"]
        assert "text" in doc and "total_chars" in doc


def test_analyze_shape(spark, fixture_df):
    a = api.analyze(fixture_df)
    assert set(a.columns) == {
        "url", "page_number", "text_length", "image_count", "table_count",
        "link_count", "block_count",
    }
    assert a.count() > 0
