"""End-to-end ingestion-feed test — the reference's entry point B
(CSV/REST feed → normalize → gate → dual raw/legacy write) as one engine
call, including the fail-fast duplicate day."""

from __future__ import annotations

import pytest

from kusuma_metamorph_etl_spark.ingestion import FeedSpec, ingest_feed
from kusuma_metamorph_etl_spark.plans.quality import DuplicateKeyError
from kusuma_metamorph_etl_spark.sources.csv import read_csv


@pytest.fixture()
def feed_csv(spark, tmp_path):
    path = str(tmp_path / "feed")
    spark.createDataFrame(
        [(1, "a", 9.5), (2, "b", 3.25)],
        ["Sale Id", "product name", " Status "],
    ).toDF("Sale Id", "product name", " Status ").write.option(
        "header", "true"
    ).csv(path)
    return path


def test_ingest_feed_end_to_end(spark, tmp_path, feed_csv):
    source = read_csv(
        spark, feed_csv, schema="`Sale Id` long, `product name` string, ` Status ` double"
    )
    spec = FeedSpec(
        name="sales",
        target_columns=["SALE_ID", "PRODUCT_NAME", "STATUS"],
        primary_key=["SALE_ID"],
        raw_path=str(tmp_path / "raw"),
        legacy_path=str(tmp_path / "legacy"),
    )
    legacy = ingest_feed(source, spec, run_date="2024-06-01")
    assert legacy.columns == ["SALE_ID", "PRODUCT_NAME", "STATUS", "DAY_DT"]

    raw = spark.read.parquet(spec.raw_path)
    assert sorted(raw.columns) == ["PRODUCT_NAME", "SALE_ID", "STATUS"]
    assert raw.count() == 2
    history = spark.read.parquet(spec.legacy_path)
    assert history.count() == 2 and "DAY_DT" in history.columns


def test_dated_source_path_matches_reference_template():
    """`{base}/{YYYYMMDD}/{feed}_{YYYYMMDD}.csv` — the reference's per-day
    source layout (ingestion_task.py:222-227), date injectable."""
    import datetime as dt

    got = FeedSpec.dated_source_path("s3://lake/feeds", "sales", "2025-08-24")
    assert got == "s3://lake/feeds/20250824/sales_20250824.csv"
    # date object, trailing-slash base, and the instance-bound form agree
    spec = FeedSpec(
        name="sales",
        target_columns=["SALE_ID"],
        primary_key=["SALE_ID"],
        raw_path="unused",
        legacy_path="unused",
    )
    assert (
        spec.for_run_date("s3://lake/feeds/", dt.date(2025, 8, 24))
        == "s3://lake/feeds/20250824/sales_20250824.csv"
    )
    # None keeps the reference's run-today behavior
    today = dt.date.today().strftime("%Y%m%d")
    assert FeedSpec.dated_source_path("x", "f") == f"x/{today}/f_{today}.csv"


def test_ingest_feed_duplicate_pk_fails_before_write(spark, tmp_path):
    source = spark.createDataFrame([(1, "x"), (1, "y")], ["id", "v"])
    spec = FeedSpec(
        name="dupes",
        target_columns=["ID", "V"],
        primary_key=["ID"],
        raw_path=str(tmp_path / "raw"),
        legacy_path=str(tmp_path / "legacy"),
    )
    with pytest.raises(DuplicateKeyError):
        ingest_feed(source, spec, run_date="2024-06-01")
    # Gate fired before any write — neither sink exists.
    assert not (tmp_path / "raw").exists()
    assert not (tmp_path / "legacy").exists()
