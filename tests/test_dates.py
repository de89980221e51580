"""Date-predicate rewrites: equivalence to the reference's to_date filters
(incl. midnight boundaries and NULL drop — SURVEY defect D3) and
pushdown-friendliness of the plans."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.functions.dates import (
    derive_date,
    ts_on_date,
    ts_on_or_before,
)
from tests.conftest import rows


def test_ts_on_date_matches_to_date_semantics(trips):
    day = dt.date(2024, 1, 1)
    rewritten = trips.filter(ts_on_date("pickup_datetime", day, df=trips))
    naive = trips.filter(F.to_date("pickup_datetime") == F.lit(day))
    assert rows(rewritten) == rows(naive)
    assert rewritten.count() == 2  # midnight + 23:59:59 inclusive


def test_ts_on_date_accepts_iso_string(trips):
    assert trips.filter(ts_on_date("pickup_datetime", "2024-01-02", df=trips)).count() == 2


def test_ts_on_or_before_matches_to_date_semantics(trips):
    day = dt.date(2024, 1, 4)
    rewritten = trips.filter(ts_on_or_before("pickup_datetime", day, df=trips))
    naive = trips.filter(F.to_date("pickup_datetime") <= F.lit(day))
    assert rows(rewritten) == rows(naive)
    assert rewritten.count() == 7  # whole of Jan 4 included, NULLs dropped


def test_null_timestamps_drop_silently(trips):
    # D3 parity: NULL pickup fails every predicate form.
    assert trips.filter(ts_on_date("pickup_datetime", "2024-01-01", df=trips)).filter(
        F.col("PULocationID") == 9
    ).count() == 0


def test_derive_date(trips):
    d = trips.select(derive_date("pickup_datetime", "d")).filter(F.col("d").isNull())
    assert d.count() == 2  # the two NULL rows survive projection as NULL dates


def test_day_filter_is_pushed_to_parquet_scan(spark, tmp_path):
    # The rewrite must reach the scan as PushedFilters; to_date(col) == d
    # would not. This is the 100 TB difference (SURVEY.md §4).
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 5), 1)], "ts timestamp, v long"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    plan = (
        df.filter(ts_on_date("ts", "2024-01-01", df=df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan
