from __future__ import annotations

import datetime as dt
import sys

import pytest

sys.path.insert(0, "/root/repo")

from etl_platform_nyc_taxi_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def rows(df):
    """Order-insensitive row multiset as sorted tuples."""
    return sorted((tuple(r) for r in df.collect()), key=repr)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture
def trips(spark):
    """Tiny HVFHV-shaped fixture: 2 'monthly files' worth of trips with
    midnight boundaries, NULL pickups, and deliberate count ties
    (FIXTURES.md §A1 generation hints)."""
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    schema = "pickup_datetime timestamp, PULocationID long, month string"
    data = [
        # month 1: zone 1 ×3, zone 2 ×3 (tie), zone 3 ×1
        (ts("2024-01-01 00:00:00"), 1, "m1"),
        (ts("2024-01-01 23:59:59"), 1, "m1"),
        (ts("2024-01-02 00:00:00"), 1, "m1"),
        (ts("2024-01-02 12:00:00"), 2, "m1"),
        (ts("2024-01-03 12:00:00"), 2, "m1"),
        (ts("2024-01-04 12:00:00"), 2, "m1"),
        (ts("2024-01-04 13:00:00"), 3, "m1"),
        (None, 9, "m1"),
        # month 2: zone 5 ×2, zone 1 ×1
        (ts("2024-02-01 00:00:00"), 5, "m2"),
        (ts("2024-02-01 06:00:00"), 5, "m2"),
        (ts("2024-02-02 06:00:00"), 1, "m2"),
        (None, 9, "m2"),
    ]
    return rows_source(spark, data, schema)
