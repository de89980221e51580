"""Structured Streaming parity: the streaming daily-counts plan must agree
with the batch aggregate on the same files (SURVEY.md §7.2 step 6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.streaming.daily_stream import (
    daily_window_counts,
    read_stream_auto,
    run_available_now,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "ts timestamp, v long").write.mode(
        "overwrite"
    ).parquet(path)


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    rows = [
        (dt.datetime(2024, 1, 1, 10), 1),
        (dt.datetime(2024, 1, 1, 23, 59, 59), 2),
        (dt.datetime(2024, 1, 2, 0, 0), 3),
        (None, 4),  # NULL event time: dropped, as in batch
    ]
    _write_events(spark, src, rows)
    agg = daily_window_counts(read_stream_auto(spark, src), ts_col="ts")
    run_available_now(agg, "t_stream_parity", str(tmp_path / "ckpt"))
    got = {
        r["transaction_date"]: r["total_transactions"]
        for r in spark.table("t_stream_parity").collect()
    }
    assert got == {dt.date(2024, 1, 1): 2, dt.date(2024, 1, 2): 1}


def test_stream_single_file_glob(spark, tmp_path):
    """read_stream_auto over a single FILE path (dir + pathGlobFilter);
    sibling files in the directory must not leak in."""
    import pandas as pd

    src = tmp_path / "dir"
    src.mkdir()
    pd.DataFrame({"ts": [pd.Timestamp("2024-01-01")], "v": [1]}).to_parquet(
        src / "a.parquet"
    )
    pd.DataFrame({"ts": [pd.Timestamp("2024-02-02")] * 5, "v": range(5)}).to_parquet(
        src / "b.parquet"
    )
    agg = daily_window_counts(
        read_stream_auto(spark, str(src / "a.parquet")), ts_col="ts"
    )
    run_available_now(agg, "t_stream_one", str(tmp_path / "ckpt2"))
    out = spark.table("t_stream_one").collect()
    assert len(out) == 1 and out[0]["transaction_date"] == dt.date(2024, 1, 1)
