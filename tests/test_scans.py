"""Non-associative ordered scans (operators/scans.py): the declared
applyInPandas exception. Parity vs pandas ewm / a hand-rolled fold, clamp
semantics, and the not-a-plain-cumsum distinction."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


def test_ewma_matches_pandas_ewm(spark):
    from etl_platform_nyc_taxi_spark.operators.scans import ewma_per_key

    rows = [
        (1, dt.datetime(2024, 1, 1, h), float(v))
        for h, v in enumerate([10, 20, 0, 5, 40, 40, 1])
    ] + [(2, dt.datetime(2024, 1, 1), 7.0)]
    out = ewma_per_key(_df(spark, rows), "user_id", ["ts"], "value", alpha=0.25)
    got = {
        (r.user_id, r.ts): r.ewma
        for r in out.collect()
    }
    s = pd.Series([10.0, 20, 0, 5, 40, 40, 1])
    want = s.ewm(alpha=0.25, adjust=False).mean().tolist()
    for i, w in enumerate(want):
        assert got[(1, dt.datetime(2024, 1, 1, i))] == pytest.approx(w, abs=1e-12)
    assert got[(2, dt.datetime(2024, 1, 1))] == 7.0


def test_ewma_rejects_bad_alpha(spark):
    from etl_platform_nyc_taxi_spark.operators.scans import ewma_per_key

    with pytest.raises(ValueError):
        ewma_per_key(_df(spark, []), "user_id", ["ts"], "value", alpha=0.0)


def test_capped_sum_differs_from_clamped_cumsum(spark):
    """The saturation point: +80 +80 -100 → capped path 0 (overflow LOST
    at step 2), while clamp-at-the-end cumsum would give 60. If these
    ever agree on this input, the operator degenerated to a window."""
    from etl_platform_nyc_taxi_spark.operators.scans import (
        capped_running_sum_per_key,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 80.0),
        (1, dt.datetime(2024, 1, 1, 1), 80.0),   # 160 → clamps to 100
        (1, dt.datetime(2024, 1, 1, 2), -100.0),  # 100-100 = 0
    ]
    out = capped_running_sum_per_key(
        _df(spark, rows), "user_id", ["ts"], "value", lo=0.0, hi=100.0
    )
    got = [r.balance for r in out.orderBy("ts").collect()]
    assert got == [80.0, 100.0, 0.0]
    naive_final = max(0.0, min(100.0, sum(r[2] for r in rows)))
    assert naive_final == 60.0 and got[-1] != naive_final


def test_capped_sum_rejects_bad_bounds(spark):
    from etl_platform_nyc_taxi_spark.operators.scans import (
        capped_running_sum_per_key,
    )

    with pytest.raises(ValueError):
        capped_running_sum_per_key(
            _df(spark, []), "user_id", ["ts"], "value", lo=5.0, hi=5.0
        )


def test_scan_is_partition_invariant(spark):
    """Repartitioning must not change any scan output (per-key fold is
    ordered by the sort inside the group, not arrival order)."""
    from etl_platform_nyc_taxi_spark.operators.scans import ewma_per_key

    rows = [
        (u, dt.datetime(2024, 1, 1, h), float((u * 7 + h * 13) % 50))
        for u in range(5)
        for h in range(20)
    ]
    df = _df(spark, rows)
    a = {
        (r.user_id, r.ts): r.ewma
        for r in ewma_per_key(df.repartition(1), "user_id", ["ts"], "value").collect()
    }
    b = {
        (r.user_id, r.ts): r.ewma
        for r in ewma_per_key(df.repartition(16), "user_id", ["ts"], "value").collect()
    }
    assert a == b


def test_scan_drops_null_values_and_null_order_keys(spark):
    """ADVICE r5: a null value would become NaN in pandas and poison the
    rest of that key's fold; null rows are dropped plan-side instead."""
    from etl_platform_nyc_taxi_spark.operators.scans import ewma_per_key

    rows = [
        (1, 1, 10.0),
        (1, 2, None),  # null value: dropped, does NOT poison step 3
        (1, None, 99.0),  # null order key: dropped
        (1, 3, 20.0),
    ]
    df = spark.createDataFrame(rows, "k int, o int, v double")
    out = ewma_per_key(df, "k", ["o"], "v", alpha=0.5)
    got = {r["o"]: r["ewma"] for r in out.collect()}
    assert got == {1: 10.0, 3: 15.0}  # 0.5*20 + 0.5*10; no NaN anywhere


def test_scan_drops_null_keys(spark):
    """VERDICT r12 item 4: null KEYS are dropped plan-side too. In the
    mapInPandas fold a null key is NaN in the numpy key array, and since
    NaN != NaN the fold would re-init on EVERY null-key row (the retired
    groupBy().applyInPandas shape folded them as one group) — so the
    contract pins null-key rows as DROPPED, same as null values/orders."""
    from etl_platform_nyc_taxi_spark.operators.scans import ewma_per_key

    rows = [
        (None, 1, 100.0),
        (None, 2, 200.0),
        (1, 1, 10.0),
        (1, 2, 20.0),
    ]
    df = spark.createDataFrame(rows, "k int, o int, v double")
    out = ewma_per_key(df, "k", ["o"], "v", alpha=0.5).collect()
    got = {(r["k"], r["o"]): r["ewma"] for r in out}
    assert got == {(1, 1): 10.0, (1, 2): 15.0}  # no null-key rows emitted
