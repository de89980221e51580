"""operators/analytics.py: cohort retention, z-score outliers, gap-fill,
sweep-line concurrency, column profiling, Misra-Gries heavy hitters.

Oracles here are brute-force recomputations in plain Python over tiny
fixtures — independent of both Spark's plan and the registry's DuckDB
SQL (which the driver gate covers separately at sf0.01)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.analytics import (
    cohort_retention,
    gapfill_forward,
    group_zscore_outliers,
    heavy_hitters,
    profile_columns,
    sweep_max_concurrency,
)
from etl_platform_nyc_taxi_spark.sources.rows import rows_source
from tests.conftest import rows, ts


def test_cohort_retention_matrix(spark):
    # u1 first in week of Mon 2024-01-01; active weeks 0 and 2.
    # u2 first in week 0 too (different day), active week 0 only.
    # u3 first in week 1, active weeks 1 and 2 (offsets 0, 1).
    data = [
        (1, ts("2024-01-01 10:00:00")),
        (1, ts("2024-01-03 10:00:00")),  # same week, counted once
        (1, ts("2024-01-15 10:00:00")),
        (2, ts("2024-01-05 10:00:00")),
        (3, ts("2024-01-08 10:00:00")),
        (3, ts("2024-01-16 10:00:00")),
        (3, None),  # null ts ignored
    ]
    df = rows_source(spark, data, "user_id long, ts timestamp")
    out = rows(cohort_retention(df, "user_id", "ts"))
    w0 = dt.date(2024, 1, 1)
    w1 = dt.date(2024, 1, 8)
    assert out == sorted(
        [(w0, 0, 2), (w0, 2, 1), (w1, 0, 1), (w1, 1, 1)], key=repr
    )


def test_zscore_outliers_flags_the_planted_spike(spark):
    base = [(i, "a", 10.0) for i in range(40)]
    spike = [(99, "a", 1000.0)]
    small = [(200 + i, "b", float(i)) for i in range(5)]  # < min_group
    df = rows_source(
        spark, base + spike + small, "event_id long, grp string, v double"
    )
    out = group_zscore_outliers(
        df, ["grp"], "v", ["event_id"], threshold=3.0, min_group=30
    )
    got = rows(out.select("event_id", "zscore"))
    assert [r[0] for r in got] == [99]
    assert got[0][1] > 3.0


def test_zscore_constant_group_produces_no_rows(spark):
    df = rows_source(
        spark, [(i, "c", 5.0) for i in range(50)], "event_id long, grp string, v double"
    )
    out = group_zscore_outliers(df, ["grp"], "v", ["event_id"])
    assert out.count() == 0  # zero variance filtered, no div-by-zero NaNs


def test_gapfill_forward_fills_and_flags(spark):
    d0, d2, d4 = dt.date(2024, 3, 1), dt.date(2024, 3, 3), dt.date(2024, 3, 5)
    df = rows_source(
        spark,
        [("k", d0, 1.0), ("k", d2, 3.0), ("k", d4, 5.0), ("m", d2, 9.0)],
        "key string, day date, v double",
    )
    out = rows(gapfill_forward(df, ["key"], "day", "v"))
    expect = [
        ("k", dt.date(2024, 3, 1), 1.0, False),
        ("k", dt.date(2024, 3, 2), 1.0, True),
        ("k", dt.date(2024, 3, 3), 3.0, False),
        ("k", dt.date(2024, 3, 4), 3.0, True),
        ("k", dt.date(2024, 3, 5), 5.0, False),
        ("m", dt.date(2024, 3, 3), 9.0, False),
    ]
    assert out == sorted(expect, key=repr)


def _naive_max_concurrency(intervals):
    best = {}
    for day, s, e in intervals:
        peak = 0
        for t in [x[1] for x in intervals if x[0] == day]:
            # concurrency at each start instant (half-open intervals)
            c = sum(1 for d2, s2, e2 in intervals if d2 == day and s2 <= t < e2)
            peak = max(peak, c)
        best[day] = peak
    return best


def test_sweep_matches_naive_oracle(spark):
    rng = random.Random(7)
    day = dt.date(2024, 5, 1)
    ivs = []
    for i in range(200):
        start = dt.datetime(2024, 5, 1 + i % 2, rng.randrange(24), rng.randrange(60))
        ivs.append((start.date(), start, start + dt.timedelta(minutes=rng.randrange(1, 90))))
    df = rows_source(spark, ivs, "day date, s timestamp, e timestamp")
    got = dict(rows(sweep_max_concurrency(df, "s", "e", "day", "hour")))
    assert got == _naive_max_concurrency(ivs)
    assert day in got and got[day] >= 1


def test_sweep_half_open_touching_intervals_dont_overlap(spark):
    day = dt.date(2024, 5, 1)
    a = (day, ts("2024-05-01 10:00:00"), ts("2024-05-01 11:00:00"))
    b = (day, ts("2024-05-01 11:00:00"), ts("2024-05-01 12:00:00"))
    df = rows_source(spark, [a, b], "day date, s timestamp, e timestamp")
    assert rows(sweep_max_concurrency(df, "s", "e", "day")) == [(day, 1)]


def test_profile_columns_exact_counts_and_portable_repr(spark):
    df = rows_source(
        spark,
        [
            (1, "x", 1.5, ts("2024-01-01 06:30:00")),
            (2, "y", 10.25, ts("2024-02-01 00:00:00")),
            (3, None, None, None),
            (4, "x", 2.0, ts("2024-01-15 12:00:00")),
        ],
        "k long, s string, d double, t timestamp",
    )
    out = {
        r[0]: r[1:]
        for r in rows(
            profile_columns(
                df,
                [("k", "long"), ("s", "string"), ("d", "double"), ("t", "timestamp")],
            )
        )
    }
    assert out["k"] == (4, 0, 4, "1", "4")
    assert out["s"] == (4, 1, 2, "x", "y")
    assert out["d"] == (4, 1, 3, "1.50", "10.25")
    assert out["t"] == (4, 1, 3, "2024-01-01 06:30:00", "2024-02-01 00:00:00")


def test_heavy_hitters_exact_above_threshold(spark):
    # zipf-ish stream: token_i appears (50 - i) times
    stream = [(f"tok{i}",) for i in range(50) for _ in range(50 - i)]
    random.Random(3).shuffle(stream)
    df = rows_source(spark, stream, "token string").repartition(4)
    n = len(stream)
    t = 40  # exact answer: tok0..tok10 (counts 50..40)
    got = dict(rows(heavy_hitters(df, "token", n, t)))
    assert got == {f"tok{i}": 50 - i for i in range(11)}


def test_heavy_hitters_adversarial_uniform_tail(spark):
    # A heavy token hidden in a large uniform tail across partitions —
    # the distribution MG sketches find hardest.
    heavy = [("HH",)] * 120
    tail = [(f"t{i}",) for i in range(2000)]
    stream = heavy + tail
    random.Random(11).shuffle(stream)
    df = rows_source(spark, stream, "token string").repartition(8)
    got = dict(rows(heavy_hitters(df, "token", len(stream), 100)))
    assert got == {"HH": 120}


def test_heavy_hitters_capacity_guard():
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(None, "token", 10**9, 2, max_capacity=1000)


def test_sweep_plan_has_no_global_window(spark):
    """The sweep must never plan a single-partition window over the
    deltas — partitioning is (cohort, shard) then (cohort)."""
    day = dt.date(2024, 5, 1)
    df = rows_source(
        spark,
        [(day, ts("2024-05-01 10:00:00"), ts("2024-05-01 10:30:00"))],
        "day date, s timestamp, e timestamp",
    )
    import re

    plan = (
        sweep_max_concurrency(df, "s", "e", "day")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:  # every window is partitioned by at least the cohort
        assert "day#" in spec, plan


def test_profile_columns_hostile_column_names(spark):
    """Profiled names are literals, never parsed SQL — spaces, quotes,
    and dots in column names must work."""
    df = spark.createDataFrame(
        [(1, 2.0), (2, None)], ["my col's", "dotted.name"]
    ).selectExpr("`my col's`", "`dotted.name`")
    out = {
        r[0]: (r[2], r[3])
        for r in rows(
            profile_columns(df, [("my col's", "long"), ("dotted.name", "double")])
        )
    }
    assert out == {"my col's": (0, 2), "dotted.name": (1, 1)}


# ---------------------------------------------------------------------------
# Round 5: transition_matrix, winsorized_mean, mad_outliers
# ---------------------------------------------------------------------------


def test_transition_matrix_counts_and_probs(spark):
    from etl_platform_nyc_taxi_spark.operators.analytics import transition_matrix

    # u1: a -> b -> a ; u2: a -> b ; u3 singleton (no transitions).
    data = [
        (1, ts("2024-01-01 00:00:01"), "a"),
        (1, ts("2024-01-01 00:00:02"), "b"),
        (1, ts("2024-01-01 00:00:03"), "a"),
        (2, ts("2024-01-01 00:00:01"), "a"),
        (2, ts("2024-01-01 00:00:02"), "b"),
        (3, ts("2024-01-01 00:00:01"), "c"),
    ]
    df = rows_source(spark, data, "user_id long, ts timestamp, event_type string")
    out = {
        (r["src_type"], r["dst_type"]): (r["cnt"], r["p"])
        for r in transition_matrix(
            df, "user_id", "event_type", ["ts"]
        ).collect()
    }
    assert out == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_transition_matrix_probs_sum_to_one_per_src(spark):
    from etl_platform_nyc_taxi_spark.operators.analytics import transition_matrix

    random.seed(7)
    data = [
        (u, ts("2024-01-01 00:00:00") + dt.timedelta(seconds=i), random.choice("abcd"))
        for u in range(20)
        for i in range(15)
    ]
    df = rows_source(spark, data, "user_id long, ts timestamp, event_type string")
    out = transition_matrix(df, "user_id", "event_type", ["ts"]).collect()
    by_src: dict[str, float] = {}
    for r in out:
        by_src[r["src_type"]] = by_src.get(r["src_type"], 0.0) + r["p"]
    assert by_src and all(abs(v - 1.0) < 1e-9 for v in by_src.values())


def test_winsorized_mean_clips_outlier(spark):
    from etl_platform_nyc_taxi_spark.operators.analytics import winsorized_mean

    # Group g: values 1..19 plus one 1000 outlier. n=20:
    # lo rank ceil(.05*20)=1 -> 1.0; hi rank ceil(.95*20)=19 -> 19.0.
    vals = [float(v) for v in range(1, 20)] + [1000.0]
    data = [("g", i + 1, v) for i, v in enumerate(vals)]
    df = rows_source(spark, data, "k string, id long, v double")
    [r] = winsorized_mean(df, "k", "v", "id", 0.05, 0.95).collect()
    assert (r["pri"], r["n_rows"], r["lo"], r["hi"]) == ("g", 20, 1.0, 19.0)
    # clipped mean: (1..19 sum=190, outlier clipped to 19) / 20
    assert r["winsorized_mean"] == pytest.approx((190 + 19) / 20)


def test_mad_outliers_flags_extremes_not_constant_groups(spark):
    from etl_platform_nyc_taxi_spark.operators.analytics import mad_outliers

    data = (
        # g: tight cluster around 10 with one wild value.
        [("g", i, 10.0 + (i % 3) - 1) for i in range(1, 30)]
        + [("g", 99, 500.0)]
        # c: constant group -> MAD 0 -> excluded entirely.
        + [("c", i, 5.0) for i in range(100, 140)]
    )
    df = rows_source(spark, data, "k string, id long, v double")
    out = mad_outliers(df, "k", "v", "id", k=3.0).collect()
    assert [(r["k"], r["id"], r["v"]) for r in out] == [("g", 99, 500.0)]
    [r] = out
    assert r["med"] == 10.0 and r["mad"] == 1.0


def test_pareto_frontier_query_matches_naive_dominance(spark):
    """The sort-sweep skyline must equal the O(n²) dominance definition
    (strict frontier: coincident duplicate points keep first-by-sort)."""
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    out = QUERIES["pareto_frontier"](spark, "/root/testdata/sf0.001")
    got = {
        (r["pri"], r["o_orderkey"]) for r in out.collect()
    }
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderpriority", "o_orderkey", "o_totalprice", "o_orderdate"
    ).collect()
    by_pri: dict[str, list] = {}
    for r in orders:
        by_pri.setdefault(r["o_orderpriority"], []).append(r)
    expect = set()
    for pri, rs in by_pri.items():
        # sort-sweep reference implementation (same strict-frontier
        # tiebreak): keep iff date < min date of all earlier-sorted rows
        rs.sort(key=lambda r: (-r["o_totalprice"], r["o_orderdate"]))
        best = None
        for r in rs:
            if best is None or r["o_orderdate"] < best:
                expect.add((pri, r["o_orderkey"]))
            if best is None or r["o_orderdate"] < best:
                best = r["o_orderdate"]
        # every kept row must be undominated under the strict definition
        for r in rs:
            if (pri, r["o_orderkey"]) in expect:
                for o in rs:
                    dominates = (
                        o["o_totalprice"] >= r["o_totalprice"]
                        and o["o_orderdate"] <= r["o_orderdate"]
                        and (
                            o["o_totalprice"] > r["o_totalprice"]
                            or o["o_orderdate"] < r["o_orderdate"]
                        )
                    )
                    assert not dominates, (pri, r["o_orderkey"], o["o_orderkey"])
    assert got == expect


# ---------------------------------------------------------------------------
# activity islands / histogram / skew report (round-4 additions)
# ---------------------------------------------------------------------------


def test_activity_islands_basic(spark):
    from etl_platform_nyc_taxi_spark.operators.analytics import activity_islands

    rows_in = [
        # user 1: 3-day streak, gap, 2-day streak (dup events same day)
        (1, ts("2024-01-01 10:00:00")),
        (1, ts("2024-01-01 23:00:00")),
        (1, ts("2024-01-02 00:00:00")),
        (1, ts("2024-01-03 12:00:00")),
        (1, ts("2024-01-05 01:00:00")),
        (1, ts("2024-01-06 01:00:00")),
        # user 2: one day only; plus a NULL ts that must be ignored
        (2, ts("2024-02-01 00:00:00")),
        (2, None),
    ]
    df = spark.createDataFrame(rows_in, "user_id long, ts timestamp")
    out = {r["user_id"]: r for r in activity_islands(df, "user_id", "ts").collect()}
    assert out[1]["n_streaks"] == 2
    assert out[1]["longest_streak"] == 3
    assert out[1]["total_active_days"] == 5
    assert out[2]["n_streaks"] == 1
    assert out[2]["longest_streak"] == 1
    assert out[2]["total_active_days"] == 1


def test_fixed_width_histogram_edges(spark):
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.analytics import (
        fixed_width_histogram,
    )

    # values 0..100: 4 bins of width 25; max (100) must close into bin 3
    df = spark.range(0, 101).select(F.col("id").cast("double").alias("v"))
    out = {r["bin"]: r for r in fixed_width_histogram(df, "v", 4).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert [out[b]["n"] for b in (0, 1, 2, 3)] == [25, 25, 25, 26]
    assert out[0]["bin_lo"] == 0.0 and out[3]["bin_lo"] == 75.0


def test_fixed_width_histogram_counts_total(spark):
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.analytics import (
        fixed_width_histogram,
    )

    df = spark.range(0, 1000).select(((F.col("id") * 37) % 501).cast("double").alias("v"))
    out = fixed_width_histogram(df, "v", 16)
    assert out.agg(F.sum("n")).collect()[0][0] == 1000


def test_fixed_width_histogram_constant_column(spark):
    """ADVICE r4: lo == hi (zero-width step) must bin every row to bin 0
    — not NaN->null->silently-skipped-by-least into bin nbins-1."""
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.analytics import (
        fixed_width_histogram,
    )

    df = spark.range(0, 7).select(F.lit(42.0).alias("v"))
    rows = fixed_width_histogram(df, "v", 4).collect()
    assert len(rows) == 1
    assert rows[0]["bin"] == 0
    assert rows[0]["n"] == 7
    assert rows[0]["bin_lo"] == 42.0


def test_fixed_width_histogram_rejects_bad_nbins(spark):
    import pytest
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.analytics import (
        fixed_width_histogram,
    )

    df = spark.range(0, 10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        fixed_width_histogram(df, "v", 0)


def test_key_skew_report_detects_hot_key(spark):
    from etl_platform_nyc_taxi_spark.operators.analytics import key_skew_report

    rows_in = [("hot", i) for i in range(90)] + [
        (f"k{i}", i) for i in range(10)
    ]
    df = spark.createDataFrame(rows_in, "k string, v long")
    out = {r["key_col"]: r for r in key_skew_report(df, ["k"]).collect()}
    r = out["k"]
    assert r["n_keys"] == 11 and r["n_rows"] == 100 and r["max_rows"] == 90
    # mean rows/key = 100/11; skew = 90 / (100/11) = 9.9
    assert abs(r["skew_ratio"] - 9.9) < 1e-9


def test_key_skew_report_rejects_empty_cols(spark):
    import pytest

    from etl_platform_nyc_taxi_spark.operators.analytics import key_skew_report

    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError):
        key_skew_report(df, [])


def test_group_regression_stats_matches_numpy(spark):
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.analytics import (
        group_regression_stats,
    )

    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    ys = [2.1, 3.9, 6.2, 8.1, 9.8, 12.2]  # ~ y = 2x
    rows_in = [("g", x, y) for x, y in zip(xs, ys)] + [
        ("h", x, -2.0 * x + 50.0) for x in xs  # exact negative line
    ]
    df = spark.createDataFrame(rows_in, "grp string, x double, y double")
    out = {r["grp"]: r for r in group_regression_stats(df, "grp", "x", "y", scale=2).collect()}
    beta_np, icpt_np = np.polyfit(xs, ys, 1)
    corr_np = np.corrcoef(xs, ys)[0, 1]
    assert out["g"]["n"] == 6
    assert abs(out["g"]["beta"] - beta_np) < 1e-9
    assert abs(out["g"]["intercept"] - icpt_np) < 1e-9
    assert abs(out["g"]["corr"] - corr_np) < 1e-9
    assert abs(out["h"]["beta"] + 2.0) < 1e-9
    assert abs(out["h"]["intercept"] - 50.0) < 1e-9
    assert abs(out["h"]["corr"] + 1.0) < 1e-9


def test_abc_classification_boundaries(spark):
    """Hand-computable ABC split: revenues 80, 15, 5 -> one part per
    class at the 0.8 / 0.95 boundaries (<= keeps the boundary row in
    the better class)."""
    import etl_platform_nyc_taxi_spark.queries_registry as QR_

    df = spark.createDataFrame(
        [(1, 80.0), (2, 15.0), (3, 5.0)],
        "l_partkey long, l_extendedprice double",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="abc_")
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    out = {
        r["abc_class"]: (r["n_parts"], r["class_revenue"])
        for r in QR_.QUERIES["abc_classification"](spark, d).collect()
    }
    assert out == {"A": (1, 80.0), "B": (1, 15.0), "C": (1, 5.0)}


def _mk_day(s):
    return dt.date.fromisoformat(s)


def test_rolling_distinct_matches_bruteforce(spark):
    from etl_platform_nyc_taxi_spark.operators.analytics import rolling_distinct

    random.seed(7)
    data = [
        (random.randrange(12), _mk_day("2024-03-01") + dt.timedelta(days=random.randrange(15)))
        for _ in range(200)
    ]
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.IntegerType()),
            T.StructField("day", T.DateType()),
        ]
    )
    df = spark.createDataFrame(data, schema)
    got = {
        r["window_day"]: r["n"]
        for r in rolling_distinct(df, "user_id", "day", 7, out_col="n").collect()
    }
    days = sorted({d for _, d in data})
    for wd in days:
        expect = len(
            {u for u, d in data if wd - dt.timedelta(days=6) <= d <= wd}
        )
        assert got[wd] == expect, wd
    # only observed days are reported
    assert set(got) == set(days)


def test_binned_sketch_merge_equals_global(spark):
    """Mergeability: per-day sketches rolled up == sketch built in one
    pass over everything; quantile reads are exact lower bin bounds."""
    from etl_platform_nyc_taxi_spark.operators.analytics import (
        binned_sketch,
        sketch_quantiles,
    )
    import pyspark.sql.types as T

    random.seed(11)
    data = [
        ("g1", _mk_day("2024-01-01") + dt.timedelta(days=i % 9), random.uniform(0, 20))
        for i in range(300)
    ]
    schema = T.StructType(
        [
            T.StructField("grp", T.StringType()),
            T.StructField("day", T.DateType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(data, schema)
    daily = binned_sketch(df, "value", ["grp", "day"], scale=16)
    merged = rows(
        daily.groupBy("grp", "bin").agg(F.sum("cnt").alias("cnt"))
    )
    direct = rows(binned_sketch(df, "value", ["grp"], scale=16))
    assert merged == direct
    out = sketch_quantiles(daily, ["grp"], [0.5, 0.95], scale=16).collect()
    assert len(out) == 1
    row = out[0]
    vals = sorted(v for _, _, v in data)
    n = len(vals)
    assert row["n_events"] == n
    import math

    for q, col in ((0.5, "p50"), (0.95, "p95")):
        exact = vals[math.ceil(q * n) - 1]
        # sketch reports the lower edge of the bin holding the exact value
        assert row[col] == math.floor(exact * 16) / 16.0
        assert row[col] <= exact < row[col] + 1 / 16.0


def test_missing_ranges_matches_global_lead(spark):
    """Sharded gap detection must equal the global-lead answer for any
    id set, including gaps inside buckets, across bucket boundaries,
    and spanning entirely-empty buckets (bucket_size=8 forces all
    three)."""
    from etl_platform_nyc_taxi_spark.operators.analytics import missing_ranges

    random.seed(23)
    ids = sorted(random.sample(range(0, 400), 120))
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = sorted(
        (r["gap_start"], r["gap_end"])
        for r in missing_ranges(df, "id", bucket_size=8).collect()
    )
    want = [
        (a + 1, b - 1)
        for a, b in zip(ids, ids[1:])
        if b > a + 1
    ]
    assert got == want


def test_winsorized_mean_and_mad_exclude_nulls(spark):
    """Code-review r7: NULL values ranked first in the quantile windows
    and counted into n — corrupting bounds, medians, and the mean."""
    from etl_platform_nyc_taxi_spark.operators.analytics import (
        mad_outliers,
        winsorized_mean,
    )

    rows = [("g", float(i), i) for i in range(1, 21)] + [
        ("g", None, 100 + i) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "k string, v double, id int")
    wm = winsorized_mean(df, "k", "v", "id").first()
    assert wm["n_rows"] == 20  # nulls excluded from the count
    assert wm["lo"] == 1.0 and wm["hi"] == 19.0  # 5%/95% of 20 values
    # median over non-nulls is value at rank ceil(.5*20)=10 -> 10.0
    out = mad_outliers(df, "k", "v", "id", k=1.0)
    meds = {r["med"] for r in out.collect()}
    assert meds == {10.0} or meds == set()  # med from non-null ranks


def test_histogram_excludes_null_and_nan(spark):
    """Code-review r7: NULL/NaN values rode F.least's null-skipping into
    the TOP bin, inflating its count."""
    from etl_platform_nyc_taxi_spark.operators.analytics import (
        fixed_width_histogram,
    )

    rows = [(float(i),) for i in range(10)] + [(None,), (float("nan"),)]
    df = spark.createDataFrame(rows, "v double")
    hist = fixed_width_histogram(df, "v", nbins=3)
    assert hist.agg({"n": "sum"}).first()[0] == 10  # only real values
    top = hist.orderBy(F.col("bin").desc()).first()
    assert top["n"] <= 4  # not inflated by the 2 excluded rows


def test_regression_stats_null_on_zero_variance(spark):
    """Code-review r7: constant-x groups emitted NaN corr/beta/intercept
    (IEEE 0/0); they must come back NULL like the z-score variance
    gate's convention."""
    from etl_platform_nyc_taxi_spark.operators.analytics import (
        group_regression_stats,
    )

    df = spark.createDataFrame(
        [("c", 1.0, 2.0), ("c", 1.0, 3.0), ("ok", 1.0, 1.0), ("ok", 2.0, 2.0)],
        "g string, x double, y double",
    )
    rows = {r["g"]: r for r in group_regression_stats(df, "g", "x", "y").collect()}
    assert rows["c"]["beta"] is None and rows["c"]["corr"] is None
    assert rows["c"]["intercept"] is None
    assert abs(rows["ok"]["beta"] - 1.0) < 1e-9


def test_profile_columns_dtype_synonyms_and_errors(spark):
    """Code-review r7: df.dtypes spellings ('bigint') raised a bare
    KeyError; unknown kinds now raise a named ValueError."""
    import pytest

    from etl_platform_nyc_taxi_spark.operators.analytics import profile_columns

    df = spark.createDataFrame([(1, "a")], "n long, s string")
    out = profile_columns(df, df.dtypes)  # dtypes says 'bigint'
    assert {r["col_name"] for r in out.collect()} == {"n", "s"}
    with pytest.raises(ValueError, match="unsupported type"):
        profile_columns(df, [("n", "binary")])


# ---------------------------------------------------------------------------
# Count-min sketch + portable HLL
# ---------------------------------------------------------------------------


def _md5_48(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_cm_sketch_matches_python_and_one_sided(spark):
    from etl_platform_nyc_taxi_spark.operators.analytics import cm_sketch_audit

    data = [(f"t{i % 7}",) for i in range(100)] + [("rare",)]
    df = rows_source(spark, data, "tok string")
    w, d = 8, 3  # tiny width forces collisions
    out = {
        r["tok"]: (r["true_count"], r["cm_estimate"], r["overestimate"])
        for r in cm_sketch_audit(df, "tok", d=d, w=w, k_top=50).collect()
    }
    # python reimplementation
    import collections

    true = collections.Counter(t for t, in data)
    sketch = collections.Counter()
    for t, c in true.items():
        for j in range(1, d + 1):
            sketch[(j, _md5_48(f"cm{j}:{t}") % w)] += c
    for t, c in true.items():
        est = min(sketch[(j, _md5_48(f"cm{j}:{t}") % w)] for j in range(1, d + 1))
        assert out[t] == (c, est, est - c)
        assert est >= c  # one-sided error, always


def test_hll_portable_matches_python(spark):
    import hashlib
    import math

    from etl_platform_nyc_taxi_spark.operators.analytics import (
        hll_portable_estimate,
    )

    data = [("a", f"item{i}") for i in range(200)] + [
        ("b", f"item{i}") for i in range(150, 350)
    ]
    df = rows_source(spark, data, "grp string, it string")
    out = {
        r["grp"]: (r["true_distinct"], r["hll_estimate_milli"], r["err_ppm"])
        for r in hll_portable_estimate(df, "grp", "it").collect()
    }

    def py_hll(items):
        m = 64
        regs = [0] * m
        for it in set(items):
            h = int(hashlib.md5(it.encode()).hexdigest()[:12], 16)
            b, wv = h % m, h // m
            rho = 43 if wv == 0 else 43 - wv.bit_length()
            regs[b] = max(regs[b], rho)
        s = sum(2.0 ** -r for r in regs)
        v = regs.count(0)
        e = 0.709 * m * m / s
        if e <= 2.5 * m and v > 0:
            e = m * math.log(m / v)
        return math.floor(e * 1000 + 0.5)

    a_items = [it for g, it in data if g == "a"]
    b_items = [it for g, it in data if g == "b"]
    assert out["a"][0] == 200 and out["b"][0] == 200
    assert out["a"][1] == py_hll(a_items)
    assert out["b"][1] == py_hll(b_items)
    assert out["__ALL__"][0] == 350
    assert out["__ALL__"][1] == py_hll(a_items + b_items)  # register merge
    # sanity: estimates inside the m=64 error regime (~±25%)
    for g in ("a", "b", "__ALL__"):
        true_d, est_milli, _ = out[g]
        assert abs(est_milli / 1000 - true_d) / true_d < 0.25


def test_zipf_fit_recovers_known_slope(spark):
    """Synthesize an exact power law freq = 1000 * rank^-0.8 and check the
    fitted slope lands on -0.8 (quantization-tight tolerance)."""
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    # build a corpus whose per-source token counts follow the power law
    data = []
    doc = 0
    for rank in range(1, 21):
        c = max(int(round(1000 * rank ** -0.8)), 1)
        for _ in range(c):
            data.append((doc, f"t{rank:03d}", "z"))
            doc += 1
    docs = rows_source(
        spark, [(i, t, s) for i, (doc_id, t, s) in enumerate(data)],
        "doc_id long, text string, source string",
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        # provide the other fixture tables the loader may probe lazily —
        # zipf only reads documents, so the sf_dir just needs that file
        out = {r["source"]: r for r in QUERIES["zipf_token_fit"](spark, td).collect()}
    beta = out["z"]["beta"]
    assert abs(beta - (-0.8)) < 0.02, beta
    assert out["z"]["corr"] < -0.99


def test_markov_attribution_hand_computed(spark):
    """4-user chain solvable by hand: absorption probabilities, removal
    effects, exact shares, and post-conversion touch exclusion."""
    from datetime import datetime

    from etl_platform_nyc_taxi_spark.operators.analytics import (
        markov_removal_attribution,
    )

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: view -> click -> purchase
        (1, "view", t(0), 10), (1, "click", t(1), 11), (1, "purchase", t(2), 12),
        # u2: view -> purchase
        (2, "view", t(0), 20), (2, "purchase", t(1), 21),
        # u3: click, never converts
        (3, "click", t(0), 30),
        # u4: converts with no touches
        (4, "purchase", t(0), 40),
        # u5: converts first, later touch must be ignored
        (5, "purchase", t(0), 50), (5, "view", t(1), 51),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    out = {
        r["channel"]: r
        for r in markov_removal_attribution(
            ev, channels=("view", "click", "error")
        ).collect()
    }
    # chain with u5 = a second touchless conversion:
    # START: view 2, click 1, CONV 2 (n=5); view: click 1, CONV 1 (n=2);
    # click: CONV 1, NULLSTATE 1 (n=2)
    # p(click)=500000; p(view)=750000; p(START)=(1.5M+0.5M+2M)/5=800000
    assert out["view"]["p_full_micro"] == 800_000
    # remove view: START=(0.5M+2M)/5=500000 -> effect 300000
    assert out["view"]["p_removed_micro"] == 500_000
    assert out["view"]["removal_effect_micro"] == 300_000
    # remove click: p(view)=500000; START=(1M+2M)/5=600000 -> 200000
    assert out["click"]["removal_effect_micro"] == 200_000
    # absent channel: zero effect, zero share
    assert out["error"]["removal_effect_micro"] == 0
    # shares split 1e6 by exact integer division: 600000 / 400000 / 0
    assert out["view"]["share_micro"] == 600_000
    assert out["click"]["share_micro"] == 400_000
    assert out["error"]["share_micro"] == 0


def test_markov_attribution_all_journeys_start_with_one_channel(spark):
    """Knocking out the only entry channel must drop conversion to the
    touchless floor, not default to the full probability."""
    from datetime import datetime

    from etl_platform_nyc_taxi_spark.operators.analytics import (
        markov_removal_attribution,
    )

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, "click", t(0), 1), (1, "purchase", t(1), 2),
        (2, "click", t(0), 3),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    out = {
        r["channel"]: r
        for r in markov_removal_attribution(ev, channels=("click",)).collect()
    }
    # full: START -> click w.p. 1; click -> CONV w.p. 1/2 -> 500000
    assert out["click"]["p_full_micro"] == 500_000
    # removing click leaves START with no surviving edges: probability 0
    assert out["click"]["p_removed_micro"] == 0
    assert out["click"]["share_micro"] == 1_000_000


def test_km_survival_hand_computed_with_censoring(spark):
    """Classic KM: censored subjects stay in the risk set through their
    censoring bucket; the log-space curve matches an exact recompute."""
    import math
    from datetime import datetime, timedelta

    from etl_platform_nyc_taxi_spark.operators.analytics import km_survival

    t0 = datetime(2024, 1, 1)
    h = lambda x: t0 + timedelta(hours=x)  # noqa: E731
    rows = [
        (1, "signup", t0, 1), (1, "purchase", h(1), 2),
        (2, "signup", t0, 3), (2, "purchase", h(2), 4),
        (3, "signup", t0, 5), (3, "view", h(1.5), 6),      # censored b1
        (4, "signup", t0, 7), (4, "view", h(3), 8),        # censored b3
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    out = {r["dur_bucket"]: r for r in km_survival(ev).collect()}
    assert set(out) == {1, 2}                 # event buckets only
    b1, b2 = out[1], out[2]
    assert (b1["n_risk"], b1["n_events"], b1["n_censored"]) == (4, 1, 1)
    assert (b2["n_risk"], b2["n_events"], b2["n_censored"]) == (2, 1, 0)
    l1 = math.floor(math.log(3 / 4) * 1e6)
    l2 = math.floor(math.log(1 / 2) * 1e6)
    assert b1["log_surv_micro"] == l1
    assert b2["log_surv_micro"] == l1 + l2
    assert b1["surv_ppm"] == math.floor(math.exp(l1 / 1e6) * 1e6 + 0.5)
    assert b2["surv_ppm"] == math.floor(math.exp((l1 + l2) / 1e6) * 1e6 + 0.5)


def test_km_survival_zero_step_and_pre_entry_conversion(spark):
    """When every at-risk subject converts the curve hits exact zero
    (NULL log, surv 0); purchases BEFORE signup never convert."""
    from datetime import datetime, timedelta

    from etl_platform_nyc_taxi_spark.operators.analytics import km_survival

    t0 = datetime(2024, 1, 1)
    h = lambda x: t0 + timedelta(hours=x)  # noqa: E731
    rows = [
        (1, "signup", t0, 1), (1, "purchase", h(1), 2),
        (2, "signup", t0, 3), (2, "purchase", h(1), 4),
        # u3 purchased BEFORE signup: censored at its last event
        (3, "purchase", h(-2), 5), (3, "signup", t0, 6), (3, "view", h(0.5), 7),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    out = {r["dur_bucket"]: r for r in km_survival(ev).collect()}
    # u3 censored in bucket 0; bucket 1: risk 2, both convert
    assert set(out) == {1}
    b1 = out[1]
    assert (b1["n_risk"], b1["n_events"]) == (2, 2)
    assert b1["log_surv_micro"] is None and b1["surv_ppm"] == 0
