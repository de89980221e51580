"""Tests for the SQL surface, sessionization, pivot, percentiles, approx
aggregates, and the TPC-H-style multi-join plans (queries_registry.py
additions; oracle-differential coverage is in tools/verify_local.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows, ts

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


@pytest.fixture
def clickstream(spark):
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    schema = "user_id long, ts timestamp, event_id long"
    data = [
        # user 1: 3 events inside one 30-min-gap session, then a 31-min gap
        (1, ts("2024-01-01 10:00:00"), 1),
        (1, ts("2024-01-01 10:29:00"), 2),
        (1, ts("2024-01-01 10:59:00"), 3),  # 30:00 gap exactly -> SAME session
        (1, ts("2024-01-01 11:30:01"), 4),  # 31:01 gap -> new session
        # user 2: single event
        (2, ts("2024-01-01 09:00:00"), 5),
        # user 3: two events with identical ts (tie-break on event_id)
        (3, ts("2024-01-01 08:00:00"), 7),
        (3, ts("2024-01-01 08:00:00"), 6),
    ]
    return rows_source(spark, data, schema)


def test_sessionize_gap_boundaries(clickstream):
    from etl_platform_nyc_taxi_spark.operators.windows import sessionize

    out = sessionize(
        clickstream, "user_id", "ts", gap_seconds=1800, tiebreak=["event_id"]
    )
    got = {r.event_id: r.session_seq for r in out.collect()}
    # gap == gap_seconds stays in-session; only strictly-greater splits
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 2
    assert got[5] == 1
    assert got[6] == 1 and got[7] == 1


def test_session_stats_aggregates(clickstream):
    from etl_platform_nyc_taxi_spark.operators.windows import session_stats

    out = session_stats(
        clickstream, "user_id", "ts", gap_seconds=1800, tiebreak=["event_id"]
    )
    by_key = {(r.user_id, r.session_seq): r for r in out.collect()}
    s11 = by_key[(1, 1)]
    assert s11.n_events == 3
    assert s11.duration_s == 59 * 60
    assert s11.session_start == ts("2024-01-01 10:00:00")
    assert s11.session_end == ts("2024-01-01 10:59:00")
    s12 = by_key[(1, 2)]
    assert s12.n_events == 1 and s12.duration_s == 0
    assert (3, 1) in by_key and by_key[(3, 1)].n_events == 2


def test_sessionize_single_shuffle_plan(clickstream):
    """Both window passes and the final group-by must reuse ONE hash
    partitioning on user_id — extra exchanges would be a scale bug."""
    from etl_platform_nyc_taxi_spark.operators.windows import session_stats

    plan = session_stats(clickstream, "user_id", "ts")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------------------------
# SQL surface
# ---------------------------------------------------------------------------


def test_register_tables_idempotent(spark):
    from etl_platform_nyc_taxi_spark.sql import register_tables, run_sql

    register_tables(spark, SF)
    register_tables(spark, SF)  # no-op second time
    n = run_sql(spark, SF, "SELECT COUNT(*) AS n FROM region").collect()[0].n
    assert n == 5


def test_sql_matches_dataframe_plan_results(spark):
    """The SQL surface and the DataFrame chain must agree exactly."""
    from etl_platform_nyc_taxi_spark.sql import run_sql
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    via_sql = run_sql(
        spark, SF, "SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag"
    )
    via_df = (
        load_fixture(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert rows(via_sql) == rows(via_df)


# ---------------------------------------------------------------------------
# multi-join plans: broadcast audit
# ---------------------------------------------------------------------------


def test_join_fact_fact_broadcasts_customer(spark):
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    plan = QUERIES["join_fact_fact"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_join_snowflake_no_cartesian(spark):
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    plan = QUERIES["join_snowflake"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


# ---------------------------------------------------------------------------
# pivot / explode / percentiles / approx
# ---------------------------------------------------------------------------


def test_pivot_zero_fills_missing_cells(spark):
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    df = rows_source(
        spark,
        [(ts("2024-01-01 10:00:00"), "click"), (ts("2024-01-01 11:00:00"), "view")],
        "ts timestamp, event_type string",
    )
    cats = ["click", "view", "purchase"]
    p = df.groupBy(F.to_date("ts").alias("d")).pivot("event_type", cats).agg(
        F.count(F.lit(1))
    )
    out = p.select(
        "d", *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in cats]
    ).collect()[0]
    assert (out.click, out.view, out.purchase) == (1, 1, 0)


def test_explode_tokens_multiplicity(spark):
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source
    from etl_platform_nyc_taxi_spark.operators.text import tokens_ws

    df = rows_source(spark, [(1, "a b a")], "doc_id long, text string")
    out = df.select("doc_id", F.explode(tokens_ws("text")).alias("token")).collect()
    assert sorted(r.token for r in out) == ["a", "a", "b"]


def test_percentile_exact_interpolation(spark):
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    df = rows_source(spark, [(float(v),) for v in (1, 2, 3, 4)], "v double")
    got = df.agg(
        F.percentile("v", 0.5).alias("p50"), F.percentile("v", 0.25).alias("p25")
    ).collect()[0]
    assert got.p50 == 2.5  # PERCENTILE_CONT linear interpolation
    assert got.p25 == 1.75


def test_approx_aggregates_accuracy(spark):
    """agg_approx emits verdict booleans since r5 (full driver oracle) —
    pin that the verdicts hold AND that the raw sketches really sit on
    exact (independent recomputation, tighter than the query's own
    bounds), so the verdict columns can't go green on a broken sketch."""
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    out = {r.event_type: r for r in QUERIES["agg_approx"](spark, SF).collect()}
    e = load_fixture(spark, SF, "events")
    exact = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.percentile("value", 0.5).alias("p50"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for et, a in out.items():
        x = exact[et]
        assert a.cnt == x.cnt and a.exact_users == x.users, et
        assert a.hll_ok and a.p50_rank_ok and a.p90_rank_ok and a.p99_rank_ok, et
    # independent sketch-accuracy recomputation (the pre-r5 assertions)
    raw = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("ap50"),
        )
        .collect()
    }
    for et, a in raw.items():
        x = exact[et]
        assert abs(a.approx_users - x.users) <= max(3, 0.05 * x.users), et
        assert abs(a.ap50 - x.p50) <= max(0.01 * abs(x.p50), 1e-6), et


# ---------------------------------------------------------------------------
# grouping sets
# ---------------------------------------------------------------------------


def test_grouping_sets_marginals_match_separate_aggs(spark):
    from etl_platform_nyc_taxi_spark.sql import run_sql
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    gs = run_sql(
        spark,
        SF,
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
           FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""",
    )
    li = load_fixture(spark, SF, "lineitem")
    per_flag = {r.l_returnflag: r.cnt for r in li.groupBy("l_returnflag").count().withColumnRenamed("count", "cnt").collect()}
    got_flag = {
        r.l_returnflag: r.cnt for r in gs.collect() if r.l_linestatus is None
    }
    assert got_flag == per_flag


def test_sketch_rollup_estimate_within_bound(spark):
    """HLL weekly merge within 5% of exact distinct; the naive sum of
    daily distincts must be >= the merged estimate (double counting).
    Since r5 the query emits the verdicts + exact columns (full driver
    oracle); this test pins the verdicts AND recomputes the raw merged
    estimate independently so the booleans can't mask a broken sketch."""
    import etl_platform_nyc_taxi_spark.queries_registry as QR_

    sf = "/root/testdata/sf0.01"
    out = {r["week"]: r for r in QR_.QUERIES["sketch_rollup"](spark, sf).collect()}
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    e = load_fixture(spark, sf, "events").filter(F.col("ts").isNotNull())
    exact = {
        r["week"]: r["n"]
        for r in e.groupBy(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(out) == set(exact)
    for wk, r in out.items():
        assert r["exact_weekly_users"] == exact[wk]
        assert r["merge_err_ok"] and r["no_double_count_ok"], wk
    # independent raw-sketch recomputation (the pre-r5 assertions)
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.hll_sketch_agg(F.col("user_id").cast("string")).alias("sk"))
    weekly = (
        daily.groupBy(
            F.date_trunc("week", F.col("day")).cast("date").alias("week")
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged"),
            F.sum(F.hll_sketch_estimate("sk")).alias("sum_daily"),
        )
        .collect()
    )
    for r in weekly:
        assert abs(r["merged"] - exact[r["week"]]) / exact[r["week"]] < 0.05
        assert r["sum_daily"] >= r["merged"] - 1e-9
