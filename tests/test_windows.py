"""Window/top-k semantics: dense_rank ties (the reference's exact tie
behavior, SURVEY §2.5), scale-safe top-k equivalence, running aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.windows import (
    ranked,
    running_agg,
    top_k_by_count,
    top_k_global,
    top_k_per_group,
)
from tests.conftest import rows


def test_dense_rank_ties_return_more_than_k(spark):
    # zones: a×3, b×3, c×2, d×1 → top-2 by dense_rank = {a,b,c} (3 rows)
    df = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 3 + [("c",)] * 2 + [("d",)],
        "zone string",
    )
    top = top_k_by_count(df, "zone", k=2)
    got = {(r["zone"], r["cnt"], r["rank"]) for r in top.collect()}
    assert got == {("a", 3, 1), ("b", 3, 1), ("c", 2, 2)}


def test_dense_rank_skips_no_ranks(spark):
    df = spark.createDataFrame([("a",)] * 3 + [("b",)] * 3 + [("c",)], "z string")
    r = top_k_by_count(df, "z", k=3)
    assert {x["rank"] for x in r.collect()} == {1, 2}  # dense: no gap after tie


def test_rank_vs_row_number_methods(spark):
    df = spark.createDataFrame([(10,), (10,), (5,)], "v int")
    dr = ranked(df, [F.col("v").desc()], method="rank").collect()
    assert sorted(r["rank"] for r in dr) == [1, 1, 3]  # rank skips
    rn = ranked(df, [F.col("v").desc()], method="row_number").collect()
    assert sorted(r["rank"] for r in rn) == [1, 2, 3]


def test_top_k_global_matches_sort_limit(spark):
    df = spark.range(0, 1000, 1, 8).withColumn("v", (F.col("id") * 37) % 500)
    got = sorted(
        (r["id"], r["v"]) for r in top_k_global(df, "v", k=10).collect()
    )
    want = sorted(
        (r["id"], r["v"])
        for r in df.orderBy(F.col("v").desc(), F.col("id").desc()).limit(10).collect()
    )
    assert [v for _, v in got] == [v for _, v in want]  # same value multiset


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", 1, 10.0), ("g1", 2, 20.0), ("g1", 3, 30.0), ("g2", 4, 5.0)],
        "g string, id int, v double",
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], k=2)
    assert {(r["g"], r["id"]) for r in out.collect()} == {("g1", 3), ("g1", 2), ("g2", 4)}


def test_running_sum(spark):
    df = spark.createDataFrame([("a", 1, 10), ("a", 2, 5), ("a", 3, 1)], "g string, t int, v int")
    out = running_agg(df, "v", ["g"], [F.col("t")], agg="sum", out="run")
    assert [r["run"] for r in out.orderBy("t").collect()] == [10, 15, 16]


# ---------------------------------------------------------------------------
# Funnel
# ---------------------------------------------------------------------------


def _funnel_dict(df):
    from etl_platform_nyc_taxi_spark.operators.windows import funnel_stages

    out = funnel_stages(df, "u", "ts", "et", ["a", "b", "c"])
    return {r["stage"]: r["n_users"] for r in out.collect()}


def test_funnel_strict_order(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows_ = [
        # u1 completes a -> b -> c in order
        (1, t(1), "a"), (1, t(2), "b"), (1, t(3), "c"),
        # u2 has b BEFORE its first a and no b after -> stops at a
        (2, t(5), "b"), (2, t(6), "a"), (2, t(7), "c"),
        # u3 never does a -> appears nowhere
        (3, t(1), "b"), (3, t(2), "c"),
    ]
    df = spark.createDataFrame(rows_, "u int, ts timestamp, et string")
    got = _funnel_dict(df)
    assert got == {"a": 2, "b": 1, "c": 1}


def test_funnel_same_timestamp_counts_as_after(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, "a"), (1, t0, "b"), (1, t0, "c")],
        "u int, ts timestamp, et string",
    )
    assert _funnel_dict(df) == {"a": 1, "b": 1, "c": 1}


def test_funnel_monotone_nonincreasing(spark):
    df = spark.range(0, 200).selectExpr(
        "id % 40 AS u",
        "timestamp(date_add(date'2024-01-01', CAST(id % 17 AS INT))) AS ts",
        "element_at(array('a','b','c','x'), CAST(id % 4 + 1 AS INT)) AS et",
    )
    got = _funnel_dict(df)
    assert got["a"] >= got["b"] >= got["c"]


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------


def test_scd2_collapses_runs_and_sets_intervals(spark):
    import datetime as dt

    from etl_platform_nyc_taxi_spark.operators.windows import scd2_intervals

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows_ = [
        (1, t(1), 1, "new"),
        (1, t(2), 2, "new"),       # same state -> collapsed into run 1
        (1, t(3), 3, "active"),
        (1, t(4), 4, "closed"),
        (2, t(1), 5, "active"),
    ]
    df = spark.createDataFrame(rows_, "u int, ts timestamp, eid int, st string")
    out = scd2_intervals(df, ["u"], "ts", "st", tiebreak=["eid"])
    got = {
        (r["u"], r["state"]): (r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert got[(1, "new")] == (t(1), t(3), False)
    assert got[(1, "active")] == (t(3), t(4), False)
    assert got[(1, "closed")] == (t(4), None, True)
    assert got[(2, "active")] == (t(1), None, True)
    # intervals tile: each valid_to equals the next run's valid_from
    assert len(got) == 4


def test_scd2_ts_tie_is_deterministic_by_tiebreak(spark):
    import datetime as dt

    from etl_platform_nyc_taxi_spark.operators.windows import scd2_intervals

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, 2, "b"), (1, t0, 1, "a")], "u int, ts timestamp, eid int, st string"
    )
    out = scd2_intervals(df, ["u"], "ts", "st", tiebreak=["eid"]).collect()
    by_state = {r["state"]: r for r in out}
    assert by_state["a"]["is_current"] is False  # eid 1 ordered first
    assert by_state["b"]["is_current"] is True


def test_scd2_null_first_state_gets_interval(spark):
    """Code-review r7: a key whose FIRST state is NULL must still get
    its initial interval (bare lag(state) conflated 'no previous row'
    with 'previous state was NULL')."""
    import datetime as dt

    from etl_platform_nyc_taxi_spark.operators.windows import scd2_intervals

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    df = spark.createDataFrame(
        [("A", t(1), None), ("A", t(5), "active")],
        "k string, ts timestamp, state string",
    )
    rows = sorted(
        scd2_intervals(df, ["k"], "ts", "state").collect(),
        key=lambda r: r["valid_from"],
    )
    assert len(rows) == 2
    assert rows[0]["state"] is None and rows[0]["valid_from"] == t(1)
    assert rows[0]["valid_to"] == t(5)
    assert rows[1]["state"] == "active" and rows[1]["is_current"]
    # all-NULL states: one open interval, not zero rows
    allnull = spark.createDataFrame(
        [("B", t(1), None), ("B", t(2), None)],
        "k string, ts timestamp, state string",
    )
    out = scd2_intervals(allnull, ["k"], "ts", "state").collect()
    assert len(out) == 1 and out[0]["is_current"]


def test_top_k_global_plans_take_ordered(spark):
    """Code-review r7: the single-window form must plan as
    TakeOrderedAndProject with no Exchange (the old two-phase __pid
    variant forced a hash exchange Catalyst could not elide)."""
    from etl_platform_nyc_taxi_spark.operators.windows import top_k_global

    df = spark.range(0, 10000, 1, 8).withColumnRenamed("id", "v")
    out = top_k_global(df, "v", 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert [r["v"] for r in out.collect()] == [9999, 9998, 9997, 9996, 9995]
