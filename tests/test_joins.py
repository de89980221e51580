"""Join family: broadcast dim, semi/anti, range join, as-of join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.joins import (
    anti_join,
    asof_join,
    join_dim,
    range_join,
    semi_join,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_join_dim_broadcast_plan(spark):
    fact = spark.range(100).withColumn("k", F.col("id") % 5)
    dim = spark.createDataFrame([(i, f"n{i}") for i in range(5)], "k long, name string")
    out = join_dim(fact, dim, on="k")
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 100


def test_semi_anti_partition(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    right = spark.createDataFrame([(2,), (3,), (3,)], "k int")
    assert {r["k"] for r in semi_join(left, right, "k").collect()} == {2, 3}
    assert {r["k"] for r in anti_join(left, right, "k").collect()} == {1}
    # semi never duplicates on multi-match
    assert semi_join(left, right, "k").count() == 2


def test_range_join(spark):
    probe = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 25.0)], "id int, v double")
    intervals = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 20.0), ("wide", 0.0, 30.0)],
        "name string, lo double, hi double",
    )
    out = range_join(probe, intervals, "v", "lo", "hi", bucket_width=10.0)
    got = {(r["id"], r["name"]) for r in out.collect()}
    assert got == {(1, "low"), (1, "wide"), (2, "mid"), (2, "wide"), (3, "wide")}


def test_asof_join_backward(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:00:00"), 10.0), ("A", _ts("2024-01-01 10:00:00"), 11.0),
         ("B", _ts("2024-01-01 09:30:00"), 99.0)],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:30:00")), ("A", _ts("2024-01-01 10:00:00")),
         ("B", _ts("2024-01-01 09:00:00"))],
        "sym string, tts timestamp",
    )
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts")
    got = {(r["sym"], r["tts"].isoformat(), r["px"]) for r in out.collect()}
    assert got == {
        ("A", "2024-01-01T09:30:00", 10.0),
        ("A", "2024-01-01T10:00:00", 11.0),  # equal ts matches (backward incl.)
        ("B", "2024-01-01T09:00:00", None),  # no quote yet → NULL
    }


def test_asof_join_forward(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:00"), 11.0)], "sym string, qts timestamp, px double"
    )
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:00:00")), ("A", _ts("2024-01-01 11:00:00"))],
        "sym string, tts timestamp",
    )
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts", direction="forward")
    got = {(r["tts"].hour, r["px"]) for r in out.collect()}
    assert got == {(9, 11.0), (11, None)}


def test_asof_join_tolerance(spark):
    """merge_asof-style tolerance: a nearest match farther than the bound
    nulls out (payload AND matched-ts together), near matches survive."""
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:00:00"), 10.0),
         ("B", _ts("2024-01-01 06:00:00"), 99.0)],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:30:00")),   # 30 min after quote: keep
         ("B", _ts("2024-01-01 09:30:00"))],  # 3.5 h after quote: too far
        "sym string, tts timestamp",
    )
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        tolerance_seconds=3600,
    )
    got = {(r["sym"], r["px"], r["qts_matched"]) for r in out.collect()}
    assert got == {
        ("A", 10.0, _ts("2024-01-01 09:00:00")),
        ("B", None, None),
    }


def test_salted_join_equals_plain_join(spark):
    from etl_platform_nyc_taxi_spark.operators.joins import salted_join

    fact = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "row_id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k long, name string"
    )
    salted = salted_join(fact, dim, key="k", salt_col="row_id", buckets=4)
    plain = fact.join(dim, "k")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    assert "__salt" not in salted.columns


def test_salted_join_left_keeps_unmatched(spark):
    from etl_platform_nyc_taxi_spark.operators.joins import salted_join

    fact = spark.createDataFrame([(1, 10), (2, 99)], "row_id long, k long")
    dim = spark.createDataFrame([(10, "x")], "k long, name string")
    out = salted_join(fact, dim, key="k", salt_col="row_id", buckets=3, how="left")
    got = {r["k"]: r["name"] for r in out.collect()}
    assert got == {10: "x", 99: None}


def test_latest_per_key_deterministic_tiebreak(spark):
    import datetime as dt

    from etl_platform_nyc_taxi_spark.operators.joins import latest_per_key

    t = dt.datetime(2024, 1, 1, 12)
    df = spark.createDataFrame(
        [
            (1, 100, t, "old"),
            (2, 100, t, "tie-higher-id-wins"),  # same ts: event_id breaks tie
            (3, 200, dt.datetime(2024, 1, 2), "newest"),
            (4, 200, dt.datetime(2024, 1, 1), "older"),
        ],
        "event_id long, user_id long, ts timestamp, tag string",
    )
    out = {
        r["user_id"]: r["tag"]
        for r in latest_per_key(
            df, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
        ).collect()
    }
    assert out == {100: "tie-higher-id-wins", 200: "newest"}
    hist = latest_per_key(
        df, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()], keep=2
    )
    assert hist.count() == 4


def test_salted_join_rejects_outer_variants(spark):
    # ADVICE r2: the dim side is replicated buckets-fold, so right/full
    # outer would emit each unmatched dim row `buckets` times — rejected.
    import pytest

    from etl_platform_nyc_taxi_spark.operators.joins import salted_join

    fact = spark.createDataFrame([(1, "a", 7)], "row_id long, k string, v long")
    dim = spark.createDataFrame([("a", 1), ("b", 2)], "k string, d long")
    for how in ("right", "full", "outer", "full_outer", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(fact, dim, key="k", salt_col="row_id", buckets=4, how=how)


# ---------------------------------------------------------------------------
# MERGE INTO (merge_changes)
# ---------------------------------------------------------------------------


def test_merge_changes_applies_insert_update_delete(spark):
    from etl_platform_nyc_taxi_spark.operators.joins import merge_changes

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    changes = spark.createDataFrame(
        [
            (2, "U", "b2", 25.0),   # update
            (3, "D", "c", 30.0),    # delete
            (4, "I", "d", 40.0),    # insert
        ],
        "k long, op string, name string, v double",
    )
    out = merge_changes(base, changes, key_cols=["k"], broadcast_keys=True)
    got = {(r["k"], r["name"], r["v"]) for r in out.collect()}
    assert got == {(1, "a", 10.0), (2, "b2", 25.0), (4, "d", 40.0)}


def test_merge_changes_base_side_never_shuffles_with_broadcast(spark):
    from etl_platform_nyc_taxi_spark.operators.joins import merge_changes

    base = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 2
    )
    changes = spark.createDataFrame([(5, "D", 0)], "k long, op string, v long")
    out = merge_changes(base, changes, key_cols=["k"], broadcast_keys=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the anti-join must be broadcast (no exchange feeding the base side)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert out.count() == 999


def test_merge_changes_idempotent_on_replay(spark):
    from etl_platform_nyc_taxi_spark.operators.joins import merge_changes

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    changes = spark.createDataFrame([(2, "U", 21.0)], "k long, op string, v double")
    once = merge_changes(base, changes, ["k"])
    twice = merge_changes(once, changes, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_asof_join_matched_row_is_atomic(spark):
    """Code-review r7: a matched right row with a NULL payload column
    must NOT inherit that column from an OLDER right row (per-column
    ignorenulls fill built frankenrows belonging to no real record)."""
    import datetime as dt

    from etl_platform_nyc_taxi_spark.operators.joins import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    quotes = spark.createDataFrame(
        [("A", t(1), 5.0, 6.0), ("A", t(2), None, 7.0)],
        "sym string, qts timestamp, bid double, ask double",
    )
    trades = spark.createDataFrame(
        [("A", t(3))], "sym string, tts timestamp"
    )
    row = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts").first()
    assert row["qts_matched"] == t(2)
    assert row["ask"] == 7.0
    assert row["bid"] is None  # NOT 5.0 from the older quote


def test_asof_join_rejects_payload_name_collision(spark):
    import datetime as dt

    import pytest

    from etl_platform_nyc_taxi_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("A", t0, 1.0)], "sym string, tts timestamp, price double"
    )
    right = spark.createDataFrame(
        [("A", t0, 2.0)], "sym string, qts timestamp, price double"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["sym"], left_ts="tts", right_ts="qts")


def test_merge_changes_null_op_upserts_not_deletes(spark):
    """Code-review r7: a NULL/dirty op must act as an upsert — the key
    is already evicted by the anti-join, so filtering it out of the
    union made a dirty op an unintended DELETE."""
    from etl_platform_nyc_taxi_spark.operators.joins import merge_changes

    base = spark.createDataFrame([(7, "old"), (8, "keep")], "k int, v string")
    changes = spark.createDataFrame(
        [(7, "new", None), (8, "gone", "D")], "k int, v string, op string"
    )
    got = {(r["k"], r["v"]) for r in merge_changes(base, changes, ["k"]).collect()}
    assert got == {(7, "new")}  # 7 upserted despite NULL op; 8 deleted


def test_salted_join_null_salt_still_matches(spark):
    """Code-review r7: pmod(NULL) is NULL and matched no dim salt, so a
    fact row with a NULL salt column silently vanished from the inner
    join — breaking the equals-unsalted-join contract."""
    from etl_platform_nyc_taxi_spark.operators.joins import salted_join

    fact = spark.createDataFrame(
        [("z1", 10), ("z1", None)], "k string, row_id int"
    )
    dim = spark.createDataFrame([("z1", "Zone One")], "k string, name string")
    got = salted_join(fact, dim, key="k", salt_col="row_id", buckets=4)
    assert got.count() == 2  # both fact rows match, NULL salt included
