"""Bucketed layout (sources/bucketed.py): the write-once-shuffle-never
contract — co-bucketed joins and bucket-key aggregations must plan with
zero exchanges."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


@contextlib.contextmanager
def _no_broadcast(spark):
    """Force shuffle-based join strategies so the test observes bucketing,
    not broadcast (tiny test tables would otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    from etl_platform_nyc_taxi_spark.sources.bucketed import write_bucketed

    o = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    l = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("line")
    )
    write_bucketed(o, "t_bkt_orders", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "o"))
    write_bucketed(l, "t_bkt_lines", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "l"))
    yield "t_bkt_orders", "t_bkt_lines"
    spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS t_bkt_lines")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    from etl_platform_nyc_taxi_spark.sources.bucketed import cobucketed_join

    lt, rt = bucketed_pair
    with _no_broadcast(spark):
        j = cobucketed_join(spark, lt, rt, on=["k"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 5000


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    lt, _ = bucketed_pair
    with _no_broadcast(spark):
        agg = spark.table(lt).groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 1000


def test_unbucketed_join_does_shuffle(spark, tmp_path):
    """Control: the same join without bucketing plans exchanges — proving
    the bucketed variant's zero-exchange plan comes from the layout."""
    o = spark.range(0, 1000).select(F.col("id").alias("k"))
    l = spark.range(0, 5000).select((F.col("id") % 1000).alias("k"))
    with _no_broadcast(spark):
        plan = o.join(l, "k")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan, plan


def test_bucketed_join_result_correct(spark, bucketed_pair):
    from etl_platform_nyc_taxi_spark.sources.bucketed import cobucketed_join

    lt, rt = bucketed_pair
    got = (
        cobucketed_join(spark, lt, rt, on=["k"])
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # every k in [0,1000) appears 5x in lines; groups are k%7
    expect = (
        spark.range(0, 1000)
        .select((F.col("id") % 7).alias("grp"))
        .groupBy("grp")
        .agg((F.count(F.lit(1)) * 5).alias("n"))
    )
    assert rows(got) == rows(expect)
