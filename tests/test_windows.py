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
