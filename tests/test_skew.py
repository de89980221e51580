"""Skew-adversarial checks for the salting operators (VERDICT r2 task 5).

A key holding ~half of all rows is the shape that melts a plain shuffle:
every matching row lands on ONE reduce task. These tests build exactly
that fixture and assert (a) the salted plans stay oracle-identical to the
plain plans, and (b) the skew is measurably split — the max rows any
reduce partition receives drops by ~the bucket factor. Partition-level
row counts through the real hash shuffle are the deterministic proxy for
max-task duration (timing on a busy local[4] is noise).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows

N_ROWS = 40_000
HOT_SHARE = 0.5
PARTS = 8
BUCKETS = 8


@pytest.fixture(scope="module")
def skewed_fact(spark):
    """40k rows; key 'hot' holds 50%, the rest spread over 500 keys."""
    n_hot = int(N_ROWS * HOT_SHARE)
    df = (
        spark.range(N_ROWS)
        .withColumn(
            "k",
            F.when(F.col("id") < n_hot, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 500).cast("string"))
            ),
        )
        .withColumn("v", (F.col("id") * 7 % 1000).cast("long"))
        .withColumnRenamed("id", "row_id")
    )
    df = df.cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def dim(spark):
    keys = [("hot", -1)] + [(f"k{i}", i) for i in range(500)]
    return spark.createDataFrame(keys, "k string, dim_val long")


def _max_partition_rows(df, n, *cols):
    """Max rows landing on one reduce task under hash partitioning on
    ``cols`` — the same assignment a shuffle join/agg on those keys uses."""
    dist = (
        df.repartition(n, *cols)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    return max(r["count"] for r in dist)


def test_salted_join_identical_under_skew(spark, skewed_fact, dim):
    from etl_platform_nyc_taxi_spark.operators.joins import salted_join

    plain = skewed_fact.join(dim, "k")
    salted = salted_join(
        skewed_fact, dim, key="k", salt_col="row_id", buckets=BUCKETS
    )
    assert sorted(salted.columns) == sorted(plain.columns)
    assert rows(salted.select(*plain.columns)) == rows(plain)


def test_salting_splits_the_hot_reduce_task(spark, skewed_fact):
    hot_rows = int(N_ROWS * HOT_SHARE)
    plain_max = _max_partition_rows(skewed_fact, PARTS, "k")
    # the hot key's whole row set funnels through one task
    assert plain_max >= hot_rows

    salted = skewed_fact.withColumn(
        "__salt", F.pmod(F.col("row_id"), F.lit(BUCKETS)).cast("int")
    )
    salted_max = _max_partition_rows(salted, PARTS * BUCKETS, "k", "__salt")
    # each (hot, salt) cell carries ~hot/BUCKETS rows; allow 2x slack for
    # hash collisions of cold keys into the same partition
    assert salted_max <= plain_max / (BUCKETS / 2)


def test_salted_aggregate_identical_under_skew(spark, skewed_fact):
    from etl_platform_nyc_taxi_spark.operators.core import salted_aggregate

    direct = skewed_fact.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("v").alias("sum_v"),
        F.max("v").alias("max_v"),
    )
    salted = salted_aggregate(
        skewed_fact,
        keys=["k"],
        aggs={
            "cnt": (F.count(F.lit(1)), F.sum("cnt")),
            "sum_v": (F.sum("v"), F.sum("sum_v")),
            "max_v": (F.max("v"), F.max("max_v")),
        },
        salt_buckets=BUCKETS,
    )
    assert rows(salted.select("k", "cnt", "sum_v", "max_v")) == rows(direct)
    # and the hot key really was split at the partial stage: its partial
    # groups each carry a fraction of the hot rows
    partial_max = (
        skewed_fact.withColumn(
            "__salt",
            (F.spark_partition_id() + F.monotonically_increasing_id())
            % BUCKETS,
        )
        .groupBy("k", "__salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert partial_max < int(N_ROWS * HOT_SHARE)


def test_salted_aggregate_identical_duplicate_hot_key_pre_count(spark):
    """VERDICT r7 task 5: a hot key of byte-identical duplicate rows
    defeats any deterministic content salt. pre_count=True collapses
    the duplicates first (the collapsing groupBy spreads by content),
    and weighted partials keep the result exactly equal to the direct
    aggregate."""
    from etl_platform_nyc_taxi_spark.operators.core import salted_aggregate

    rows_in = [("hot", 5)] * 10_000 + [(f"c{i}", i) for i in range(50)]
    df = spark.createDataFrame(rows_in, "k string, v int").repartition(8)
    direct = {
        r["k"]: (r["cnt"], r["sum_v"], r["max_v"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sum_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    got = {
        r["k"]: (r["cnt"], r["sum_v"], r["max_v"])
        for r in salted_aggregate(
            df,
            keys=["k"],
            aggs={
                "cnt": (F.sum("__mult"), F.sum("cnt")),
                "sum_v": (
                    F.sum(F.col("v") * F.col("__mult")),
                    F.sum("sum_v"),
                ),
                "max_v": (F.max("v"), F.max("max_v")),
            },
            salt_buckets=8,
            pre_count=True,
        ).collect()
    }
    assert got == direct
    assert got["hot"] == (10_000, 50_000, 5)


def test_salted_aggregate_excludes_map_columns_from_salt(spark):
    """ADVICE r7: F.hash raises AnalysisException on MapType — such
    columns must be excluded from the salt, not crash the aggregate."""
    from etl_platform_nyc_taxi_spark.operators.core import salted_aggregate

    df = spark.createDataFrame(
        [("a", 1, {"x": 1}), ("a", 2, {"y": 2}), ("b", 3, {"z": 3})],
        "k string, v int, m map<string,int>",
    )
    out = {
        r["k"]: r["sum_v"]
        for r in salted_aggregate(
            df,
            keys=["k"],
            aggs={"sum_v": (F.sum("v"), F.sum("sum_v"))},
            salt_buckets=4,
        ).collect()
    }
    assert out == {"a": 3, "b": 3}


def test_salted_aggregate_all_map_payload_raises(spark):
    import pytest

    from etl_platform_nyc_taxi_spark.operators.core import salted_aggregate

    df = spark.createDataFrame(
        [({"x": 1},), ({"y": 2},)], "m map<string,int>"
    )
    with pytest.raises(ValueError, match="MapType"):
        salted_aggregate(
            df,
            keys=["m"],
            aggs={"cnt": (F.count(F.lit(1)), F.sum("cnt"))},
        )


def test_salted_aggregate_pre_count_rejects_map_columns(spark):
    """pre_count collapses on full row content; MapType columns cannot
    be grouped by, and collapsing on a map-free subset would silently
    merge rows that differ only in map content — must refuse loudly."""
    import pytest

    from etl_platform_nyc_taxi_spark.operators.core import salted_aggregate

    df = spark.createDataFrame(
        [("a", 1, {"x": 1}), ("a", 1, {"y": 2})],
        "k string, v int, m map<string,int>",
    )
    with pytest.raises(ValueError, match="pre_count"):
        salted_aggregate(
            df,
            keys=["k"],
            aggs={"n": (F.sum("__mult"), F.sum("n"))},
            pre_count=True,
        )


def test_salted_aggregate_key_only_salt_entropy_raises(spark):
    """ADVICE r8: when every NON-KEY payload column contains a MapType,
    the hashable salt columns collapse to the keys alone — hash(keys)
    is constant per key, so the hot key would land in one bucket and
    the skew mitigation would silently be a no-op. Must refuse loudly
    (results would be correct, which is exactly why silence is the
    hazard)."""
    import pytest

    from etl_platform_nyc_taxi_spark.operators.core import salted_aggregate

    df = spark.createDataFrame(
        [("a", {"x": 1}), ("a", {"y": 2}), ("b", {"z": 3})],
        "k string, m map<string,int>",
    )
    with pytest.raises(ValueError, match="no-op"):
        salted_aggregate(
            df,
            keys=["k"],
            aggs={"cnt": (F.count(F.lit(1)), F.sum("cnt"))},
        )


def test_salted_aggregate_keys_only_map_free_passes(spark):
    """ADVICE r9: a map-free projection whose only columns ARE the
    grouping keys must NOT trip the entropy guard — no map column was
    excluded, the constant-per-key salt is a documented no-op, and the
    result is correct. (pre_count=True remains the tool when such a
    key is hot.)"""
    from etl_platform_nyc_taxi_spark.operators.core import salted_aggregate

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    got = {
        r["k"]: r["cnt"]
        for r in salted_aggregate(
            df,
            keys=["k"],
            aggs={"cnt": (F.count(F.lit(1)), F.sum("cnt"))},
        ).collect()
    }
    assert got == {"a": 2, "b": 1}
