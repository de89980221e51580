"""Declared query registry: Spark implementation + DuckDB oracle per operator.

Every operator family from SURVEY.md §2 (and each §7 extension) registers a
named query over the driver fixture tables plus the equivalent ANSI SQL for
the DuckDB oracle. Conventions that keep the driver's order-insensitive
value-hash comparison exact:

* every computed column is aliased identically on both sides;
* double aggregates are summed in exact DECIMAL arithmetic, cast to DOUBLE
  at the end — IEEE-identical in both engines regardless of row order
  (double summation order would not be);
* timestamp literals are cast to the column's own type (fixture timestamps
  are parquet NTZ); session TZ is pinned UTC on entry;
* ranking uses explicit deterministic tie-breaks (or dense_rank whose
  output is tie-stable by value).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.core import union_by_name
from etl_platform_nyc_taxi_spark.operators.joins import anti_join, join_dim
from etl_platform_nyc_taxi_spark.operators.windows import (
    ranked,
    running_agg,
    top_k_by_count,
    top_k_per_group,
)
from etl_platform_nyc_taxi_spark.plans.daily_transactions import (
    daily_counts,
    daily_transactions,
)
from etl_platform_nyc_taxi_spark.session import pin_session_confs
from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the
    registry, optionally with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = f"q_{name}"
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return wrapped

    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return load_fixture(spark, sf_dir, table)


def ts_lit(df: DataFrame, col: str, iso: str) -> Column:
    """Literal cast to the column's own (NTZ or LTZ) timestamp type so the
    comparison stays sargable and type-exact."""
    return F.lit(iso).cast(df.schema[col].dataType)


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent double sum: exact DECIMAL(18,s) accumulation, cast
    to DOUBLE at the end. Oracle mirror:
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Reference-parity queries (SURVEY.md §2.2-2.7)
# ---------------------------------------------------------------------------


@register(
    "daily_transactions",
    """
    SELECT CAST(ts AS DATE) AS transaction_date,
           COUNT(*) AS total_transactions
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY transaction_date
    """,
)
def q_daily_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (reference job 1, all-days form): P1 derive-date + A1
    group-count. Ref: calculate_daily_transactions.py:52-57."""
    return daily_counts(_t(spark, sf_dir, "events"), ts_col="ts")


@register(
    "daily_transactions_day",
    """
    SELECT DATE '2024-01-15' AS transaction_date,
           (SELECT COUNT(*) FROM events
             WHERE ts >= TIMESTAMP '2024-01-15'
               AND ts <  TIMESTAMP '2024-01-16') AS total_transactions
    """,
)
def q_daily_transactions_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-day count with zero-fill (defect C3 preserved): always exactly
    one row, even for an empty day. Audit column excluded here
    (current_timestamp is inherently non-reproducible)."""
    return daily_transactions(
        _t(spark, sf_dir, "events"), "2024-01-15", ts_col="ts", audit=False
    )


@register(
    "top5_zones",
    """
    SELECT taxi_zone_id, trip_count, "rank" FROM (
        SELECT l_suppkey AS taxi_zone_id,
               COUNT(*) AS trip_count,
               CAST(DENSE_RANK() OVER (ORDER BY COUNT(*) DESC) AS INT) AS "rank"
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY l_suppkey
    ) WHERE "rank" <= 5
    """,
)
def q_top5_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrected reference job 2 (defect D1 fixed): ONE global count per
    key then dense_rank ≤ 5, preserving tie semantics (>5 rows possible,
    no skipped ranks). Ref: calculate_top_taxi_zones.py:29-35."""
    li = _t(spark, sf_dir, "lineitem")
    top = top_k_by_count(
        li.filter(F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1999-01-01")),
        key="l_suppkey",
        k=5,
        count_name="trip_count",
        rank_name="rank",
    )
    return top.select(F.col("l_suppkey").alias("taxi_zone_id"), "trip_count", "rank")


@register(
    "scan_project",
    """
    SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
           c_mktsegment AS segment
    FROM customer
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 scan + P5 projection/rename (column-pruned parquet read)."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "filter_range",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND o_totalprice > 1000.0
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3: sargable conjunctive range predicates (pushed to parquet
    row-group stats — the engine's fix for the reference's
    ``to_date(col)``-wrapped filters, SURVEY.md §4)."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= ts_lit(o, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < ts_lit(o, "o_orderdate", "1997-01-01"))
        & (F.col("o_totalprice") > 1000.0)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "agg_family",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           COUNT(DISTINCT l_partkey) AS distinct_parts
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 extended to the full agg family (SURVEY.md §7.2 step 4):
    count/sum/avg/min/max/count-distinct, multi-key group-by. Double sums
    in exact decimal then cast — order-independent and oracle-identical."""
    li = _t(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        cnt.alias("cnt"),
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        (dsum("l_extendedprice") / cnt).alias("avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count_distinct(F.col("l_partkey")).alias("distinct_parts"),
    )


@register(
    "union_slices",
    """
    SELECT l_linestatus, COUNT(*) AS cnt
    FROM (
        SELECT l_linestatus FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
        UNION ALL
        SELECT l_linestatus FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY l_linestatus
    """,
)
def q_union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 bag union of two filtered slices (reference's multi-file union
    shape, calculate_top_taxi_zones.py:77-79) + aggregation AFTER the union
    — the re-aggregation the reference forgot (defect D1)."""
    li = _t(spark, sf_dir, "lineitem")
    early = li.filter(F.col("l_shipdate") < ts_lit(li, "l_shipdate", "1996-01-01"))
    late = li.filter(F.col("l_shipdate") >= ts_lit(li, "l_shipdate", "2000-01-01"))
    return (
        union_by_name(early.select("l_linestatus"), late.select("l_linestatus"))
        .groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (agg-family completion; shuffle on the pair key)."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Join family (SURVEY.md §2.3 extension — required by harness + extensions)
# ---------------------------------------------------------------------------


@register(
    "join_star_dims",
    """
    SELECT r.r_name AS region_name,
           COUNT(*) AS customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_join_star_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash dimension joins: fact → nation → region with both
    small sides broadcast (zero fact shuffle before the agg) — the zone-
    lookup enrichment the reference omitted (SURVEY.md §2.3)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_regionkey")
    )
    r = _t(spark, sf_dir, "region")
    joined = join_dim(
        join_dim(c, n, on=c.c_nationkey == n.n_nationkey),
        r,
        on=F.col("n_regionkey") == r.r_regionkey,
    )
    return joined.groupBy(F.col("r_name").alias("region_name")).agg(
        F.count(F.lit(1)).alias("customers"),
        dsum("c_acctbal").alias("total_acctbal"),
    )


@register(
    "join_anti",
    """
    SELECT c_mktsegment, COUNT(*) AS customers_without_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders, per segment.
    No row multiplication; probe side streams."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        anti_join(c, o, on="c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_without_orders"))
    )


@register(
    "join_semi",
    """
    SELECT c_mktsegment, COUNT(*) AS customers_with_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having ≥1 order, per segment."""
    from etl_platform_nyc_taxi_spark.operators.joins import semi_join

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        semi_join(c, o, on="c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_with_orders"))
    )


# ---------------------------------------------------------------------------
# Window family (SURVEY.md §2.5 W1 + completions)
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, "rank" FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS "rank"
        FROM orders
    ) WHERE "rank" <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned top-k (scale-safe window: shuffle on the group key, no
    global single-partition sort). Deterministic total order via the
    (price desc, key asc) tie-break."""
    return top_k_per_group(
        _t(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        ),
        group_by=["o_orderpriority"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )


@register(
    "window_running_sum",
    """
    SELECT d, cnt, SUM(cnt) OVER (ORDER BY d) AS running_total
    FROM (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events GROUP BY d)
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window aggregate over the (pre-aggregated, tiny) daily
    series — global window applied only post-aggregation, per the engine's
    scale rule for unpartitioned windows."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return running_agg(
        daily, "cnt", partition_by=[], order=[F.col("d").asc()], agg="sum", out="running_total"
    )


@register(
    "window_lag_lead",
    """
    SELECT user_id, d, cnt,
           LAG(cnt, 1) OVER (PARTITION BY user_id ORDER BY d) AS prev_cnt,
           LEAD(cnt, 1) OVER (PARTITION BY user_id ORDER BY d) AS next_cnt
    FROM (SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
          FROM events GROUP BY user_id, d)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user daily activity (partitioned, deterministic
    ordering on the aggregated series)."""
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("d").asc())
    return daily.withColumns(
        {
            "prev_cnt": F.lag("cnt", 1).over(w),
            "next_cnt": F.lead("cnt", 1).over(w),
        }
    )


# ---------------------------------------------------------------------------
# Scalar-function family (SURVEY.md §2.8 + completions)
# ---------------------------------------------------------------------------


@register(
    "scalar_functions",
    """
    SELECT event_id,
           CAST(ts AS DATE) AS event_date,
           UPPER(event_type) AS type_upper,
           LENGTH(event_type) AS type_len,
           CASE WHEN value >= 100.0 THEN 'high'
                WHEN value >= 10.0 THEN 'mid'
                ELSE 'low' END AS value_band,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS prop_k
    FROM events
    """,
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-expression vocabulary beyond the reference's {to_date, col,
    alias}: string ops, CASE WHEN, regex extraction over the JSON-ish
    ``props`` column — all JVM-side built-ins (no UDF)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_date("ts").alias("event_date"),
        F.upper("event_type").alias("type_upper"),
        F.length("event_type").alias("type_len"),
        F.when(F.col("value") >= 100.0, F.lit("high"))
        .when(F.col("value") >= 10.0, F.lit("mid"))
        .otherwise(F.lit("low"))
        .alias("value_band"),
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long").alias("prop_k"),
    )
