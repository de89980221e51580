"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's daily-transactions
analytics transposed onto the driver fixtures). ``queries()`` registers one
callable per implemented operator from SURVEY.md §2 (+ §7 extensions);
``oracle_sql()`` pairs each with DuckDB-runnable ANSI SQL over the same
parquet tables. Column names/types are aligned on both sides so the
driver's order-insensitive value-hash compares cleanly; double-typed
aggregates are computed in exact DECIMAL arithmetic first and cast to
DOUBLE at the end so both engines emit bit-identical values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark import queries_registry as QR


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-day transaction counts over sf0.001 events (the
    reference's daily-transactions semantics, corrected per SURVEY §2.9)."""
    return QR.q_daily_transactions(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return QR.QUERIES


def oracle_sql() -> dict[str, str]:
    return QR.ORACLE_SQL
