"""SQL entry point: registered views + ``spark.sql`` queries.

The reference drives Spark exclusively through the DataFrame API (no SQL
string anywhere — SURVEY.md §3), but a complete engine exposes the
declarative surface too: the same Catalyst planner optimizes both, and SQL
is how ad-hoc users and BI tools reach the data. This module registers the
fixture tables as temp views once per (session, sf_dir) and runs ANSI SQL
against them.

Scale note: temp-view registration is pure metadata (no scan, no cache);
the physical plan of ``spark.sql(q)`` is identical to the equivalent
DataFrame chain, so everything said about pushdown/pruning/broadcast in
the operator modules applies unchanged here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

#: All driver fixture tables (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_REGISTERED: set[tuple[int, str]] = set()


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES
) -> None:
    """Register each fixture table as a temp view named after itself.

    Idempotent per (session, sf_dir); re-registering after switching
    ``sf_dir`` replaces the views (last registration wins, like a catalog
    ``USE``).
    """
    key = (id(spark), sf_dir)
    if key in _REGISTERED:
        return
    for t in tables:
        load_fixture(spark, sf_dir, t).createOrReplaceTempView(t)
    # Invalidate prior registrations of this session against other dirs.
    _REGISTERED.difference_update({k for k in _REGISTERED if k[0] == id(spark)})
    _REGISTERED.add(key)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL over the registered fixture views."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
