"""Date-predicate expressions, written for parquet pushdown.

The reference filters on ``to_date(pickup_datetime) == d`` and
``to_date(...) <= d`` (reference:
dags/spark_jobs/calculate_daily_transactions.py:54-55,
dags/spark_jobs/calculate_top_taxi_zones.py:31). A function-wrapped column
defeats parquet row-group min/max pruning — the predicate only applies
post-scan (SURVEY.md §4). These helpers rewrite day predicates as raw
timestamp ranges so ``PushedFilters`` carries them into the scan; at 100 TB
that's the difference between reading one day and reading everything.

NULL semantics match the reference exactly: a NULL timestamp fails every
range predicate, so NULL-pickup rows silently drop (defect D3, documented).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts_type(df: DataFrame | None, ts_col: str | Column) -> T.DataType:
    """The column's own timestamp flavor (NTZ vs LTZ), so literals compare
    without an analyzer-inserted cast that would defeat pushdown. When
    ``ts_col`` is a Column, the type is resolved by selecting the
    expression against ``df`` — ignoring ``df`` for Column inputs
    silently defaulted NTZ columns to an LTZ literal, wrapping the
    column in a cast and dropping the predicate from PushedFilters
    (code-review r7: the exact pushdown regression this module exists
    to prevent)."""
    if df is not None:
        if isinstance(ts_col, str):
            return df.schema[ts_col].dataType
        return df.select(ts_col).schema[0].dataType
    return T.TimestampType()


def derive_date(ts_col: str | Column, out_name: str = "transaction_date") -> Column:
    """P1: timestamp → date projection (session TZ pinned to UTC by the
    engine, so deterministic — defect D4 fixed)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.to_date(c).alias(out_name)


def ts_on_date(
    ts_col: str | Column, day: dt.date | str, df: DataFrame | None = None
) -> Column:
    """P2 rewritten: ``to_date(ts) == day`` as ``day <= ts < day+1``.

    Sargable — both bounds reach the parquet scan as PushedFilters, so
    row-group stats prune everything outside the day. Pass ``df`` so the
    literal adopts the column's exact timestamp type.
    """
    day = dt.date.fromisoformat(day) if isinstance(day, str) else day
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    tstype = _ts_type(df, ts_col)
    lo = F.lit(day).cast(tstype)
    hi = F.lit(day + dt.timedelta(days=1)).cast(tstype)
    return (c >= lo) & (c < hi)


def ts_on_or_before(
    ts_col: str | Column, day: dt.date | str, df: DataFrame | None = None
) -> Column:
    """P3 rewritten: ``to_date(ts) <= day`` as ``ts < day+1`` (sargable)."""
    day = dt.date.fromisoformat(day) if isinstance(day, str) else day
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return c < F.lit(day + dt.timedelta(days=1)).cast(_ts_type(df, ts_col))
