"""Local-rows source (SURVEY.md §2.1 S5).

The reference rebuilds a 1-row DataFrame from driver-side tuples to attach
an audit timestamp (reference:
dags/spark_jobs/calculate_daily_transactions.py:61-63). The engine avoids
collect-then-rebuild in pipelines (defect C2) but still exposes the
primitive for tests and tiny dimension tables.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def rows_source(
    spark: SparkSession,
    rows: Iterable[tuple],
    schema: T.StructType | Sequence[str],
) -> DataFrame:
    """Build a DataFrame from driver-local rows with an explicit schema.

    Driver-local by construction — use only for data that is small by
    definition (config rows, audit rows, test fixtures), never for anything
    that scales with input size.
    """
    return spark.createDataFrame(list(rows), schema)
