"""Bucketed table layout: pre-shuffled storage for repeated co-located joins.

The reference re-reads flat monthly files for every query (SURVEY.md §4
"partition pruning: none"). At 100 TB the dominant cost of a fact-fact join
is the shuffle of both sides; bucketing pays that shuffle ONCE at write
time — each side is hash-distributed into N buckets by the join key, and
every later join/aggregation on that key runs with ZERO exchanges
(Catalyst recognizes the matching ``HashPartitioning`` from the bucket
spec).

When to bucket (engineering judgment, not free):
* the key is joined/grouped repeatedly (fact-fact joins every day);
* bucket count ~ cluster parallelism at the data's steady-state size —
  too few buckets caps parallelism, too many makes small files;
* add ``sortBy`` on the key so sort-merge joins skip their sorts too.
One-off joins should rely on AQE + plain shuffles instead.

Bucketing composes with hive partitioning (partition prune → bucket-local
join): ``partitionBy("date").bucketBy(N, "key")``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    partition_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted / hive-partitioned) table.

    Bucket metadata lives in the session catalog — readers must use
    ``spark.table(table)``, not a raw path read, or the bucket spec (and
    the shuffle elimination) is lost.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucket spec (output partitioning)."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket count:
    plans with no Exchange on either side (verify with
    ``assert_no_shuffle_join`` in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
