"""CSV / JSON (lines) / ORC connectors.

The reference supports exactly parquet-in, JDBC-out (SURVEY.md §2.1:
"no CSV/JSON/ORC/Kafka anywhere in the repo"). A complete engine needs the
interchange formats raw data actually arrives in; these wrappers
standardize the scale-relevant choices:

* **Always pass an explicit schema in production.** CSV/JSON inference
  costs a full extra pass over the data (unlike parquet's footer-only
  probe) — at 100 TB that is a second 100 TB scan. ``infer_schema=True``
  exists for exploration only.
* **Malformed-row policy is explicit.** PERMISSIVE (default) nulls bad
  fields and captures the raw line in ``_corrupt_record`` for quarantine;
  DROPMALFORMED silently discards; FAILFAST aborts. A training-data
  pipeline wants PERMISSIVE + quarantine, never silent drops.
* **Text formats are for interchange, not analytics.** No column pruning,
  no predicate pushdown, whole-row parse per record. ``ingest_to_parquet``
  is the one-hop conversion to a pruned/pushdown-friendly layout
  (optionally partitioned — see sources/parquet.write_partitioned).
* ORC keeps parquet-class columnar benefits (pushdown, pruning) and is
  read/written by the same vectorized machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
    infer_schema: bool = False,
    **options: str,
) -> DataFrame:
    """CSV scan. With ``mode='PERMISSIVE'`` and a schema that includes
    ``_corrupt_record string``, malformed lines land there for quarantine."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", mode)
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite",
    compression: str = "gzip",
) -> None:
    """CSV sink (one file per partition; compressed by default — text
    formats are bandwidth-bound, and gzip-per-part still parallelizes the
    read by file)."""
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("compression", compression)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    mode: str = "PERMISSIVE",
    multiline: bool = False,
    **options: str,
) -> DataFrame:
    """JSON-lines scan (``multiline=True`` for whole-file documents — that
    variant can't split within a file, so keep files small)."""
    reader = spark.read.option("mode", mode).option(
        "multiLine", str(multiline).lower()
    )
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_json(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "gzip"
) -> None:
    """JSON-lines sink."""
    df.write.mode(mode).option("compression", compression).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan — columnar, supports pushdown/pruning like parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink."""
    df.write.mode(mode).orc(path)


def quarantine_split(
    df: DataFrame, materialize: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantined) by
    ``_corrupt_record`` — the quarantine side keeps the raw line for
    replay/inspection; the clean side drops the column entirely.

    Spark refuses queries that prune a raw JSON/CSV scan down to only the
    corrupt column (SPARK-23271): a count/select on the bad side straight
    off the file scan throws ``QUERY_ONLY_CORRUPT_RECORD_COLUMN``.

    Cache contract: ``materialize=True`` caches a DataFrame this function
    owns and returns no handle to, so the cached batch pins executor
    memory until the session ends — acceptable only for short-lived jobs
    on daily-increment-sized batches. Long-lived sessions should manage
    the cache themselves and leave ``materialize`` False::

        df = raw.cache()
        clean, bad = quarantine_split(df)
        ...                     # consume both sides
        df.unpersist()

    For a full 100 TB backfill, land the parse output to parquet once
    (``ingest_to_parquet``) and split from there instead — one pass, no
    cache pressure.
    """
    from pyspark.sql import functions as F

    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    if materialize:
        df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def ingest_to_parquet(
    df: DataFrame,
    dest: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """One-hop conversion of an interchange-format scan to the analytics
    layout: parquet, optionally hive-partitioned so later queries get
    partition pruning (SURVEY.md §4's fix for the reference's
    scan-everything defect)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest)
