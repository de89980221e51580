"""Streaming daily-counts: the reference's sensor-gated daily batch
(SURVEY.md §2.10, S9) re-expressed as Structured Streaming.

Reference behavior being subsumed: a FileSensor polls for the month's
parquet file, then a batch job recounts one day
(dags/daily_transactions_dag.py:58-65 + calculate_daily_transactions.py).
Streaming file source discovers new files continuously; a 1-day tumbling
window on event time aggregates; the watermark bounds state (late rows
beyond it are dropped — the batch reference simply never sees late data);
``foreachBatch`` applies the idempotent JDBC upsert so replays converge.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery



def ensure_event_time_ltz(stream, ts_col: str):
    """Cast an NTZ event-time column to TIMESTAMP (LTZ) for event-time
    ops (watermark/window/stateful timeouts require LTZ). The session TZ
    is pinned UTC, so the cast preserves wall-clock values and window
    boundaries match the batch/oracle path. Shared by every streaming
    module — the 2-line idiom used to be copy-pasted at four sites
    (code-review r7)."""
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def read_stream_auto(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Streaming parquet source tolerating TIMESTAMP(NANOS) columns — the
    streaming twin of ``sources.parquet.read_parquet_auto`` (file sources
    require an explicit schema; nanos columns surface as int64 under the
    legacy conf and are restored to µs timestamps in a projection).

    ``options`` pass through to the reader (e.g. ``maxFilesPerTrigger="1"``
    to bound micro-batch size / replay a directory file-by-file)."""
    from etl_platform_nyc_taxi_spark.sources.parquet import _restore_nanos_cols

    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if options:
        reader = reader.options(**options)
    probe_path = path
    # file-stream sources only accept directories: stream the parent dir
    # with a glob filter selecting just this file. Gate on isfile, NOT
    # "not isdir" — os.path.isdir is False for every remote URI
    # (s3a://, hdfs://), and the old test silently glob-filtered a
    # remote DIRECTORY down to zero files (code-review r7). Remote
    # single-FILE streaming stays unsupported (os.path can't split
    # URIs); remote directories — the actual production shape — work.
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    # same restore projection (shared helper) as read_parquet_auto
    return _restore_nanos_cols(df, probe_path)


def run_available_now(
    agg: DataFrame,
    sink_table: str,
    checkpoint_dir: str | None = None,
    output_mode: str = "complete",
) -> None:
    """One-shot streaming run: process every file currently in the source
    (Trigger.AvailableNow), land results in an in-memory sink table, stop.
    Batch-parity harness for streaming pipelines — the driver/oracle can
    then read ``spark.table(sink_table)`` like any batch result.

    With ``checkpoint_dir=None`` a temp checkpoint is created and deleted
    after the run terminates — one-shot runs don't resume, so keeping the
    checkpoint only leaks disk across repeated invocations in a long-lived
    session. Re-running with the same ``sink_table`` replaces the memory
    sink's temp view, so catalog entries don't accumulate either."""
    import shutil
    import tempfile

    owned = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix=f"ckpt_{sink_table}_")
    try:
        q = (
            agg.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if owned:
            shutil.rmtree(ckpt, ignore_errors=True)


def daily_window_counts(
    stream: DataFrame, ts_col: str, watermark: str = "1 day"
) -> DataFrame:
    """Watermark → 1-day tumbling window → count, on any streaming (or
    batch) DataFrame. Output columns match the batch pipeline:
    (transaction_date, total_transactions)."""
    stream = ensure_event_time_ltz(stream, ts_col)
    return (
        stream.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("total_transactions"))
        .select(
            F.to_date(F.col("w.start")).alias("transaction_date"),
            F.col("total_transactions"),
        )
    )


def windowed_key_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark → tumbling window → per-key count: the canonical
    streaming dashboard aggregate (trending items per hour). Output:
    (window_start, <key_col>, cnt). Ranking happens OUTSIDE the stream,
    on the emitted aggregate — a rank window inside a streaming query
    would force complete-mode materialization of all state, while the
    aggregate output is tiny (windows × keys) and ranks in one batch
    pass per refresh."""
    stream = ensure_event_time_ltz(stream, ts_col)
    return (
        stream.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), key_col, "cnt")
    )


def daily_counts_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    ts_col: str = "pickup_datetime",
    watermark: str = "1 day",
) -> DataFrame:
    """Unbounded daily counts: file source → watermark → 1-day tumble.

    Returns the streaming DataFrame (caller picks the sink)."""
    stream = spark.readStream.format("parquet").schema(schema).load(source_dir)
    return daily_window_counts(stream, ts_col, watermark)


def run_to_sink(
    agg: DataFrame,
    batch_writer: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    output_mode: str = "update",
) -> StreamingQuery:
    """Drive a streaming aggregate into an arbitrary sink via foreachBatch.

    ``batch_writer(df, epoch_id)`` should be idempotent (e.g.
    ``write_jdbc_upsert``) — foreachBatch offers at-least-once on retry, so
    exactly-once end-to-end comes from sink idempotence + checkpointing.
    """
    return (
        agg.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
        .start()
    )
