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


def daily_counts_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    ts_col: str = "pickup_datetime",
    watermark: str = "1 day",
) -> DataFrame:
    """Unbounded daily counts: file source → watermark → 1-day tumble.

    Returns the streaming DataFrame (caller picks the sink). Output columns
    match the batch pipeline: (transaction_date, total_transactions).
    """
    stream = spark.readStream.format("parquet").schema(schema).load(source_dir)
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
