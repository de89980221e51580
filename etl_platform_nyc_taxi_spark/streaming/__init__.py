"""Structured Streaming variants of the batch pipelines (SURVEY.md §2.10).

The reference has no streaming — its closest analog is the FileSensor-gated
daily micro-batch. ``daily_stream`` maps that pattern onto a real file
source + event-time window + watermark + foreachBatch upsert.
"""

from etl_platform_nyc_taxi_spark.streaming.daily_stream import daily_counts_stream

__all__ = ["daily_counts_stream"]
