"""Streaming deduplication — the ingest-time twin of operators/dedup.

A training-data pipeline ideally dedups AT INGEST (each arriving batch
against everything already seen), not as a periodic batch rescan of the
whole corpus. Structured Streaming gives exactly that shape:

* :func:`fingerprint_dedup_stream` — first-seen doc per content
  fingerprint survives, duplicates drop as they arrive. State holds one
  32-byte key per distinct doc — unbounded over an unbounded stream, so
  this form is for bounded corpora / replays.
* :func:`fingerprint_dedup_stream_watermarked` — the unbounded-stream
  form: ``dropDuplicatesWithinWatermark`` evicts state once the watermark
  passes, bounding memory while still catching any duplicate that arrives
  within the lateness window (exact-once semantics for near-in-time dups —
  the common case: re-crawls, retry storms, producer replays).
* :func:`duplicate_groups_stream` — the audit aggregate (fingerprint,
  copies, min_doc_id), batch-equivalent under Trigger.AvailableNow, so it
  shares the batch dedup oracle verbatim.

State scales O(distinct keys in window), hash-partitioned across
executors (RocksDB state store in production) — same posture as
streaming/sessions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.text import fingerprint


def fingerprint_dedup_stream(
    stream: DataFrame, text_col: str = "text"
) -> DataFrame:
    """First-seen doc per normalized-text fingerprint (state: one key per
    distinct doc — bounded corpora / availableNow replays only; use the
    watermarked form on unbounded streams)."""
    return (
        stream.withColumn("__fp", fingerprint(text_col))
        .dropDuplicates(["__fp"])
        .drop("__fp")
    )


def fingerprint_dedup_stream_watermarked(
    stream: DataFrame,
    ts_col: str,
    text_col: str = "text",
    delay: str = "1 hour",
) -> DataFrame:
    """Unbounded-stream dedup: duplicates arriving within ``delay`` of the
    first copy are dropped; state evicts with the watermark (bounded
    memory). Event-time ops need TIMESTAMP (LTZ) — NTZ columns are cast
    (session TZ pinned UTC, values preserved)."""
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import (
        ensure_event_time_ltz,
    )

    stream = ensure_event_time_ltz(stream, ts_col)
    return (
        stream.withColumn("__fp", fingerprint(text_col))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def duplicate_groups_stream(
    stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming twin of ``operators.dedup.exact_duplicate_groups``:
    (fingerprint, copies, min_doc_id) for fingerprints seen >1 time.
    Complete-mode aggregate; under Trigger.AvailableNow the result equals
    the batch aggregate, so the DuckDB oracle is shared verbatim."""
    return (
        stream.select(fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("copies"), F.min(id_col).alias("min_doc_id"))
        .filter(F.col("copies") > 1)
    )
