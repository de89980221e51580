"""Stream-stream interval join (SURVEY.md §2.10 extension).

Two unbounded fact streams joined on a key plus an event-time range —
the "click then purchase within an hour" shape. Unlike the stateless
stream-static enrichment (enrich.py), BOTH sides buffer rows in the
state store until the watermark proves no future match can arrive; the
time-bound join condition is what lets Spark evict state at all.

Scale notes (two 100 TB streams):
* **state is bounded by the interval, not the stream**: each side keeps
  only rows newer than ``watermark + interval`` — widen the interval and
  state grows linearly with it. An unbounded (equality-only) stream-
  stream join would buffer everything forever; this module requires the
  time bound.
* both watermarks matter: eviction uses the MIN of the two stream
  watermarks, so one stalled source holds state for both.
* the join itself shuffles both streams on the key per micro-batch —
  same hash partitioning as a batch join; skewed keys salt upstream
  exactly as in batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    ts: tuple[str, str],
    max_delay_seconds: int,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    ``[left_ts, left_ts + max_delay_seconds]``. Column names must be
    disjoint across the two sides (rename upstream). Event-time columns
    are cast to TIMESTAMP (session TZ is pinned UTC, so NTZ wall-clock
    values are preserved) and both sides are watermarked — required for
    state eviction."""
    lk, rk = key
    lt, rt = ts
    lw = left.withColumn(lt, F.col(lt).cast("timestamp")).withWatermark(
        lt, watermark
    )
    rw = right.withColumn(rt, F.col(rt).cast("timestamp")).withWatermark(
        rt, watermark
    )
    cond: Column = (
        (F.col(lk) == F.col(rk))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {max_delay_seconds} SECONDS"))
    )
    return lw.join(rw, cond, how)
