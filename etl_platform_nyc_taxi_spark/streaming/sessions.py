"""Streaming sessionization: arbitrary stateful processing with
``applyInPandasWithState``.

The batch twin (operators/windows.sessionize) sorts each user's full
history — fine for bounded data, impossible on an unbounded stream. Here
each user carries a tiny piece of state (current session's start / last-seen
/ event count); a micro-batch extends or closes sessions, and an event-time
timeout flushes sessions whose gap elapsed with no new data. This is the
operator shape the reference's FileSensor-cadence pipeline (SURVEY.md §2.10)
would need for true incremental session analytics.

Scale posture: state is O(active users), partitioned by the group key
across executors (RocksDB state store in production); each micro-batch
touches only groups with new events plus timed-out groups. No per-user
history is ever re-read — the crucial difference from re-running the batch
sessionizer per day.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Closed-session rows (what downstream analytics consume).
OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "duration_s long, n_events long"
)

#: Per-user state: epoch-µs bounds of the open session + its event count.
STATE_SCHEMA = "start_us long, last_us long, n_events long"

_US = 1_000_000


def _make_session_fn(gap_seconds: int):
    """Build the per-group stateful function (closure over the gap).

    Semantics contract (code-review r7): identical to the batch twin
    (operators/windows.sessionize) on any event multiset —

    * the gap test compares FLOOR-SECOND epochs, exactly the batch
      twin's and the DuckDB oracle's ``floor(epoch(ts))`` arithmetic;
      comparing raw microseconds diverged at boundary gaps for
      sub-second timestamps (fixture events all carry µs);
    * the batch's open session and every new event enter ONE interval
      fold (sorted by start, merge when within gap, else close), so
      multiple late events that are mutually within the gap but each
      beyond the gap from the open session merge into one session the
      way a global sort would — per-event singleton emission split
      them;
    * timestamps convert via datetime64[us] (Spark's own unit), not a
      datetime64[ns] hop that raises OutOfBoundsDatetime for valid
      far-future/past µs values.
    """

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            closed.append((start_us, last_us, n))
            state.remove()
        else:
            items: list[list[int]] = []
            if state.exists:
                items.append(list(state.get))
            for pdf in pdfs:
                # dropna guards malformed rows the batch path also ignores
                s = pd.to_datetime(pdf["ts"]).dropna()
                items.extend(
                    [t, t, 1]
                    for t in (
                        int(v)
                        for v in s.astype("datetime64[us]").astype("int64")
                    )
                )
            items.sort(key=lambda it: (it[0], it[1]))
            cur: list[int] | None = None
            for it in items:
                if cur is None:
                    cur = list(it)
                elif it[0] // _US - cur[1] // _US > gap_seconds:
                    closed.append(tuple(cur))
                    cur = list(it)
                else:
                    cur[1] = max(cur[1], it[1])
                    cur[2] += it[2]
            if cur is not None:
                state.update(tuple(cur))
                # flush when watermark passes last event + gap (ms API)
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "duration_s": [e // _US - s // _US for s, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-sessionization: watermark → groupBy(user) →
    applyInPandasWithState with an event-time timeout.

    Emits one row per CLOSED session (append mode): a session closes when a
    later event for the same user arrives beyond the gap, or when the
    watermark passes session_end + gap. Sessions still open when the stream
    pauses stay in state — exactly the semantics an unbounded pipeline
    needs (they may yet continue).
    """
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import (
        ensure_event_time_ltz,
    )

    stream = ensure_event_time_ltz(stream, ts_col)
    prepared = (
        stream.filter(F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .withWatermark("ts", watermark)
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
