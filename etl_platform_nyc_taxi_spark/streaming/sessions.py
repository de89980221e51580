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
    """Build the per-group stateful function (closure over the gap)."""
    gap_us = gap_seconds * _US

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
            cur = list(state.get) if state.exists else None
            ts_us: list[int] = []
            for pdf in pdfs:
                # pandas datetime64[us/ns] -> epoch µs (int64); dropna guards
                # malformed rows the batch path also ignores
                s = pd.to_datetime(pdf["ts"]).dropna()
                ts_us.extend(int(v) // 1000 for v in s.astype("datetime64[ns]").astype("int64"))
            for t in sorted(ts_us):
                if cur is None:
                    cur = [t, t, 1]
                elif t - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = [t, t, 1]
                elif cur[0] - t > gap_us:
                    # late-but-above-watermark event more than one gap BEFORE
                    # the open session's start (possible when watermark delay
                    # > gap): the batch twin, sorting globally, would emit it
                    # as its own session — do the same instead of merging
                    closed.append((t, t, 1))
                else:
                    # late-but-accepted events (above watermark, within the
                    # gap, possibly earlier than the open session's start —
                    # cross-micro-batch reordering) extend the session in
                    # BOTH directions, matching the batch twin's semantics
                    cur[0] = min(cur[0], t)
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
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
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        # event-time ops need LTZ; session TZ is pinned UTC so values hold
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
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
