"""Structured Streaming parity: the streaming daily-counts plan must agree
with the batch aggregate on the same files (SURVEY.md §7.2 step 6)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.streaming.daily_stream import (
    daily_window_counts,
    read_stream_auto,
    run_available_now,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "ts timestamp, v long").write.mode(
        "overwrite"
    ).parquet(path)


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    rows = [
        (dt.datetime(2024, 1, 1, 10), 1),
        (dt.datetime(2024, 1, 1, 23, 59, 59), 2),
        (dt.datetime(2024, 1, 2, 0, 0), 3),
        (None, 4),  # NULL event time: dropped, as in batch
    ]
    _write_events(spark, src, rows)
    agg = daily_window_counts(read_stream_auto(spark, src), ts_col="ts")
    run_available_now(agg, "t_stream_parity", str(tmp_path / "ckpt"))
    got = {
        r["transaction_date"]: r["total_transactions"]
        for r in spark.table("t_stream_parity").collect()
    }
    assert got == {dt.date(2024, 1, 1): 2, dt.date(2024, 1, 2): 1}


def test_stream_single_file_glob(spark, tmp_path):
    """read_stream_auto over a single FILE path (dir + pathGlobFilter);
    sibling files in the directory must not leak in."""
    import pandas as pd

    src = tmp_path / "dir"
    src.mkdir()
    pd.DataFrame({"ts": [pd.Timestamp("2024-01-01")], "v": [1]}).to_parquet(
        src / "a.parquet"
    )
    pd.DataFrame({"ts": [pd.Timestamp("2024-02-02")] * 5, "v": range(5)}).to_parquet(
        src / "b.parquet"
    )
    agg = daily_window_counts(
        read_stream_auto(spark, str(src / "a.parquet")), ts_col="ts"
    )
    run_available_now(agg, "t_stream_one", str(tmp_path / "ckpt2"))
    out = spark.table("t_stream_one").collect()
    assert len(out) == 1 and out[0]["transaction_date"] == dt.date(2024, 1, 1)


def test_streaming_sessionize_multibatch_matches_single(spark, tmp_path):
    """The same events replayed across 2+ micro-batches (one source file
    per trigger) must close the same sessions as the one-batch run — this
    exercises the cross-batch state path explicitly, including a late but
    above-watermark event that extends an open session BACKWARDS (it is
    earlier than the session's recorded start)."""
    import glob
    import os
    import shutil

    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto
    from etl_platform_nyc_taxi_spark.streaming.sessions import sessionize_stream

    f1 = [
        (1, dt.datetime(2024, 1, 1, 10, 10)),
        (1, dt.datetime(2024, 1, 1, 10, 20)),
        (2, dt.datetime(2024, 1, 1, 9, 0)),
    ]
    f2 = [
        (1, dt.datetime(2024, 1, 1, 10, 0)),  # late, in-gap, BEFORE start
        (1, dt.datetime(2024, 1, 1, 11, 30)),  # >gap after 10:20 → closes A
        (1, dt.datetime(2024, 1, 2, 12, 0)),  # >gap after 11:30 → closes B
        (2, dt.datetime(2024, 1, 1, 9, 5)),
    ]
    src = tmp_path / "sess_src"
    src.mkdir()
    for i, rows in enumerate([f1, f2]):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(str(stage))
        dest = src / f"f{i}.parquet"
        shutil.copy(glob.glob(str(stage / "part-*.parquet"))[0], dest)
        # file-stream source orders by modification time: pin the replay order
        os.utime(dest, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    def run(name, **opts):
        out = sessionize_stream(
            read_stream_auto(spark, str(src), **opts), gap_seconds=1800
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.user_id, r.session_start, r.session_end, r.duration_s, r.n_events)
            for r in spark.table(name).collect()
            if r.user_id == 1  # user 2's 9:05 event is sub-watermark in the
            # replay (legitimate streaming-vs-batch divergence); user 1's
            # rows must agree exactly
        }

    single = run("t_sess_single")
    multi = run("t_sess_multi", maxFilesPerTrigger="1")
    assert multi == single
    # pin the backwards extension: session A starts at the LATE 10:00 event
    a = {r for r in multi if r[4] == 3}
    assert a == {
        (
            1,
            dt.datetime(2024, 1, 1, 10, 0),
            dt.datetime(2024, 1, 1, 10, 20),
            1200,
            3,
        )
    }


def test_streaming_sessionize_closes_on_gap(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions followed by later
    same-user activity MUST be emitted as closed; each user's final session
    may stay open in state (it could still continue on a real stream)."""
    from etl_platform_nyc_taxi_spark.operators.windows import session_stats
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto
    from etl_platform_nyc_taxi_spark.streaming.sessions import sessionize_stream

    rows = [
        # user 1: session A (2 events), 40-min gap, session B (1 event),
        # then a far-future event so B also closes within the batch
        (1, dt.datetime(2024, 1, 1, 10, 0, 0)),
        (1, dt.datetime(2024, 1, 1, 10, 10, 0)),
        (1, dt.datetime(2024, 1, 1, 10, 50, 0)),
        (1, dt.datetime(2024, 1, 2, 12, 0, 0)),
        # user 2: one session only — may remain open (no later activity)
        (2, dt.datetime(2024, 1, 1, 9, 0, 0)),
        (2, dt.datetime(2024, 1, 1, 9, 5, 0)),
    ]
    src = str(tmp_path / "sess_events")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.mode(
        "overwrite"
    ).parquet(src)

    out = sessionize_stream(read_stream_auto(spark, src), gap_seconds=1800)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stream_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.n_events): r
        for r in spark.table("t_stream_sessions").collect()
    }

    # batch truth for comparison
    batch = session_stats(
        rows_source(spark, rows, "user_id long, ts timestamp"), "user_id", "ts"
    ).collect()
    last_start_per_user = {}
    for r in batch:
        k = last_start_per_user.get(r.user_id)
        if k is None or r.session_start > k:
            last_start_per_user[r.user_id] = r.session_start

    for r in batch:
        key = (r.user_id, r.session_start, r.n_events)
        if r.session_start < last_start_per_user[r.user_id]:
            # non-final session: must have closed, with identical bounds
            assert key in got, f"missing closed session {key}"
            assert got[key].session_end == r.session_end
            assert got[key].duration_s == r.duration_s
        elif key in got:
            # final session emitted only via timeout — bounds still exact
            assert got[key].session_end == r.session_end
    # nothing emitted that batch doesn't know about
    batch_keys = {(r.user_id, r.session_start, r.n_events) for r in batch}
    assert set(got) <= batch_keys


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path):
    """fingerprint_dedup_stream: a duplicate arriving in a LATER
    micro-batch is dropped (cross-batch state), and exactly one copy of
    each distinct text survives."""
    import glob
    import os
    import shutil

    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto
    from etl_platform_nyc_taxi_spark.streaming.dedup import fingerprint_dedup_stream

    f1 = [(1, "alpha beta"), (2, "gamma delta")]
    f2 = [(3, "Alpha   Beta"), (4, "epsilon zeta")]  # 3 == 1 normalized
    src = tmp_path / "dedup_src"
    src.mkdir()
    for i, rows in enumerate([f1, f2]):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(stage))
        dest = src / f"f{i}.parquet"
        shutil.copy(glob.glob(str(stage / "part-*.parquet"))[0], dest)
        os.utime(dest, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    out = fingerprint_dedup_stream(
        read_stream_auto(spark, str(src), maxFilesPerTrigger="1")
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stream_dedup_fs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_stream_dedup_fs").collect()
    assert sorted(r.doc_id for r in got) == [1, 2, 4]  # 3 deduped vs batch 1


def test_streaming_dedup_watermarked_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a duplicate within the lateness
    window drops; one far past it (state evicted) re-emits."""
    import datetime as dt

    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto
    from etl_platform_nyc_taxi_spark.streaming.dedup import (
        fingerprint_dedup_stream_watermarked,
    )

    rows = [
        (1, "same text", dt.datetime(2024, 1, 1, 10, 0)),
        (2, "same text", dt.datetime(2024, 1, 1, 10, 30)),  # in window: drop
        (3, "other", dt.datetime(2024, 1, 1, 10, 5)),
    ]
    src = str(tmp_path / "wm_src")
    spark.createDataFrame(rows, "doc_id long, text string, ts timestamp").write.mode(
        "overwrite"
    ).parquet(src)
    out = fingerprint_dedup_stream_watermarked(
        read_stream_auto(spark, src), ts_col="ts", delay="1 hour"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stream_dedup_wm")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.doc_id for r in spark.table("t_stream_dedup_wm").collect())
    # exactly ONE copy of "same text" survives (which one is arrival-order
    # dependent — dropDuplicates keeps the first encountered) plus doc 3
    assert len(got) == 2 and 3 in got
    assert (1 in got) != (2 in got)


def test_streaming_duplicate_groups_matches_batch(spark, tmp_path):
    """Complete-mode duplicate-groups aggregate == batch operator output
    on the same corpus (the oracle-sharing contract of streaming_dedup)."""
    from etl_platform_nyc_taxi_spark.operators.dedup import exact_duplicate_groups
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto
    from etl_platform_nyc_taxi_spark.streaming.dedup import duplicate_groups_stream

    rows = [
        (1, "aa bb"), (2, "aa  bb"), (3, "cc dd"), (4, "unique here"),
    ]
    src = str(tmp_path / "grp_src")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)
    agg = duplicate_groups_stream(read_stream_auto(spark, src))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_stream_dup_groups")
        .option("checkpointLocation", str(tmp_path / "ckpt_grp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_rows = {
        (r.fingerprint, r.copies, r.min_doc_id)
        for r in spark.table("t_stream_dup_groups").collect()
    }
    batch_rows = {
        (r.fingerprint, r.copies, r.min_doc_id)
        for r in exact_duplicate_groups(
            rows_source(spark, rows, "doc_id long, text string")
        ).collect()
    }
    assert stream_rows == batch_rows and len(stream_rows) == 1


def _stage_file(spark, tmp_path, src, name, rows, schema, mtime):
    import glob
    import os
    import shutil

    stage = tmp_path / f"stage_{name}"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(stage))
    dest = src / f"{name}.parquet"
    shutil.copy(glob.glob(str(stage / "part-*.parquet"))[0], dest)
    os.utime(dest, (mtime, mtime))


def _run_collecting(out, ckpt):
    """Drive one availableNow run through foreachBatch (the memory sink
    refuses checkpoint recovery; foreachBatch is the recoverable path —
    same as production's run_to_sink). Returns rows emitted THIS run."""
    collected = []

    def writer(df, _epoch):
        collected.extend(df.collect())

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def test_sessionize_state_survives_restart(spark, tmp_path):
    """Stop-and-resume on the SAME checkpoint: a session opened before the
    restart must close correctly after it — only possible if the state
    store recovered (offsets alone would lose the open session)."""
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto
    from etl_platform_nyc_taxi_spark.streaming.sessions import sessionize_stream

    src = tmp_path / "resume_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_resume")
    schema = "user_id long, ts timestamp"

    _stage_file(
        spark, tmp_path, src, "f0",
        [(1, dt.datetime(2024, 1, 1, 10, 0)), (1, dt.datetime(2024, 1, 1, 10, 10))],
        schema, 1_700_000_000,
    )
    out = sessionize_stream(read_stream_auto(spark, str(src)), gap_seconds=1800)
    run1 = _run_collecting(out, ckpt)
    assert run1 == []  # session still open

    # restart: new file closes the pre-restart session
    _stage_file(
        spark, tmp_path, src, "f1",
        [(1, dt.datetime(2024, 1, 1, 12, 0))],
        schema, 1_700_000_100,
    )
    out2 = sessionize_stream(read_stream_auto(spark, str(src)), gap_seconds=1800)
    got = _run_collecting(out2, ckpt)
    assert len(got) == 1
    r = got[0]
    assert r.session_start == dt.datetime(2024, 1, 1, 10, 0)
    assert r.session_end == dt.datetime(2024, 1, 1, 10, 10)
    assert r.n_events == 2  # both pre-restart events recovered from state


def test_dedup_state_survives_restart(spark, tmp_path):
    """A duplicate arriving AFTER a restart is still dropped: the
    fingerprint set recovered from the checkpointed state store."""
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto
    from etl_platform_nyc_taxi_spark.streaming.dedup import fingerprint_dedup_stream

    src = tmp_path / "dresume_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_dresume")
    schema = "doc_id long, text string"

    _stage_file(spark, tmp_path, src, "f0", [(1, "same text")], schema, 1_700_000_000)
    run1 = _run_collecting(
        fingerprint_dedup_stream(read_stream_auto(spark, str(src))), ckpt
    )
    assert [r.doc_id for r in run1] == [1]

    _stage_file(
        spark, tmp_path, src, "f1",
        [(2, "same  TEXT"), (3, "fresh content")], schema, 1_700_000_100,
    )
    run2 = _run_collecting(
        fingerprint_dedup_stream(read_stream_auto(spark, str(src))), ckpt
    )
    # doc 2 normalizes to doc 1's fingerprint -> dropped via recovered state
    assert [r.doc_id for r in run2] == [3]


def test_session_fn_splits_far_backward_late_event():
    # ADVICE r2: a late-but-above-watermark event more than one gap BEFORE
    # the open session's start must become its own session (what the
    # globally-sorting batch twin would emit), not merge backward.
    import pandas as pd

    from etl_platform_nyc_taxi_spark.streaming.sessions import _make_session_fn

    class FakeState:
        def __init__(self, value=None):
            self._v = value
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

        def setTimeoutTimestamp(self, ts):
            pass

    gap_s = 60
    us = 1_000_000
    # open session starts at t=1000s; late event at t=100s (900s before
    # start, gap only 60s) arrives in the next micro-batch
    state = FakeState(value=(1000 * us, 1010 * us, 2))
    fn = _make_session_fn(gap_s)
    pdf = pd.DataFrame({"ts": [pd.Timestamp(100 * us, unit="us")]})
    out = list(fn((7,), [pdf], state))
    assert len(out) == 1
    emitted = out[0]
    assert len(emitted) == 1  # the late event emitted as its own session
    assert emitted["session_start"].iloc[0] == pd.Timestamp(100 * us, unit="us")
    assert emitted["session_end"].iloc[0] == pd.Timestamp(100 * us, unit="us")
    assert emitted["n_events"].iloc[0] == 1
    # the open session is untouched in state
    assert state.get == (1000 * us, 1010 * us, 2)

    # within-gap backward reorder still extends the open session
    state2 = FakeState(value=(1000 * us, 1010 * us, 2))
    pdf2 = pd.DataFrame({"ts": [pd.Timestamp(990 * us, unit="us")]})
    assert list(_make_session_fn(gap_s)((7,), [pdf2], state2)) == []
    assert state2.get == (990 * us, 1010 * us, 3)


def test_streaming_sessionize_open_tail_is_the_watermark_invariant(spark):
    """VERDICT r2 task 6 (rule completed in r5): the streaming row count
    undershoots batch by exactly the OPEN TAIL — each user's LAST session
    when its end + gap the final watermark never passed (it could still
    be extended; an unbounded stream must not emit it). Every NON-last
    session closes the moment the user's next gap-exceeding event
    arrives, watermark or not. Pin the delta as a derivable invariant,
    not a magic number: streaming closed set == batch sessions that are
    non-last for their user OR have session_end + gap <= max(ts) -
    watermark_delay. (This is also the driver oracle for
    streaming_sessionize — queries_registry.py.)"""
    from etl_platform_nyc_taxi_spark.operators.windows import session_stats
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    sf = "/root/testdata/sf0.001"
    gap_s, wm_delay_s = 1800, 3600

    streamed = {
        (r.user_id, r.session_start, r.session_end, r.duration_s, r.n_events)
        for r in QUERIES["streaming_sessionize"](spark, sf).collect()
    }

    events = load_fixture(spark, sf, "events").select("user_id", "ts", "event_id")
    batch = session_stats(
        events, user_col="user_id", ts_col="ts", gap_seconds=gap_s,
        tiebreak=["event_id"],
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - dt.timedelta(seconds=wm_delay_s)
    batch_rows = batch.collect()
    last_seq = {}
    for r in batch_rows:
        last_seq[r.user_id] = max(last_seq.get(r.user_id, 0), r.session_seq)
    expected_closed = {
        (r.user_id, r.session_start, r.session_end, r.duration_s, r.n_events)
        for r in batch_rows
        if r.session_seq < last_seq[r.user_id]
        or r.session_end + dt.timedelta(seconds=gap_s) <= wm
    }
    assert streamed == expected_closed
    # and there IS an open tail (the stream legitimately withholds it)
    n_batch = batch.count()
    assert len(streamed) < n_batch
    assert n_batch - len(streamed) == batch.count() - len(expected_closed)


def test_stream_static_enrich_matches_batch_and_keeps_no_state(spark, tmp_path):
    """enrich_stream: stream-static broadcast join parity with the batch
    join, and the streaming progress must show NO state store rows for
    the join itself (stateless enrichment contract)."""
    from etl_platform_nyc_taxi_spark.streaming.enrich import enrich_stream

    src = str(tmp_path / "facts")
    spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (2, 50.0), (9, 1.0)], "uid long, amt double"
    ).write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame([(1, "gold"), (2, "basic")], "uid long, tier string")

    stream = read_stream_auto(spark, src)
    enriched = enrich_stream(stream, dim, on="uid")  # inner: uid 9 drops
    agg = enriched.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n"), F.sum("amt").alias("amt")
    )
    run_available_now(agg, "t_enrich_parity", str(tmp_path / "ckpt_enrich"))
    got = {
        (r["tier"], r["n"], r["amt"]) for r in spark.table("t_enrich_parity").collect()
    }
    assert got == {("gold", 1, 100.0), ("basic", 2, 250.0)}


def test_stream_stream_interval_join_multibatch_matches_batch(spark, tmp_path):
    """Cross-micro-batch matching: clicks land in file 1, purchases in
    file 2 (maxFilesPerTrigger=1 forces separate batches) — the join's
    state store must hold batch-1 clicks until batch-2 purchases arrive.
    Result must equal the batch interval join."""
    import pandas as pd

    from etl_platform_nyc_taxi_spark.streaming.stream_join import (
        interval_join_streams,
    )

    src = tmp_path / "ev"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01 10:00:00")
    pd.DataFrame(
        {"uid": [1, 2], "et": ["click", "click"], "ts": [t0, t0]}
    ).to_parquet(src / "b1.parquet")
    pd.DataFrame(
        {
            "uid": [1, 1, 2],
            "et": ["purchase", "purchase", "purchase"],
            # in-window, out-of-window (>1h), in-window
            "ts": [t0 + pd.Timedelta("30min"), t0 + pd.Timedelta("2h"), t0 + pd.Timedelta("59min")],
        }
    ).to_parquet(src / "b2.parquet")

    def streams():
        base = read_stream_auto(spark, str(src), maxFilesPerTrigger="1")
        clicks = base.filter(F.col("et") == "click").select(
            F.col("uid").alias("c_uid"), F.col("ts").alias("c_ts")
        )
        base2 = read_stream_auto(spark, str(src), maxFilesPerTrigger="1")
        purchases = base2.filter(F.col("et") == "purchase").select(
            F.col("uid").alias("p_uid"), F.col("ts").alias("p_ts")
        )
        return clicks, purchases

    clicks, purchases = streams()
    pairs = interval_join_streams(
        clicks, purchases, key=("c_uid", "p_uid"), ts=("c_ts", "p_ts"),
        max_delay_seconds=3600,
    )
    run_available_now(
        pairs, "t_ss_join", str(tmp_path / "ckpt_ssj"), output_mode="append"
    )
    got = {
        (r["c_uid"], r["p_ts"]) for r in spark.table("t_ss_join").collect()
    }
    assert got == {
        (1, (t0 + pd.Timedelta("30min")).to_pydatetime()),
        (2, (t0 + pd.Timedelta("59min")).to_pydatetime()),
    }


def test_windowed_key_counts_batch_parity(spark, tmp_path):
    """Streaming hourly per-key counts under AvailableNow == the batch
    groupBy over the same files (same watermarkless one-shot corpus)."""
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import (
        read_stream_auto,
        run_available_now,
        windowed_key_counts,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    stream = read_stream_auto(spark, src)
    agg = windowed_key_counts(stream, ts_col="ts", key_col="event_type")
    run_available_now(agg, "t_wkc")
    got = {
        (r["window_start"], r["event_type"]): r["cnt"]
        for r in spark.table("t_wkc").collect()
    }
    from etl_platform_nyc_taxi_spark.sources.parquet import read_parquet_auto

    batch = (
        read_parquet_auto(spark, src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("ts").isNotNull())
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .count()
    )
    want = {
        (r["window_start"], r["event_type"]): r["count"] for r in batch.collect()
    }
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# streaming CDC apply (streaming/cdc.py)
# ---------------------------------------------------------------------------

from tests.conftest import rows, ts  # noqa: E402


def _cdc_rows():
    return [
        (1, 10, ts("2024-01-01 10:00:00"), "a", 1.0),
        (2, 10, ts("2024-01-01 11:00:00"), "b", 2.0),  # supersedes event 1
        (3, 20, ts("2024-01-01 09:00:00"), "a", 3.0),
        (4, 20, ts("2024-01-01 09:00:00"), "c", 4.0),  # same ts: id tiebreak
        (5, 30, ts("2024-01-02 00:00:00"), "d", 5.0),
    ]


def test_cdc_apply_single_batch_matches_batch_compaction(spark, tmp_path):
    from etl_platform_nyc_taxi_spark.operators.joins import latest_per_key
    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState, apply_cdc_stream
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto

    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    df = spark.createDataFrame(_cdc_rows(), schema)
    src = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src))

    state = CdcState(spark, str(tmp_path / "state"))
    apply_cdc_stream(
        read_stream_auto(spark, str(src)),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        state=state,
    )
    got = {r["user_id"]: r["event_id"] for r in state.read().collect()}
    want = {
        r["user_id"]: r["event_id"]
        for r in latest_per_key(
            df, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
        ).collect()
    }
    assert got == want == {10: 2, 20: 4, 30: 5}


def test_cdc_apply_multi_batch_replay_converges(spark, tmp_path):
    """File-by-file replay (maxFilesPerTrigger=1) must fold to the same
    state as one batch — the idempotent-fold/exactly-once-state claim."""
    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState, apply_cdc_stream
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto

    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    rows_in = _cdc_rows()
    src = tmp_path / "src"
    # three files -> three micro-batches; later files carry NEWER rows for
    # the same keys so the fold must actually supersede prior state
    for i, chunk in enumerate([rows_in[:2], rows_in[2:4], rows_in[4:]]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    state = CdcState(spark, str(tmp_path / "state"))
    apply_cdc_stream(
        read_stream_auto(spark, str(src), maxFilesPerTrigger="1"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        state=state,
    )
    got = {r["user_id"]: r["event_id"] for r in state.read().collect()}
    assert got == {10: 2, 20: 4, 30: 5}
    # generations retired: exactly one gen dir remains
    import os

    gens = [d for d in os.listdir(tmp_path / "state") if d.startswith("gen=")]
    assert len(gens) == 1


def test_cdc_apply_out_of_order_batches(spark, tmp_path):
    """A LATE batch (older ts for an already-folded key) must not regress
    state — latest_per_key is order-insensitive over the union."""
    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState, apply_cdc_stream
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto

    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    newest_first = [
        (9, 10, ts("2024-01-05 00:00:00"), "z", 9.0),
        (1, 10, ts("2024-01-01 00:00:00"), "a", 1.0),  # late arrival
    ]
    src = tmp_path / "src"
    for chunk in ([newest_first[0]], [newest_first[1]]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    state = CdcState(spark, str(tmp_path / "state"))
    apply_cdc_stream(
        read_stream_auto(spark, str(src), maxFilesPerTrigger="1"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        state=state,
    )
    assert [r["event_id"] for r in state.read().collect()] == [9]


def test_cdc_state_survives_restart(spark, tmp_path):
    """ADVICE r4: a process restart with persistent state_dir AND
    checkpoint_dir must resume from the highest existing generation. The
    checkpoint makes the restarted stream skip already-committed batches,
    so a CdcState that restarted at gen=0 would read None and silently
    drop all previously folded state."""
    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState, apply_cdc_stream
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto

    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    rows_in = _cdc_rows()
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    state_dir = str(tmp_path / "state")

    # "process 1": fold the first two rows
    spark.createDataFrame(rows_in[:2], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    state1 = CdcState(spark, state_dir)
    apply_cdc_stream(
        read_stream_auto(spark, str(src)),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        state=state1,
        checkpoint_dir=ckpt,
    )
    assert state1.gen > 0

    # "process 2": new files arrive, a FRESH CdcState over the same dirs
    spark.createDataFrame(rows_in[2:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    state2 = CdcState(spark, state_dir)
    assert state2.gen == state1.gen  # resumed, not reset
    apply_cdc_stream(
        read_stream_auto(spark, str(src)),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        state=state2,
        checkpoint_dir=ckpt,
    )
    got = {r["user_id"]: r["event_id"] for r in state2.read().collect()}
    # keys folded before the restart (user 10, superseded by event 2 in
    # batch 1) must survive alongside the post-restart fold
    assert got == {10: 2, 20: 4, 30: 5}


def test_streaming_sketch_multibatch_equals_batch(spark, tmp_path):
    """Mergeable-sketch invariant under incremental arrival: the per-(day,
    bin) histogram accumulated file-by-file (maxFilesPerTrigger=1,
    complete mode) must equal the one-pass batch sketch — the property
    that lets 100 TB rollups re-aggregate stored sketches instead of
    replaying events."""
    import glob
    import os
    import shutil

    from etl_platform_nyc_taxi_spark.operators.analytics import binned_sketch
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import (
        read_stream_auto,
    )

    src = tmp_path / "ev"
    src.mkdir()
    random.seed(3)
    all_rows = []
    for i in range(3):
        rows_i = [
            (
                dt.datetime(2024, 1, 1 + (j % 5), 8 + i, 0, 0),
                random.uniform(0, 30),
            )
            for j in range(40)
        ]
        all_rows += rows_i
        stage = tmp_path / f"sk_stage{i}"
        spark.createDataFrame(rows_i, "ts timestamp, value double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(stage))
        dest = src / f"f{i}.parquet"
        shutil.copy(glob.glob(str(stage / "part-*.parquet"))[0], dest)
        os.utime(dest, (1_700_000_000 + i * 100,) * 2)

    stream = read_stream_auto(spark, str(src), maxFilesPerTrigger="1")
    daily = (
        stream.groupBy(
            F.window("ts", "1 day").alias("__w"),
            F.floor(F.col("value") * F.lit(16.0)).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("__w.start").cast("date").alias("day"), "bin", "cnt")
    )
    q = (
        daily.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_sketch_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_sketch"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = rows(spark.table("t_sketch_stream"))
    batch_df = spark.createDataFrame(all_rows, "ts timestamp, value double")
    batch = rows(
        binned_sketch(
            batch_df.select(F.col("ts").cast("date").alias("day"), "value"),
            "value",
            ["day"],
            scale=16,
        )
    )
    assert streamed == batch


def test_sessionize_rocksdb_state_store_parity(spark, tmp_path):
    """The docs claim "RocksDB state store in production" — prove the
    stateful sessionizer actually RUNS under RocksDBStateStoreProvider
    and emits the identical closed-session set as the default
    HDFS-backed provider (state-store choice must be a deployment knob,
    never a semantics change)."""
    from etl_platform_nyc_taxi_spark.streaming.daily_stream import read_stream_auto
    from etl_platform_nyc_taxi_spark.streaming.sessions import sessionize_stream

    schema = "user_id long, ts timestamp"
    rows_in = [
        (1, ts("2024-01-01 09:00:00")),
        (1, ts("2024-01-01 09:10:00")),   # same session
        (1, ts("2024-01-01 11:00:00")),   # new session (gap > 30 min)
        (2, ts("2024-01-01 09:00:00")),
        # late sentinel far ahead so the watermark closes everything above
        (9, ts("2024-01-03 00:00:00")),
    ]
    src = tmp_path / "src"
    spark.createDataFrame(rows_in, schema).coalesce(1).write.parquet(str(src))

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )

    def run(provider: str | None):
        old = spark.conf.get(conf_key, None)
        if provider:
            spark.conf.set(conf_key, provider)
        try:
            out = sessionize_stream(
                read_stream_auto(spark, str(src)), gap_seconds=1800
            )
            sink = f"rocks_parity_{'r' if provider else 'd'}"
            from etl_platform_nyc_taxi_spark.streaming.daily_stream import (
                run_available_now,
            )

            run_available_now(out, sink, output_mode="append")
            return {
                (r.user_id, r.session_start, r.session_end, r.n_events)
                for r in spark.table(sink).collect()
            }
        finally:
            if provider:
                if old is None:
                    spark.conf.unset(conf_key)
                else:
                    spark.conf.set(conf_key, old)

    default_set = run(None)
    rocks_set = run(rocks)
    assert default_set == rocks_set
    assert (1, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:10:00"), 2) in rocks_set


def test_sql_literal_rejects_non_finite_floats():
    """ADVICE r5: repr(nan)/repr(inf) are not SQL — fail loudly."""
    import math

    import pytest

    from etl_platform_nyc_taxi_spark.streaming.jdbc_sink import sql_literal

    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            sql_literal(bad)
    assert sql_literal(1.5) == "1.5"
    assert sql_literal(True) == "TRUE"
    assert sql_literal(None) == "NULL"
    assert sql_literal("o'brien") == "'o''brien'"
    assert math.isfinite(1.5)  # guard the guard


def test_sql_literal_timestamp_keeps_microseconds():
    from etl_platform_nyc_taxi_spark.streaming.jdbc_sink import sql_literal

    t = dt.datetime(2024, 6, 1, 12, 0, 0, 123456)
    assert sql_literal(t) == "CAST('2024-06-01 12:00:00.123456' AS TIMESTAMP)"
    # whole-second timestamps still render (zero-padded fraction is fine)
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    assert sql_literal(t0) == "CAST('2024-06-01 12:00:00.000000' AS TIMESTAMP)"
    assert sql_literal(dt.date(2024, 6, 1)) == "CAST('2024-06-01' AS DATE)"


def test_cdc_state_resume_skips_torn_generation(spark, tmp_path):
    """ADVICE r5: a crash mid write_next leaves a gen=K+1 dir without
    _SUCCESS; resume must prefer the intact gen=K, not the torn one."""
    import os

    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState

    state_dir = str(tmp_path / "state")
    schema = "event_id long, user_id long, ts timestamp"
    df = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 1))], schema
    )

    s1 = CdcState(spark, state_dir)
    s1.write_next(df)  # gen=1, complete (_SUCCESS present)
    assert s1.gen == 1
    assert os.path.isfile(os.path.join(state_dir, "gen=1", "_SUCCESS"))

    # simulate a torn gen=2: directory with a partial file, no _SUCCESS
    torn = os.path.join(state_dir, "gen=2")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00\x01torn")

    s2 = CdcState(spark, state_dir)
    assert s2.gen == 1  # resumed from the intact generation
    assert [r["event_id"] for r in s2.read().collect()] == [1]
    # the next write overwrites the torn dir and completes normally,
    # dropping the engine's OWN commit marker (Spark's _SUCCESS is
    # optional on cloud committers — resume must not depend on it)
    s2.write_next(df.withColumn("event_id", F.lit(2).cast("long")))
    assert s2.gen == 2
    assert os.path.isfile(os.path.join(state_dir, "gen=2", "_COMMITTED"))
    os.remove(os.path.join(state_dir, "gen=2", "_SUCCESS"))
    s3 = CdcState(spark, state_dir)
    assert s3.gen == 2  # _COMMITTED alone is enough


def test_cdc_state_resume_legacy_markerless_generation(spark, tmp_path):
    """ADVICE r6: a pre-upgrade state dir written with
    marksuccessfuljobs=false has NEITHER _COMMITTED nor _SUCCESS on any
    gen; its committed state must be adopted (readable parquet →
    backfill _COMMITTED), not silently dropped as torn. A torn legacy
    TAIL (unreadable parquet) still falls back to the next lower gen."""
    import os

    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState

    state_dir = str(tmp_path / "state")
    schema = "event_id long, user_id long, ts timestamp"
    df = spark.createDataFrame([(1, 10, dt.datetime(2024, 1, 1))], schema)
    # legacy layout: real parquet in gen=3, no markers anywhere
    df.write.parquet(os.path.join(state_dir, "gen=3"))
    for m in ("_SUCCESS", "_COMMITTED"):
        p = os.path.join(state_dir, "gen=3", m)
        if os.path.isfile(p):
            os.remove(p)
    # torn legacy tail: gen=4 with a garbage part file
    torn = os.path.join(state_dir, "gen=4")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00\x01torn")

    s = CdcState(spark, state_dir)
    assert s.gen == 3  # legacy-committed adopted, torn tail skipped
    assert [r["event_id"] for r in s.read().collect()] == [1]
    # marker backfilled once: a second init takes the fast path
    assert os.path.isfile(os.path.join(state_dir, "gen=3", "_COMMITTED"))
    s2 = CdcState(spark, state_dir)
    assert s2.gen == 3


def test_cdc_state_legacy_readable_tail_still_suspect(spark, tmp_path):
    """Code-review r7: a torn legacy tail can be READABLE parquet (a
    task-commit committer moved some part files in before the crash) —
    footer validation cannot tell it from complete. With multiple
    legacy gens the highest never finished its write_next (the prior
    gen is retired only after the new one completes), so resume must
    adopt the LOWER gen; the uncommitted batch replays onto it."""
    import os

    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState

    state_dir = str(tmp_path / "state")
    schema = "event_id long, user_id long, ts timestamp"
    full = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 1)), (2, 20, dt.datetime(2024, 1, 2))],
        schema,
    )
    partial = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 1))], schema
    )
    # gen=5: complete legacy snapshot; gen=6: READABLE but incomplete
    # (stands in for a partial part-file subset), both marker-less
    full.write.parquet(os.path.join(state_dir, "gen=5"))
    partial.write.parquet(os.path.join(state_dir, "gen=6"))
    for g in (5, 6):
        for m in ("_SUCCESS", "_COMMITTED"):
            p = os.path.join(state_dir, f"gen={g}", m)
            if os.path.isfile(p):
                os.remove(p)

    s = CdcState(spark, state_dir)
    assert s.gen == 5  # suspect readable tail skipped
    assert sorted(r["event_id"] for r in s.read().collect()) == [1, 2]
    assert not os.path.isfile(
        os.path.join(state_dir, "gen=6", "_COMMITTED")
    )

    # a SINGLE legacy gen is not suspect (write_next retired the prior
    # one, so the write completed): adopt it directly
    solo_dir = str(tmp_path / "solo")
    full.write.parquet(os.path.join(solo_dir, "gen=7"))
    for m in ("_SUCCESS", "_COMMITTED"):
        p = os.path.join(solo_dir, "gen=7", m)
        if os.path.isfile(p):
            os.remove(p)
    assert CdcState(spark, solo_dir).gen == 7


class _StubState:
    """Minimal GroupState stand-in for unit-testing the session fold."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False
        self.updated = None
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.updated = v

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms

    def remove(self):
        self._v = None


def _run_session_fn(gap_seconds, state_tuple, ts_list):
    import pandas as pd

    from etl_platform_nyc_taxi_spark.streaming.sessions import _make_session_fn

    fn = _make_session_fn(gap_seconds)
    state = _StubState(state_tuple)
    pdf = pd.DataFrame({"ts": pd.to_datetime(ts_list)})
    out = list(fn((1,), [pdf], state))
    closed = (
        []
        if not out
        else list(
            zip(
                out[0]["session_start"].tolist(),
                out[0]["session_end"].tolist(),
                out[0]["n_events"].tolist(),
            )
        )
    )
    return closed, state


def test_session_fold_merges_mutually_close_late_events():
    """Code-review r7: two late events each more than one gap BEFORE the
    open session but within the gap of each other must form ONE closed
    session (the batch twin's global sort merges them); per-event
    singleton emission split them."""
    import pandas as pd

    us = lambda s: int(pd.Timestamp(s).value // 1000)  # noqa: E731
    state = (us("2024-01-01 12:00:00"), us("2024-01-01 12:10:00"), 5)
    closed, st = _run_session_fn(
        1800, state, ["2024-01-01 11:21:00", "2024-01-01 11:22:00"]
    )
    assert [(str(s), str(e), n) for s, e, n in closed] == [
        ("2024-01-01 11:21:00", "2024-01-01 11:22:00", 2)
    ]
    assert st.updated == state  # open session unchanged in state


def test_session_fold_gap_uses_floor_seconds_like_batch():
    """Code-review r7: the gap test must compare floor-second epochs
    (the batch twin / oracle arithmetic), not raw microseconds — they
    disagree for sub-second timestamps at the boundary."""
    # µs gap = 1800.05 s, floor-second diff = exactly 1800 -> ONE session
    closed, st = _run_session_fn(
        1800,
        None,
        ["2024-01-01 10:00:00.900000", "2024-01-01 10:30:00.950000"],
    )
    assert closed == [] and st.updated[2] == 2
    # floor-second diff 1801 -> split
    closed, st = _run_session_fn(
        1800,
        None,
        ["2024-01-01 10:00:00.900000", "2024-01-01 10:30:01.050000"],
    )
    assert len(closed) == 1 and closed[0][2] == 1 and st.updated[2] == 1


def test_stage_table_name_caps_at_63_bytes_with_discriminator():
    """ADVICE r7: PG silently truncates identifiers at 63 bytes, which
    for long target tables used to clip the qtag/batch discriminator.
    The capped form must stay <= 63 chars AND keep distinct triples
    distinct."""
    from etl_platform_nyc_taxi_spark.streaming.jdbc_sink import (
        stage_table_name,
    )

    short = stage_table_name("daily", "ab12cd34", 7)
    assert short == "daily_stg_ab12cd34_7"  # short names unchanged

    long_table = "a_very_long_schema_qualified_target_table_name_for_metrics"
    names = {
        stage_table_name(long_table, qtag, b)
        for qtag in ("ab12cd34", "ffee0011")
        for b in (0, 1, 0x1F)
    }
    assert len(names) == 6  # discriminator survives the cap
    for n in names:
        assert len(n) <= 63
        assert n.startswith(long_table[:42])  # still visibly related

    # ADVICE r8: NAMEDATALEN is 63 BYTES — a multibyte table name that
    # fits in 63 characters can still overflow the byte limit and get
    # truncated server-side. The cap must count encoded bytes and must
    # not split a codepoint at the slice boundary.
    wide = "métriques_agrégées_" + "é" * 25  # 44 chars, 72 bytes
    full = f"{wide}_stg_ab12cd34_1f"
    assert len(full) <= 63 < len(full.encode("utf-8"))  # the trap shape
    capped = stage_table_name(wide, "ab12cd34", 0x1F)
    assert len(capped.encode("utf-8")) <= 63
    capped.encode("utf-8").decode("utf-8")  # no split codepoint
    assert capped != stage_table_name(wide, "ffee0011", 0x1F)


# --- corpus-ingest capstone (r11: VERDICT r10 task 6) -----------------------


def _ingest_fixture_frames(spark):
    from etl_platform_nyc_taxi_spark.sources import load_fixture

    d = load_fixture(spark, "/root/testdata/sf0.001", "documents")
    corpus = d.filter(F.col("doc_id") % 4 != 0).select(
        "doc_id", "text", "lang", "source"
    )
    arriving = d.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id", "text", "lang", "source"
    )
    return corpus, arriving


def _ingest_alloc(spark, corpus):
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        unimax_allocation,
    )
    from etl_platform_nyc_taxi_spark.operators.text import token_count

    sizes = corpus.groupBy("lang").agg(
        F.sum(token_count("text")).cast("long").alias("n_tok")
    )
    budget = sizes.agg(
        F.expr("CAST(sum(n_tok) div 8 AS LONG)").alias("budget")
    )
    return unimax_allocation(sizes, ["lang"], epoch_cap=1, budget=budget)


def _run_ingest(spark, tmp_path, n_files, tag):
    from etl_platform_nyc_taxi_spark.operators.text import QualityRules
    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState
    from etl_platform_nyc_taxi_spark.streaming.ingest import (
        corpus_ingest_stream,
    )

    corpus, arriving = _ingest_fixture_frames(spark)
    eval_slice = corpus.filter(F.col("doc_id") % 5 == 0)
    alloc = _ingest_alloc(spark, corpus)
    src = str(tmp_path / f"src_{tag}")
    arriving.repartitionByRange(n_files, "doc_id").write.mode(
        "overwrite"
    ).parquet(src)
    state = CdcState(spark, str(tmp_path / f"state_{tag}"))
    stream = read_stream_auto(spark, src, maxFilesPerTrigger="1")
    corpus_ingest_stream(
        stream,
        corpus,
        eval_slice,
        alloc,
        state,
        rules=QualityRules(min_tokens=40, min_stopword_ratio=0.05),
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        partitions=8,
        strata_cols=["lang"],
        flag_pct=35,
    )
    return state


def _ledger_rows(state):
    return {
        r["doc_id"]: (
            r["near_dup"], r["contaminated"], r["low_quality"], r["admitted"]
        )
        for r in state.read().collect()
    }


def test_corpus_ingest_multibatch_matches_single_batch(spark, tmp_path):
    """Batch-equivalence: the final admission ledger must not depend on
    how the file source slices arrivals into micro-batches."""
    multi = _ledger_rows(_run_ingest(spark, tmp_path, 3, "multi"))
    single = _ledger_rows(_run_ingest(spark, tmp_path, 1, "single"))
    assert multi == single
    assert len(multi) == 125  # every arriving doc has a ledger row
    # every gate and both admit outcomes are exercised by the fixture
    assert any(v[0] for v in multi.values()), "no near-dup rejections"
    assert any(v[1] for v in multi.values()), "no contamination flags"
    assert any(v[2] for v in multi.values()), "no quality rejections"
    assert any(v[3] for v in multi.values()), "nothing admitted"
    assert any(
        not v[3] and not any(v[:3]) for v in multi.values()
    ), "quota never bound — budget too loose to test admission"
    # a gated doc is never admitted
    assert all(not v[3] or not any(v[:3]) for v in multi.values())


def test_corpus_ingest_replay_converges(spark, tmp_path):
    """At-least-once: re-running the whole stream into the SAME state dir
    (fresh checkpoint => every batch replays) must converge to the same
    ledger — the idempotence the foreachBatch contract requires."""
    from etl_platform_nyc_taxi_spark.operators.text import QualityRules
    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState
    from etl_platform_nyc_taxi_spark.streaming.ingest import (
        corpus_ingest_stream,
    )

    state = _run_ingest(spark, tmp_path, 3, "replay")
    first = _ledger_rows(state)
    gen_before = state.gen
    corpus, arriving = _ingest_fixture_frames(spark)
    eval_slice = corpus.filter(F.col("doc_id") % 5 == 0)
    alloc = _ingest_alloc(spark, corpus)
    stream = read_stream_auto(
        spark, str(tmp_path / "src_replay"), maxFilesPerTrigger="1"
    )
    corpus_ingest_stream(
        stream,
        corpus,
        eval_slice,
        alloc,
        state,
        rules=QualityRules(min_tokens=40, min_stopword_ratio=0.05),
        checkpoint_dir=str(tmp_path / "ckpt_replay2"),
        partitions=8,
        strata_cols=["lang"],
        flag_pct=35,
    )
    assert state.gen > gen_before  # the replay really re-folded
    assert _ledger_rows(state) == first


def test_admit_ledger_quota_boundary_and_missing_stratum(spark):
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source
    from etl_platform_nyc_taxi_spark.streaming.ingest import admit_ledger

    ledger = rows_source(
        spark,
        [
            # stratum (en, a): quota 10 — docs admit in doc_id order
            (1, "en", "a", 4, False, False, False),   # cum 4  -> admit
            (2, "en", "a", 6, False, False, False),   # cum 10 -> admit (==)
            (3, "en", "a", 1, False, False, False),   # cum 11 -> reject
            # gated docs never admit and never consume quota
            (4, "en", "a", 100, True, False, False),
            (5, "en", "a", 100, False, True, False),
            (6, "en", "a", 100, False, False, True),
            # stratum with no quota row: survivor but nothing admits
            (7, "xx", "z", 1, False, False, False),
        ],
        "doc_id long, lang string, source string, n_tok long, "
        "near_dup boolean, contaminated boolean, low_quality boolean",
    )
    alloc = rows_source(
        spark, [("en", "a", 10)], "lang string, source string, alloc long"
    )
    got = {
        r["doc_id"]: r["admitted"] for r in admit_ledger(ledger, alloc).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: False,
                   6: False, 7: False}


def test_corpus_ingest_rejects_unknown_gate_option():
    """ADVICE r11: a typo'd gate knob used to surface as a TypeError
    mid-stream inside the first fold; it must fail BEFORE the stream
    starts, naming the bad key."""
    import pytest

    from etl_platform_nyc_taxi_spark.streaming.ingest import (
        corpus_ingest_stream,
    )

    with pytest.raises(TypeError, match=r"unsupported gate option.*bogus"):
        corpus_ingest_stream(
            None, None, None, None, None, bogus=1  # validated pre-stream
        )


def test_gate_batch_accepts_max_bucket(spark):
    """ADVICE r11: max_bucket is a documented knob of minhash_probe_index
    and must be settable through gate_batch (and thus through
    corpus_ingest_stream's **mh_kwargs)."""
    from etl_platform_nyc_taxi_spark.operators.bloom import bloom_build
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        minhash_corpus_index,
    )
    from etl_platform_nyc_taxi_spark.operators.text import QualityRules
    from etl_platform_nyc_taxi_spark.streaming.ingest import (
        MH_BANDS,
        MH_K,
        MH_NUM_HASHES,
        gate_batch,
    )

    corpus, arriving = _ingest_fixture_frames(spark)
    corpus = corpus.limit(40)
    batch = arriving.limit(10)
    idx = minhash_corpus_index(
        corpus.select("doc_id", "text"),
        k=MH_K, num_hashes=MH_NUM_HASHES, bands=MH_BANDS,
    )
    bloom = bloom_build(corpus.limit(5))
    out = gate_batch(
        batch, idx, bloom, rules=QualityRules(min_tokens=40),
        max_bucket=16,
    )
    assert out.count() == 10
    assert set(out.columns) == {
        "doc_id", "lang", "source", "n_tok",
        "near_dup", "contaminated", "low_quality",
    }


# --- semantic ingest gate (r12: VERDICT r11 task 2) --------------------------


def _run_semantic_ingest(spark, tmp_path, n_files, tag):
    from etl_platform_nyc_taxi_spark.operators.pq import fit_int_kmeans
    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState
    from etl_platform_nyc_taxi_spark.streaming.ingest import (
        semantic_ingest_stream,
    )
    from etl_platform_nyc_taxi_spark.sources import load_fixture

    e = load_fixture(spark, "/root/testdata/sf0.001", "embeddings")
    b = (e.count() * 3) // 4
    corpus = e.filter(F.col("vec_id") < b).select("vec_id", "embedding")
    mutants = e.filter(
        (F.col("vec_id") < b) & (F.col("vec_id") % 5 == 0)
    ).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("doc_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.01)).cast("float")
        ).alias("embedding"),
    )
    novel = e.filter(F.col("vec_id") >= b).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    src = str(tmp_path / f"sem_src_{tag}")
    mutants.unionByName(novel).repartitionByRange(
        n_files, "doc_id"
    ).write.mode("overwrite").parquet(src)
    coarse = fit_int_kmeans(corpus, m=1, dsub=64, k=8, iters=2)[0]
    state = CdcState(spark, str(tmp_path / f"sem_state_{tag}"))
    stream = read_stream_auto(spark, src, maxFilesPerTrigger="1")
    semantic_ingest_stream(
        stream,
        corpus,
        state,
        coarse=coarse,
        checkpoint_dir=str(tmp_path / f"sem_ckpt_{tag}"),
        partitions=8,
    )
    return {tuple(r) for r in state.read().collect()}


def test_semantic_ingest_batch_split_invariant_and_catches_mutants(
    spark, tmp_path
):
    """The semantic ledger must be a pure function of the arrived SET
    (verdicts score against the prebuilt corpus index only), and the
    gate must flag every direction-preserving mutant — the paraphrase
    stand-in the lexical MinHash gate cannot see — while letting the
    genuinely novel tail through."""
    multi = _run_semantic_ingest(spark, tmp_path, 3, "multi")
    single = _run_semantic_ingest(spark, tmp_path, 1, "single")
    assert multi == single
    by_id = {r[0]: r for r in multi}
    mut = [r for i, r in by_id.items() if i >= 1_000_000]
    nov = [r for i, r in by_id.items() if i < 1_000_000]
    assert mut and nov
    assert all(r[3] for r in mut), "a mutant slipped the semantic gate"
    # ×1.01 scaling preserves direction exactly: best cosine is 1.0 and
    # the nearest neighbor is the original vector
    assert all(r[2] == 1_000_000 for r in mut)
    assert all(r[1] == r[0] - 1_000_000 for r in mut)
    assert not any(r[3] for r in nov), "novel vector flagged as near-dup"


def test_corpus_ingest_incremental_admission_equals_recompute(
    spark, tmp_path
):
    """VERDICT r11 task 3 migration net: the carried-counter fold must
    equal a from-scratch admit_ledger over the accumulated set — on the
    monotone path AND after a deliberately non-monotone second stream
    (lower doc_ids arriving after higher ones, forcing the
    stratum-local recompute)."""
    from etl_platform_nyc_taxi_spark.operators.text import QualityRules
    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState
    from etl_platform_nyc_taxi_spark.streaming.ingest import (
        LEDGER_COLS,
        admit_ledger,
        corpus_ingest_stream,
    )

    corpus, arriving = _ingest_fixture_frames(spark)
    eval_slice = corpus.filter(F.col("doc_id") % 5 == 0)
    alloc = _ingest_alloc(spark, corpus)
    mid = 250  # split arrivals into a high-id wave then a low-id wave
    high = arriving.filter(F.col("doc_id") >= mid)
    low = arriving.filter(F.col("doc_id") < mid)
    assert high.count() > 0 and low.count() > 0
    state = CdcState(spark, str(tmp_path / "state_nm"))

    for tag, wave in (("high", high), ("low", low)):
        src = str(tmp_path / f"src_{tag}")
        wave.repartitionByRange(2, "doc_id").write.mode(
            "overwrite"
        ).parquet(src)
        corpus_ingest_stream(
            read_stream_auto(spark, src, maxFilesPerTrigger="1"),
            corpus,
            eval_slice,
            alloc,
            state,
            rules=QualityRules(min_tokens=40, min_stopword_ratio=0.05),
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            partitions=8,
            strata_cols=["lang"],
            flag_pct=35,
        )

    led = state.read()
    recomputed = admit_ledger(led.select(*LEDGER_COLS), alloc, ["lang"])
    got = {tuple(r) for r in led.collect()}
    want = {tuple(r) for r in recomputed.collect()}
    assert got == want
    # the second wave's low ids really did land below the first wave's
    # frontier (i.e. the non-monotone path ran, not just the happy path)
    assert {r[0] for r in got} == {
        r["doc_id"] for r in arriving.select("doc_id").collect()
    }


def test_corpus_ingest_mixed_mono_and_recompute_fold(spark, tmp_path):
    """r12 fold fast-paths: one micro-batch carrying BOTH a monotone
    stratum (fresh ids above its frontier) and a non-monotone one
    (replayed ids at/below its frontier) must take the MIXED path —
    incremental admission for the former, stratum-local recompute for
    the latter — and still equal a from-scratch admit_ledger over the
    accumulated set (the all-mono / all-non fast paths are covered by
    test_corpus_ingest_incremental_admission_equals_recompute)."""
    from etl_platform_nyc_taxi_spark.operators.text import QualityRules
    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState
    from etl_platform_nyc_taxi_spark.streaming.ingest import (
        LEDGER_COLS,
        admit_ledger,
        corpus_ingest_stream,
    )

    corpus, arriving = _ingest_fixture_frames(spark)
    eval_slice = corpus.filter(F.col("doc_id") % 5 == 0)
    alloc = _ingest_alloc(spark, corpus)
    langs = sorted(
        r["lang"] for r in arriving.select("lang").distinct().collect()
    )
    assert len(langs) >= 2
    la, lb = langs[0], langs[1]
    ids_b = sorted(
        r["doc_id"]
        for r in arriving.filter(F.col("lang") == lb)
        .select("doc_id")
        .collect()
    )
    assert len(ids_b) >= 2
    mid_b = ids_b[len(ids_b) // 2]
    wave1 = arriving.filter(
        (F.col("lang") != lb) | (F.col("doc_id") < mid_b)
    )
    replay_a = arriving.filter(
        (F.col("lang") == la) & (F.col("doc_id") % 8 == 0)
    )
    assert replay_a.count() > 0
    # ONE file -> ONE micro-batch holding lb's fresh high ids (monotone)
    # next to la's replayed ids (non-monotone).
    wave2 = arriving.filter(
        (F.col("lang") == lb) & (F.col("doc_id") >= mid_b)
    ).unionByName(replay_a)
    state = CdcState(spark, str(tmp_path / "state_mix"))
    for tag, wave, nf in (("w1", wave1, 2), ("w2", wave2, 1)):
        src = str(tmp_path / f"src_{tag}")
        wave.coalesce(nf).write.mode("overwrite").parquet(src)
        corpus_ingest_stream(
            read_stream_auto(spark, src, maxFilesPerTrigger="1"),
            corpus,
            eval_slice,
            alloc,
            state,
            rules=QualityRules(min_tokens=40, min_stopword_ratio=0.05),
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            partitions=8,
            strata_cols=["lang"],
            flag_pct=35,
        )
    led = state.read()
    recomputed = admit_ledger(led.select(*LEDGER_COLS), alloc, ["lang"])
    got = {tuple(r) for r in led.collect()}
    want = {tuple(r) for r in recomputed.collect()}
    assert got == want
    assert {r[0] for r in got} == {
        r["doc_id"] for r in arriving.select("doc_id").collect()
    }
