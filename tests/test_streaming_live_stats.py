"""Streaming live stats (streaming/live_stats.py): watermarked windowed
aggregation, native session_window rollup (batch parity vs
operators/sessions), and the applyInPandasWithState conversation tracker
(event-time-timeout close-out across micro-batches)."""

import json
import os
from datetime import datetime

from pyspark.sql import functions as F

from lab02_citation_matching_and_entity_resolution_spark.operators.sessions import (
    session_stats,
    sessionize,
)
from lab02_citation_matching_and_entity_resolution_spark.streaming.ingest import (
    read_transcript_stream,
)
from lab02_citation_matching_and_entity_resolution_spark.streaming.live_stats import (
    conversation_progress,
    session_rollup_stream,
    turn_rate_windows,
)


def _write_jsonl(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _turn(conv, idx, ts, role="user", text="t"):
    return {"conv_id": conv, "turn_idx": idx, "role": role, "text": text,
            "tool": None, "ts": ts}


def _start_memory_query(stream_df, sink_name):
    """Start an append-mode memory-sink query; the caller drives batches
    with q.processAllAvailable() after each file drop (memory sink cannot
    restart from a checkpoint, so one continuous query per test)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .start()
    )


def test_turn_rate_windows_emits_closed_windows(spark, tmp_path):
    src = str(tmp_path / "in")
    # batch 1: three turns inside the 10:00-10:05 window
    _write_jsonl(src, "a.jsonl", [
        _turn("c1", 0, "2026-01-01T10:00:10", role="user"),
        _turn("c1", 1, "2026-01-01T10:01:00", role="assistant"),
        _turn("c2", 0, "2026-01-01T10:02:00", role="user"),
    ])
    agg = turn_rate_windows(
        read_transcript_stream(spark, src),
        key_col="role", window_duration="5 minutes", watermark_delay="1 minute",
    )
    q = _start_memory_query(agg, "rate_sink")
    try:
        q.processAllAvailable()
        # window not yet closed by the watermark: nothing appended
        assert spark.sql("SELECT * FROM rate_sink").count() == 0

        # batch 2: a much later turn pushes the watermark past the window end
        _write_jsonl(src, "b.jsonl", [
            _turn("c3", 0, "2026-01-01T11:00:00", role="user"),
        ])
        q.processAllAvailable()
        rows = {(r["role"],): r
                for r in spark.sql("SELECT * FROM rate_sink").collect()}
    finally:
        q.stop()
    assert rows[("user",)]["n_events"] == 2
    assert rows[("assistant",)]["n_events"] == 1
    assert rows[("user",)]["window_start"] == datetime.fromisoformat("2026-01-01T10:00:00")
    assert rows[("user",)]["window_end"] == datetime.fromisoformat("2026-01-01T10:05:00")


def test_session_rollup_stream_batch_parity(spark):
    """The native session_window rollup run in BATCH mode agrees with
    sessionize + session_stats on (key, started_at, ended_at, n_events) —
    including the strict->split boundary rule (a pause of exactly the gap
    MERGES in both; pinned here with an exact-boundary pair)."""
    rows = []
    # u1: two sessions (big pause), u2: one session incl. an exact-gap pause
    for i, (u, ts) in enumerate([
        ("u1", "2026-01-01T10:00:00"),
        ("u1", "2026-01-01T10:10:00"),
        ("u1", "2026-01-01T13:00:00"),
        ("u2", "2026-01-01T09:00:00"),
        ("u2", "2026-01-01T09:30:00"),  # exactly 1800s: merges in both paths
    ]):
        rows.append((i, u, datetime.fromisoformat(ts)))
    ev = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp_ntz")

    native = {
        (r["user_id"], r["started_at"]): (r["ended_at"], r["n_events"])
        for r in session_rollup_stream(
            ev, key_col="user_id", ts_col="ts", gap="30 minutes"
        ).collect()
    }
    composed = {
        (r["user_id"], r["started_at"]): (r["ended_at"], r["n_events"])
        for r in session_stats(
            sessionize(ev, key_col="user_id", ts_col="ts", gap_seconds=1800,
                       tiebreak_cols=("event_id",))
        ).collect()
    }
    assert native == composed
    assert len(native) == 3
    assert native[("u2", datetime.fromisoformat("2026-01-01T09:00:00"))][1] == 2


def test_conversation_progress_closes_on_event_time_timeout(spark, tmp_path):
    src = str(tmp_path / "in")
    # conversation c1 lives across TWO micro-batches (one file drop per
    # processAllAvailable round)
    _write_jsonl(src, "a.jsonl", [
        _turn("c1", 0, "2026-01-01T10:00:00", role="user"),
        _turn("c1", 1, "2026-01-01T10:00:30", role="assistant"),
    ])
    prog = conversation_progress(
        read_transcript_stream(spark, src), gap_seconds=60,
        watermark_delay="1 minute",
    )
    q = _start_memory_query(prog, "prog_sink")
    try:
        q.processAllAvailable()
        # watermark has not passed c1's last turn + gap
        assert spark.sql("SELECT * FROM prog_sink").count() == 0

        # second batch: c1 grows by one turn, and a far-future c2 turn drags
        # the watermark far past c1's (new) last turn + gap -> c1 closes with
        # ALL THREE turns counted (state carried across batches)
        _write_jsonl(src, "b.jsonl", [
            _turn("c1", 2, "2026-01-01T10:01:00", role="user"),
            _turn("c2", 0, "2026-01-01T12:00:00", role="user"),
        ])
        q.processAllAvailable()
        closed = {r["conv_id"]: r
                  for r in spark.sql("SELECT * FROM prog_sink").collect()}
    finally:
        q.stop()
    assert "c1" in closed
    c1 = closed["c1"]
    assert c1["n_turns"] == 3
    assert c1["started_at"] == datetime.fromisoformat("2026-01-01T10:00:00")
    assert c1["ended_at"] == datetime.fromisoformat("2026-01-01T10:01:00")
    assert c1["last_role"] == "user"
    assert c1["closed_by"] == "timeout"
    # c2 is still open (nothing after it to advance the watermark)
    assert "c2" not in closed


def test_conversation_progress_rejects_batch_frames(spark):
    import pytest

    ev = spark.createDataFrame(
        [("c1", 0, "user", "t", None, datetime.fromisoformat("2026-01-01T10:00:00"))],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz",
    )
    with pytest.raises(ValueError, match="streaming"):
        conversation_progress(ev)


def test_turn_rate_windows_batch_mode_backfill(spark):
    """The same turn_rate_windows call runs in BATCH (watermark no-op):
    one code path for live dashboard and backfill."""
    ev = spark.createDataFrame(
        [("user", datetime.fromisoformat("2026-01-01T10:00:10")),
         ("user", datetime.fromisoformat("2026-01-01T10:02:10")),
         ("assistant", datetime.fromisoformat("2026-01-01T10:03:10")),
         ("user", datetime.fromisoformat("2026-01-01T10:07:00"))],
        "role string, ts timestamp_ntz",
    )
    rows = {(r["role"], r["window_start"]): r["n_events"]
            for r in turn_rate_windows(ev, key_col="role").collect()}
    w0 = datetime.fromisoformat("2026-01-01T10:00:00")
    w1 = datetime.fromisoformat("2026-01-01T10:05:00")
    assert rows == {("user", w0): 2, ("assistant", w0): 1, ("user", w1): 1}


def test_start_live_stats_drain_incremental(spark, tmp_path):
    """Drain mode: first drain leaves the conversation OPEN (no later event
    to advance the watermark) and emits no closed rows; a second drain with
    later data closes it — state carries in the checkpoint across drains,
    the same contract as the ingest front."""
    from lab02_citation_matching_and_entity_resolution_spark.sources.tables import (
        TableStore,
    )
    from lab02_citation_matching_and_entity_resolution_spark.streaming.live_stats import (
        start_live_stats_drain,
    )

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "stats_ckpt")
    store = TableStore(spark, str(tmp_path / "tables"))
    _write_jsonl(src, "a.jsonl", [
        _turn("c1", 0, "2026-01-01T10:00:00", role="user"),
        _turn("c1", 1, "2026-01-01T10:00:40", role="assistant"),
    ])

    def drain():
        qs = start_live_stats_drain(
            read_transcript_stream(spark, src), store, ckpt,
            gap_seconds=60, watermark_delay="1 minute",
        )
        for q in qs:
            assert q.awaitTermination(120)

    drain()
    # nothing closed yet; rate table may hold only the window the no-data
    # batch's watermark already passed (none here)
    def n(table):
        try:
            return store.read(table).count() if store.exists(table) else 0
        except Exception:
            return 0
    assert n("conversations_closed") == 0

    _write_jsonl(src, "b.jsonl", [
        _turn("c2", 0, "2026-01-01T12:00:00", role="user"),
    ])
    drain()
    closed = {r["conv_id"]: r for r in store.read("conversations_closed").collect()}
    assert list(closed) == ["c1"]
    assert closed["c1"]["n_turns"] == 2
    assert closed["c1"]["closed_by"] == "timeout"
    # the 10:00-10:05 window closed once the far-future turn advanced the
    # watermark: both roles' counts present
    rates = {(r["role"],): r["n_events"]
             for r in store.read("turn_rate_5m").collect()}
    assert rates[("user",)] == 1 and rates[("assistant",)] == 1
