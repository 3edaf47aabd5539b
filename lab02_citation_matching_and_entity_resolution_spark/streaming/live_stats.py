"""Streaming live statistics over the transcript/event stream.

The batch engine answers "what happened" (SURVEY §2.4 aggregations,
operators/sessions.py sessionization); this module answers the same
questions ON THE LIVE STREAM with Structured Streaming's native state
machinery — the reference has no streaming at all (SURVEY §2.10), so like
streaming/ingest.py this is engine-original capability, kept deliberately
thin and pinned to the batch semantics by parity tests
(tests/test_streaming_live_stats.py).

Three operators, in the engine's (a)-composition-first discipline:

  turn_rate_windows       watermarked tumbling-window counts per key — the
                          canonical late-data-tolerant windowed agg, 100%
                          JVM-side (groupBy(window(ts), key).count()).
  session_rollup_stream   gap-based session aggregation via the NATIVE
                          ``session_window`` (Spark 3.2+): state store
                          managed by the engine, map-side partial merge,
                          no Python in the loop.  Same gap rule as
                          operators/sessions.sessionize (a pause STRICTLY
                          greater than the gap splits; see the parity
                          test for the boundary pin).
  conversation_progress   applyInPandasWithState — custom per-conversation
                          state the built-ins cannot express (running turn
                          count + role trail, event-time-timeout close-out
                          emitting one summary row per closed
                          conversation).  This is the (b) tier: Arrow-
                          batched pandas state function, one state row per
                          open conversation.

Scale notes: all three shuffle once on the grouping key into the state
store; watermarks bound state (windows/sessions/conversations older than
the watermark are evicted/closed), so state size tracks the number of
LIVE keys, not stream history.  The stateful operators require a
watermark — they raise loudly without one rather than let state grow
unboundedly.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _require_watermarkable(df: DataFrame, ts_col: str) -> None:
    if ts_col not in df.columns:
        raise ValueError(f"timestamp column {ts_col!r} not in {df.columns}")


def turn_rate_windows(
    stream: DataFrame,
    key_col: str = "role",
    ts_col: str = "ts",
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window event counts per key with a late-data watermark.

    Append-mode friendly: a window's row is emitted exactly once, when the
    watermark passes its end.  Late rows inside the delay are counted;
    later ones are dropped by the engine (the documented trade — the
    watermark bounds both state and lateness).

    Works on a BATCH frame too (withWatermark is a no-op there): the same
    call is then a plain tumbling-window groupBy — one code path for the
    live dashboard and its backfill (parity pinned in
    tests/test_streaming_live_stats.py).
    """
    _require_watermarkable(stream, ts_col)
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_rollup_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Gap-based session aggregation with the native ``session_window``.

    The streaming analogue of operators/sessions.session_stats: the state
    store merges events into [first_ts, last_ts + gap) sessions per key and
    finalizes a session when the watermark passes its end.  All JVM-side —
    this is the scale path for streaming sessionization; the
    applyInPandasWithState variant below exists only for state the
    built-in cannot hold.

    Works in BATCH mode too (session_window is a plain grouping expression
    there) — the parity test runs it in batch against sessionize().
    """
    _require_watermarkable(stream, ts_col)
    grouped = stream
    if grouped.isStreaming:
        grouped = grouped.withWatermark(ts_col, watermark_delay)
    return (
        grouped.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("started_at"),
            F.max(ts_col).alias("ended_at"),
        )
        .select(
            key_col,
            "started_at",
            "ended_at",
            "n_events",
            F.col("sess.start").alias("window_start"),
            F.col("sess.end").alias("window_end"),
        )
    )


# --- applyInPandasWithState conversation tracker --------------------------

PROGRESS_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("started_at", TimestampNTZType()),
        StructField("ended_at", TimestampNTZType()),
        StructField("last_role", StringType()),
        StructField("closed_by", StringType()),
    ]
)

_PROGRESS_STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("started_us", LongType()),
        StructField("ended_us", LongType()),
        StructField("last_role", StringType()),
    ]
)

_US = 1_000_000


def _progress_fn_factory(gap_seconds: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, started_us, ended_us, last_role = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [n_turns],
                    "started_at": [pd.Timestamp(started_us, unit="us")],
                    "ended_at": [pd.Timestamp(ended_us, unit="us")],
                    "last_role": [last_role],
                    "closed_by": ["timeout"],
                }
            )
            return
        n_turns, started_us, ended_us, last_role = (
            state.get if state.exists else (0, None, None, None)
        )
        for pdf in pdfs:
            if pdf.empty:
                continue
            # deterministic event order inside the batch: (ts, turn_idx)
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            # unit-safe micros: normalize to datetime64[us] FIRST (pandas/
            # Arrow may hand us ns- or us-resolution depending on version)
            us = pdf["ts"].astype("datetime64[us]").astype("int64")
            n_turns += len(pdf)
            first_us, last_us = int(us.iloc[0]), int(us.iloc[-1])
            started_us = first_us if started_us is None else min(started_us, first_us)
            if ended_us is None or last_us >= ended_us:
                ended_us = last_us
                last_role = str(pdf["role"].iloc[-1])
        state.update((n_turns, started_us, ended_us, last_role))
        # close the conversation when event time passes last turn + gap:
        # setTimeoutTimestamp takes epoch MILLIS and fires when the
        # watermark crosses it.  A batch so late that last_turn + gap is
        # already behind the watermark must still set a LEGAL timeout
        # (Spark rejects timestamps <= watermark), so clamp forward — the
        # conversation then closes at the next watermark advance.
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(ended_us // 1000 + gap_seconds * 1000, wm_ms + 1)
        )
        return
        yield  # makes fn a generator even on the no-emit path

    return fn


def conversation_progress(
    stream: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-conversation running state with event-time-timeout close-out.

    Emits ONE summary row per conversation when no turn has arrived for
    ``gap_seconds`` of event time (watermark-driven): (conv_id, n_turns,
    started_at, ended_at, last_role, closed_by).  State per open
    conversation is four scalars — bounded by live conversations, not
    history.

    This is the (b)-tier custom stateful operator: the role trail /
    running count across micro-batches is state ``session_window`` cannot
    carry.  Requires a streaming DataFrame; the batch analogue is
    operators/sessions.sessionize + session_stats (parity-pinned in
    tests/test_streaming_live_stats.py).
    """
    if not stream.isStreaming:
        raise ValueError(
            "conversation_progress requires a streaming DataFrame; use "
            "operators.sessions for batch"
        )
    _require_watermarkable(stream, ts_col)
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _progress_fn_factory(gap_seconds),
            outputStructType=PROGRESS_OUTPUT_SCHEMA,
            stateStructType=_PROGRESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def start_live_stats_drain(
    stream: DataFrame,
    store,
    checkpoint_root: str,
    rate_table: str = "turn_rate_5m",
    closed_table: str = "conversations_closed",
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    gap_seconds: int = 1800,
):
    """Attach the two live-stats queries to a turn stream in availableNow
    (drain/backfill) mode: watermarked per-role window counts appended to
    ``rate_table`` and timeout-closed conversation summaries appended to
    ``closed_table``.  Returns the two started queries; the caller awaits
    both.

    Sinks are parquet path sinks under the TableStore root (readable with
    ``store.read`` afterwards); on an Iceberg-configured cluster the same
    frames go to ``writeStream.toTable`` instead — the operators are
    sink-agnostic.  Checkpoints live under ``<checkpoint_root>/rate`` and
    ``/closed``, so repeated drains resume: a conversation left OPEN by one
    drain (no later event to advance the watermark past its last turn +
    gap) closes in a later drain once such data arrives — state carries in
    the checkpoint, the same contract as the ingest front.
    """
    import os

    rate = turn_rate_windows(
        stream, key_col="role", window_duration=window_duration,
        watermark_delay=watermark_delay,
    )
    q_rate = (
        rate.writeStream.format("parquet")
        .option("path", store.sink_path(rate_table))
        .option("checkpointLocation", os.path.join(checkpoint_root, "rate"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    closed = conversation_progress(
        stream, gap_seconds=gap_seconds, watermark_delay=watermark_delay
    )
    q_closed = (
        closed.writeStream.format("parquet")
        .option("path", store.sink_path(closed_table))
        .option("checkpointLocation", os.path.join(checkpoint_root, "closed"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return q_rate, q_closed
