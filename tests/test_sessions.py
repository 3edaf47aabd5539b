"""Batch sessionization (operators/sessions.py): boundary semantics, tie
determinism, and the stats rollup."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from lab02_citation_matching_and_entity_resolution_spark.operators.sessions import (
    ntz_epoch_seconds,
    session_stats,
    sessionize,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, u, datetime.fromisoformat(ts)) for i, (u, ts) in enumerate(rows)],
        "event_id long, user_id string, ts timestamp_ntz",
    )


def test_gap_strictly_greater_splits(spark):
    # 30s gap: a pause of EXACTLY 30s keeps the session; 30.000001s splits
    df = _events(
        spark,
        [
            ("u1", "2026-01-01T10:00:00"),
            ("u1", "2026-01-01T10:00:30"),          # +30s  -> same session
            ("u1", "2026-01-01T10:01:00.000001"),   # +30.000001s -> NEW
        ],
    )
    out = sessionize(df, key_col="user_id", ts_col="ts", gap_seconds=30,
                     tiebreak_cols=("event_id",))
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {0: 1, 1: 1, 2: 2}


def test_sessions_are_per_key(spark):
    df = _events(
        spark,
        [
            ("a", "2026-01-01T10:00:00"),
            ("b", "2026-01-01T10:00:01"),  # different key: own session 1
            ("a", "2026-01-01T12:00:00"),  # >gap after a's last -> session 2
        ],
    )
    out = sessionize(df, key_col="user_id", ts_col="ts", gap_seconds=1800,
                     tiebreak_cols=("event_id",))
    got = {(r["user_id"], r["event_id"]): (r["session_idx"], r["session_id"])
           for r in out.collect()}
    assert got[("a", 0)] == (1, "a#1")
    assert got[("b", 1)] == (1, "b#1")
    assert got[("a", 2)] == (2, "a#2")


def test_timestamp_ties_broken_deterministically(spark):
    # two rows at the identical ts: the tiebreak column decides the order,
    # so session assignment cannot flap between runs
    df = _events(
        spark,
        [
            ("u", "2026-01-01T10:00:00"),
            ("u", "2026-01-01T10:00:00"),
        ],
    )
    out = sessionize(df, key_col="user_id", ts_col="ts", gap_seconds=30,
                     tiebreak_cols=("event_id",))
    rows = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert rows == {0: 1, 1: 1}


def test_session_stats_rollup(spark):
    df = _events(
        spark,
        [
            ("u", "2026-01-01T10:00:00"),
            ("u", "2026-01-01T10:10:00"),
            ("u", "2026-01-01T20:00:00"),  # new session
        ],
    )
    sess = sessionize(df, key_col="user_id", ts_col="ts", gap_seconds=1800,
                      tiebreak_cols=("event_id",))
    stats = {r["session_id"]: r for r in session_stats(sess).collect()}
    assert stats["u#1"]["n_events"] == 2
    assert stats["u#1"]["duration_sec"] == pytest.approx(600.0)
    assert stats["u#1"]["started_at"] == datetime.fromisoformat("2026-01-01T10:00:00")
    assert stats["u#1"]["ended_at"] == datetime.fromisoformat("2026-01-01T10:10:00")
    assert stats["u#2"]["n_events"] == 1
    assert stats["u#2"]["duration_sec"] == pytest.approx(0.0)


def test_ntz_epoch_seconds_microsecond_exact(spark):
    df = spark.createDataFrame(
        [(datetime.fromisoformat("2026-08-17T23:59:59.999999"),),
         (datetime.fromisoformat("1970-01-01T00:00:00"),)],
        "ts timestamp_ntz",
    )
    got = sorted(r[0] for r in df.select(ntz_epoch_seconds(F.col("ts"))).collect())
    assert got[0] == 0.0
    from datetime import timezone

    expected = datetime.fromisoformat("2026-08-17T23:59:59.999999").replace(
        tzinfo=timezone.utc
    ).timestamp()
    assert got[1] == pytest.approx(expected, abs=1e-6)


def test_single_shuffle_plan(spark):
    """Scale pin: sessionize adds exactly ONE exchange (hash by key) — no
    global sort, no second shuffle for the running sum."""
    df = _events(spark, [("u", "2026-01-01T10:00:00")])
    plan = sessionize(
        df, key_col="user_id", ts_col="ts", gap_seconds=60,
        tiebreak_cols=("event_id",),
    )._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_cross_implementation_witness_random_events(spark):
    """Independent plain-Python greedy sessionizer vs the Spark window
    implementation over seeded adversarial data: microsecond-fraction
    timestamps, duplicate timestamps (tiebreak), and pauses planted exactly
    AT the gap (must merge: strictly-greater splits)."""
    import random
    from datetime import timedelta

    rng = random.Random(23120334)
    gap = 300  # 5 minutes
    rows = []
    eid = 0
    for u in range(12):
        t = datetime.fromisoformat("2026-03-01T00:00:00")
        for _ in range(rng.randint(1, 60)):
            choice = rng.random()
            if choice < 0.15:
                step_us = gap * 1_000_000            # exactly the gap: merge
            elif choice < 0.25:
                step_us = gap * 1_000_000 + 1        # 1us over: split
            elif choice < 0.35:
                step_us = 0                          # duplicate ts: tiebreak
            else:
                step_us = rng.randint(1, 2 * gap * 1_000_000)
            t = t + timedelta(microseconds=step_us)
            rows.append((eid, f"u{u}", t))
            eid += 1

    # independent reference: greedy scan in event order per user
    ref = {}
    by_user = {}
    for e, u, t in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        last, idx = by_user.get(u, (None, 0))
        if last is None or (t - last).total_seconds() > gap:
            idx += 1
        by_user[u] = (t, idx)
        ref[e] = (u, idx)

    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp_ntz")
    out = sessionize(df, key_col="user_id", ts_col="ts", gap_seconds=gap,
                     tiebreak_cols=("event_id",))
    got = {r["event_id"]: (r["user_id"], r["session_idx"]) for r in out.collect()}
    assert got == ref
