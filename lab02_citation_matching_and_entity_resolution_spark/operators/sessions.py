"""Gap-based sessionization of timestamped per-key streams (batch).

The reference has no session concept (its unit of work is a whole paper /
conversation), but the engine's transcript substrate is timestamped turn
records, and the standard large-scale question over those — "split each
conversation (or each user's event stream) into sessions wherever activity
pauses longer than a gap" — is exactly the lag-window + running-sum idiom
Spark executes as ONE hash-partition-by-key shuffle with no global sort:

    boundary(row)  = ts - lag(ts) over (key ORDER BY ts, tiebreak) > gap
    session_idx    = running sum of boundary within the key
    session_id     = key '#' session_idx

Scale: the only shuffle is the window's hash partitioning on ``key_col``;
per-key order is a within-partition sort, so 10^12 rows sessionize with
work proportional to rows and no driver-side state.  Skew caveat: one
pathological key = one task, same story (and same mitigation: upstream
cap/salt) as every per-key window in this engine.

The streaming analogue (stateful, event-time timeout) lives in
``streaming.live_stats.conversation_progress``; its per-batch semantics are
pinned against THIS operator in tests/test_streaming_live_stats.py so the
two paths cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ntz_epoch_micros(c: Column) -> Column:
    """Microseconds since epoch (LONG, exact) for a TIMESTAMP_NTZ column,
    computed WITHOUT a timezone interpretation.

    ``unix_micros``/``cast("double")`` reject TIMESTAMP_NTZ outright, and
    routing through ``cast("timestamp")`` interprets the wall time in the
    session timezone — differences then shift across DST boundaries, a
    correctness bug a UTC-only test box never sees.  Decomposing into
    date-diff days + HOUR/MINUTE/SECOND extracts is exact (SECOND carries
    the microsecond fraction as DECIMAL(8,6); ×1e6 and the LONG cast are
    exact) and purely arithmetic, so it stays inside whole-stage codegen.

    LONG (not DOUBLE) is the boundary-comparison type on purpose: at ~2e9
    epoch seconds a DOUBLE epoch-seconds representation carries up to
    ~1.2e-7 s rounding per value, so a pause of EXACTLY the gap with
    fractional-microsecond timestamps could compute to gap+2.4e-7 and
    spuriously split (round-5 ADVICE).  Integer microseconds make the
    strictly-greater gap comparison exact, and match DuckDB's
    ``epoch_us(ts)`` BIGINT bit-for-bit.
    """
    days = F.datediff(c.cast("date"), F.to_date(F.lit("1970-01-01")))
    return (
        days.cast("long") * F.lit(86_400_000_000).cast("long")
        + F.hour(c).cast("long") * F.lit(3_600_000_000).cast("long")
        + F.minute(c).cast("long") * F.lit(60_000_000).cast("long")
        + (F.extract(F.lit("SECOND"), c) * F.lit(1_000_000)).cast("long")
    )


def ntz_epoch_seconds(c: Column) -> Column:
    """Seconds since epoch (DOUBLE) for a TIMESTAMP_NTZ column — the exact
    LONG microsecond count divided once by 1e6, so two timestamps' DIFFERENCE
    taken in micros first is exact; use this only where a seconds-unit DOUBLE
    is the output contract (durations), never for boundary comparisons
    (use :func:`ntz_epoch_micros`)."""
    return ntz_epoch_micros(c).cast("double") / F.lit(1_000_000.0)


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_cols: tuple[str, ...] = (),
    out_idx_col: str = "session_idx",
    out_id_col: str = "session_id",
) -> DataFrame:
    """Assign each row a per-key session index and a globally unique
    session id.  A row starts a NEW session when it is the key's first row
    or when its gap to the previous row is STRICTLY greater than
    ``gap_seconds`` (a pause of exactly the threshold keeps the session).

    ``tiebreak_cols`` make the within-key order total when timestamps tie —
    pass the natural sequence column (event_id, turn_idx).  Ties left
    unbroken would make boundary placement nondeterministic across runs;
    the caller owns choosing a real tiebreaker.

    NULL timestamps: each NULL-ts row starts its own session (lag sees NULL
    -> boundary fires), ordered first within the key (Spark ASC default is
    NULLS FIRST; the DuckDB oracles spell ``NULLS FIRST`` explicitly since
    DuckDB's ASC default is NULLS LAST — the NULL path is parity-witnessed
    by the ``sess_gap_assign_null_ts`` catalog query).  Filter or default
    NULL ts upstream if rows must not session alone.
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # integer-microsecond subtraction: the strictly-greater boundary is
    # EXACT (no double rounding at a pause of exactly gap_seconds)
    gap = ntz_epoch_micros(F.col(ts_col)) - ntz_epoch_micros(prev_ts)
    boundary = F.when(
        prev_ts.isNull() | (gap > F.lit(int(gap_seconds) * 1_000_000).cast("long")),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.withColumn(
        out_idx_col, F.sum(boundary).over(run).cast("long")
    )
    return out.withColumn(
        out_id_col,
        F.concat_ws("#", F.col(key_col).cast("string"), F.col(out_idx_col).cast("string")),
    )


def session_stats(
    sessions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "session_id",
    idx_col: str = "session_idx",
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Per-session rollup of a ``sessionize`` output: bounds, row count,
    duration.  One map-side-combinable groupBy on the session id — the agg
    keys are a refinement of the window's partition key, so AQE/codegen get
    a plain partial-agg plan with no second wide shuffle of the full rows.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("started_at"),
        F.max(ts_col).alias("ended_at"),
        # micros first, ONE division: fl(exact_long / 1e6) matches DuckDB's
        # (epoch_us(max)-epoch_us(min))/1e6 bit-for-bit
        (
            (F.max(ntz_epoch_micros(F.col(ts_col))) - F.min(ntz_epoch_micros(F.col(ts_col))))
            .cast("double") / F.lit(1_000_000.0)
        ).alias("duration_sec"),
    ]
    if extra_aggs:
        aggs.extend(extra_aggs)
    return sessions.groupBy(key_col, id_col, idx_col).agg(*aggs)
