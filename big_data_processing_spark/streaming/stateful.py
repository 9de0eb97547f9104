"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (north-star extension — the reference has
no streaming at all, SURVEY.md §2.8).

This is the pattern for operators Structured Streaming's built-in
windows can't express: arbitrary per-key state evolved batch-by-batch
by an Arrow-batched Python kernel. The batch twin is
``operators/windows.sessionize`` (oracle-checked via the
``user_sessions`` query); this streaming form emits each session as
a row the moment a later event proves it closed.

Scale notes
-----------
- State is one fixed-width row per ACTIVE user (4 longs + a double),
  partitioned by the group key — bounded by concurrent users, not by
  event volume; the state store shuffles with the key, so adding
  executors rescales state.
- The kernel sees Arrow record batches per key group (vectorized
  pandas ops, no per-row Python loop over the wire).
- This demo assumes per-user event-time order across micro-batches
  (true for replayed logs / a single landing file). A production
  out-of-order variant holds a small event buffer in state and
  closes sessions on event-time timeout
  (``GroupStateTimeout.EventTimeTimeout``) — same operator shape.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# (session_start_ns, last_ts_ns, n_events, total_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ns", T.LongType()),
        T.StructField("last_ns", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame, gap_minutes: float = 30.0
) -> DataFrame:
    """Per-user gap sessionization over a stream of
    (user_id, ts, value) rows: emits (user_id, session_start,
    session_end, n_events, total_value) for every CLOSED session —
    a session closes when a later event for the same user arrives
    more than ``gap_minutes`` after its last event. The (single)
    still-open session per user remains in state, exactly like the
    batch twin's final session before end-of-input.
    """
    gap_ns = int(gap_minutes * 60 * 1e9)

    def kernel(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_ns, last_ns, n_events, total_value = state.get
        else:
            start_ns = last_ns = -1
            n_events, total_value = 0, 0.0

        closed: list[tuple[int, int, int, int, float]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            ts_ns = pdf["ts"].astype("int64").to_numpy()
            vals = pdf["value"].fillna(0.0).to_numpy()
            for t, v in zip(ts_ns, vals):
                if start_ns < 0:
                    start_ns, last_ns = t, t
                    n_events, total_value = 1, float(v)
                elif t - last_ns > gap_ns:
                    closed.append(
                        (user_id, start_ns, last_ns, n_events, total_value)
                    )
                    start_ns, last_ns = t, t
                    n_events, total_value = 1, float(v)
                else:
                    last_ns = t
                    n_events += 1
                    total_value += float(v)

        state.update((int(start_ns), int(last_ns), n_events, total_value))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "total_value",
                ],
            )
            out["session_start"] = pd.to_datetime(out["session_start"])
            out["session_end"] = pd.to_datetime(out["session_end"])
            yield out

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            kernel,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
