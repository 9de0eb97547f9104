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

# Per-BUCKET state: the per-user (session_start_ns, last_ts_ns,
# n_events, total_value) rows of every active user hashing to the
# bucket, as parallel arrays (one state row per bucket, not per
# user — see sessionize_stream).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("user_ids", T.ArrayType(T.LongType())),
        T.StructField("start_ns", T.ArrayType(T.LongType())),
        T.StructField("last_ns", T.ArrayType(T.LongType())),
        T.StructField("n_events", T.ArrayType(T.LongType())),
        T.StructField("total_value", T.ArrayType(T.DoubleType())),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-user gap sessionization over a stream of
    (user_id, ts, value) rows: emits (user_id, session_start,
    session_end, n_events, total_value) for every CLOSED session —
    a session closes when a later event for the same user arrives
    more than ``gap_minutes`` after its last event. The (single)
    still-open session per user remains in state, exactly like the
    batch twin's final session before end-of-input.

    The stream is grouped by ``pmod(user_id, n_buckets)`` — a USER
    BUCKET — not by user, and one kernel call sessionizes every
    user of the bucket present in the micro-batch (r12, guide §4):
    ``applyInPandasWithState`` invokes the Python kernel and round-
    trips the state row ONCE PER GROUP per micro-batch, so per-user
    grouping paid that fixed cost per active user (measured at
    sf0.1: 1500 users × 4 micro-batches = 6000 kernel calls
    dominating the query; bucketed it is ``n_buckets`` calls per
    batch). Per-user state rides the bucket's state row as parallel
    arrays. The per-user event-order arithmetic is unchanged — each
    user's events are still walked in ascending-ts order with the
    same fold — so emitted rows are identical to the per-user
    grouping. At scale, buckets keep state rows bounded by setting
    ``n_buckets`` ∝ expected concurrent users (the registered query
    ties it to the volume-derived state-store count)."""
    gap_ns = int(gap_minutes * 60 * 1e9)

    def kernel(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            users, starts, lasts, counts, totals = state.get
            st: dict[int, list] = {
                int(u): [s, ls, n, t]
                for u, s, ls, n, t in zip(users, starts, lasts, counts,
                                          totals)
            }
        else:
            st = {}

        closed: list[tuple[int, int, int, int, float]] = []
        for pdf in pdfs:
            # stable sort: per user ascending ts — (user, ts) pairs
            # are unique in this corpus family, and equal-ts events
            # share a session by contract either way
            pdf = pdf.sort_values(["user_id", "ts"], kind="mergesort")
            uid_arr = pdf["user_id"].to_numpy()
            ts_ns = pdf["ts"].astype("int64").to_numpy()
            vals = pdf["value"].fillna(0.0).to_numpy()
            n = len(uid_arr)
            lo = 0
            while lo < n:
                hi = lo
                u = int(uid_arr[lo])
                while hi < n and uid_arr[hi] == u:
                    hi += 1
                s = st.get(u)
                if s is None:
                    start_ns = last_ns = -1
                    n_events, total_value = 0, 0.0
                else:
                    start_ns, last_ns, n_events, total_value = s
                # identical per-event fold to the per-user kernel:
                # same branch structure, same float addition order
                for t, v in zip(ts_ns[lo:hi], vals[lo:hi]):
                    if start_ns < 0:
                        start_ns, last_ns = t, t
                        n_events, total_value = 1, float(v)
                    elif t - last_ns > gap_ns:
                        closed.append(
                            (u, start_ns, last_ns, n_events, total_value)
                        )
                        start_ns, last_ns = t, t
                        n_events, total_value = 1, float(v)
                    else:
                        last_ns = t
                        n_events += 1
                        total_value += float(v)
                st[u] = [int(start_ns), int(last_ns), n_events,
                         total_value]
                lo = hi

        items = sorted(st.items())
        state.update((
            [u for u, _ in items],
            [s[0] for _, s in items],
            [s[1] for _, s in items],
            [s[2] for _, s in items],
            [s[3] for _, s in items],
        ))
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

    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id", "ts", "value",
            F.pmod("user_id", F.lit(n_buckets)).alias("__bucket"),
        )
        .groupBy("__bucket")
        .applyInPandasWithState(
            kernel,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
