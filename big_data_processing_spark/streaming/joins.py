"""Stream-stream joins: correlate two unbounded streams with
watermark-bounded state — the streaming twin of the batch as-of /
interval join (`operators/joins.py`).

The canonical shape is attribution: join each purchase to the
clicks that preceded it within an attribution window. In batch this
is a range join; in streaming, BOTH sides buffer rows in the state
store until the other side's watermark proves no further match can
arrive, so the join condition MUST include a time bound — an
unbounded equi-join over two streams would hold every row forever.

Scale notes
-----------
- State per side is (rows within the time bound) sharded by the
  equi-join key across executors — independent of stream history.
  The time-range predicate is what lets Spark evict: a side's rows
  are dropped once `other_watermark - bound` passes them.
- Outer stream-stream joins emit unmatched rows only when the
  watermark closes the join window — results are delayed by the
  watermark, which is the correctness/latency dial.
- Both inputs here derive from ONE source stream (filtered by
  event_type), the standard fan-out; with two real topics the plan
  is identical.

No reference counterpart (batch-only surface, SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_gap: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on an equi-key plus the interval
    condition ``right_ts ∈ [left_ts - max_gap, left_ts]`` (right
    event at-or-before left, within the gap).

    Column names must already be disambiguated (no shared names
    besides ``on``). ``how`` may be 'inner' or 'leftOuter' — outer
    matches surface only after the watermark closes the window."""
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[on] == rw[on])
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_gap}"))
    )
    joined = lw.join(rw, cond, how)
    # keep one copy of the key column (both sides carry it)
    return joined.drop(rw[on]) if how == "inner" else joined.withColumn(
        on, F.coalesce(lw[on], rw[on])
    ).drop(lw[on]).drop(rw[on])


def purchase_click_attribution_stream(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribution over the events stream: every (purchase, click)
    pair for the same user where the click happened within
    ``max_gap`` before the purchase. One source stream fanned out by
    event_type into the two join sides."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return interval_join_streams(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        max_gap=max_gap,
        left_watermark=watermark,
        right_watermark=watermark,
    )


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
) -> DataFrame:
    """Stream-static (dimension) enrichment join — the canonical
    streaming lookup pattern: each micro-batch of the stream joins
    the static dimension table as of that batch. No state, no
    watermark requirement — the static side is re-resolvable per
    batch (picks up dimension updates between batches for free with
    a re-read source).

    The dimension is broadcast: at 100 TB stream scale the dim table
    (customers, catalogs) is the small side by construction; a
    non-broadcast stream-static join would shuffle every micro-batch."""
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key]
    )
