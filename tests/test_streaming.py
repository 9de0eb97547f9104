from __future__ import annotations

from pyspark.sql import functions as F

from big_data_processing_spark.plans.extension_queries import q_events_hourly
from big_data_processing_spark.streaming.windowed import (
    hourly_event_counts,
    read_event_stream,
    run_stream_to_memory,
)
from tests.conftest import SF0001


def test_streaming_matches_batch_twin(spark):
    """The watermarked streaming agg over the full file equals the
    oracle-checked batch query (same logical plan, incremental)."""
    stream = read_event_stream(spark, SF0001)
    agg = hourly_event_counts(stream)
    got = run_stream_to_memory(agg, "hourly_smoke", output_mode="append")

    expected = q_events_hourly(spark, SF0001).withColumnRenamed(
        "n_events", "n_events"
    )
    g = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in got.collect()
    }
    e = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in expected.collect()
    }
    # append mode emits only watermark-finalized windows — the last
    # window(s) may be withheld; everything emitted must match batch.
    assert len(g) > 0
    for key, val in g.items():
        assert e[key] == val
    missing = set(e) - set(g)
    max_emitted = max(k[0] for k in g) if g else None
    assert all(k[0] >= max_emitted for k in missing)


def test_streaming_is_incremental(spark):
    stream = read_event_stream(spark, SF0001, max_files_per_trigger=1)
    assert stream.isStreaming


def test_stateful_sessionize_stream_matches_batch(spark):
    """Closed sessions emitted by the applyInPandasWithState operator
    equal the batch sessionize twin's non-final sessions."""
    from big_data_processing_spark.operators.windows import sessionize
    from big_data_processing_spark.sources.catalog import load_table
    from big_data_processing_spark.streaming.stateful import (
        sessionize_stream,
    )

    stream = read_event_stream(spark, SF0001)
    sessions = sessionize_stream(stream, gap_minutes=30.0)
    got = run_stream_to_memory(sessions, "sessions_smoke")

    events = load_table(spark, SF0001, "events")
    batch = sessionize(events, "user_id", "ts", 30.0, tiebreak=["event_id"])
    agg = (
        batch.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    # the stream withholds each user's final (still-open) session
    last_per_user = {}
    for r in agg:
        cur = last_per_user.get(r.user_id)
        if cur is None or r.session_id > cur.session_id:
            last_per_user[r.user_id] = r
    expected_closed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in agg
        if last_per_user[r.user_id].session_id != r.session_id
    }
    emitted = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    }
    assert emitted == expected_closed
    assert len(emitted) > 0
