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
