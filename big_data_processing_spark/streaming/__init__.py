from big_data_processing_spark.streaming.windowed import (
    hourly_event_counts,
    read_event_stream,
    run_stream_to_memory,
)

__all__ = [
    "read_event_stream",
    "hourly_event_counts",
    "run_stream_to_memory",
]
