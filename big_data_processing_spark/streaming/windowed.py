"""Structured Streaming operators: watermarked tumbling-window
aggregation over the events stream (north-star extension; the
reference has no streaming at all, SURVEY.md §2.8).

The batch query ``events_hourly`` in plans/extension_queries.py is
the oracle-checked twin of ``hourly_event_counts`` — Structured
Streaming runs the same logical plan incrementally, which is why
the batch/streaming results agree for complete (non-late) input.

Scale notes
-----------
- The watermark bounds state: with a 2-hour watermark and 1-hour
  windows the state store holds ≤ ~3 windows per event_type per
  partition, regardless of total volume.
- File-source streams partition naturally; for Kafka swap
  ``format("parquet")`` for ``format("kafka")`` — the aggregation
  plan is unchanged.
- ``foreachBatch`` is the idiomatic exactly-once sink adapter for
  JDBC/parquet targets at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fallback schema when no file exists yet at stream start (landing-zone
# dir that will be populated later): assume TIMESTAMP(NANOS)-as-long,
# the corpus generator's original shape.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos since epoch
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
    glob: str = "events.parquet",
) -> DataFrame:
    """File-source stream over the corpus directory's events table.

    File streams require a *directory* source; the corpus keeps one
    parquet file per table in one dir, so a glob filter selects just
    the events file. New files matching the glob are picked up
    incrementally — the standard landing-zone ingestion pattern.

    ``ts`` has shipped in three physical shapes across corpus
    generations (TIMESTAMP(NANOS) → nanos-long, TIMESTAMP(MICROS)
    with/without tz). A streaming source needs an explicit schema, so
    probe the footer with a batch read (footer-only, no data scan) and
    declare whatever Spark itself infers — then normalize to one
    session-zone µs timestamp exactly like sources/catalog.load_table."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        probe = (
            spark.read.option("pathGlobFilter", glob).parquet(sf_dir)
        )
        schema, ts_type = probe.schema, dict(probe.dtypes).get("ts")
    except Exception:  # no matching file yet — landing-zone start
        schema, ts_type = EVENTS_STREAM_SCHEMA, "bigint"
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )
    if ts_type == "bigint":  # nanos since epoch → µs timestamp
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def hourly_event_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked 1-hour tumbling-window counts + value sums per
    event_type. Late events beyond the watermark are dropped and
    their windows finalized (state stays bounded)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("win").start.alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_values(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked NATIVE session-window aggregation per user —
    Spark's engine-side gap sessionization (``F.session_window``),
    the built-in twin of the custom ``applyInPandasWithState``
    kernel in streaming/stateful.py. Sessions merge while each next
    event arrives within ``gap`` of the last (measured: an event at
    EXACTLY last+gap still merges — new session only when the gap is
    strictly exceeded, same rule as the custom kernel); the emitted
    window is [first event, last event + gap).

    Scale notes: state is one merging session row per ACTIVE
    (user, session) in the state store, keyed by user — bounded by
    concurrent users, evicted the moment the watermark passes
    session end. All merging happens JVM-side in the session-window
    exec operators — no Python in the loop, unlike the kernel twin
    (whose value is expressing logic session_window can't; when the
    built-in CAN express it, this is the faster, simpler path)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 6).alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.col("w").start.alias("session_start"),
            F.col("w").end.alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_state_partitions(
    spark: SparkSession,
    source_dir: str,
    glob: str = "*.parquet",
    target_bytes: int = 4 << 20,
    floor: int = 4,
) -> int:
    """Scale-ADAPTIVE state-store partition count for a file-backed
    streaming query: ``ceil(input_bytes / target_bytes)`` clamped to
    ``[floor, 10 × defaultParallelism]``, overridable with
    ``SPARK_GRAFT_STREAM_PARTITIONS``.

    Why this exists (r11 optimization, measured): a streaming query
    fixes its state-store count to ``spark.sql.shuffle.partitions``
    at first start, and EVERY stateful micro-batch then pays a fixed
    per-store cost (load/commit/maintenance per store instance) that
    is independent of the data. Stage metrics at sf0.1 showed the
    32-store join-state stage at 61.6 s executorRunTime but 0.68 s
    CPU — pure per-store wait — and 2.2 s/micro-batch at BOTH
    sf0.001 and sf0.1: fixed overhead, not data. Sizing stores by
    INPUT VOLUME instead of core count cut streaming_join_parity
    from ~14 s to ~5 s warm while staying monotone in data size —
    the 100 TB posture (state volume >> target) still gets
    thousands of stores via the same formula, and the env override
    pins it where an operator knows better. State-partition count
    should track state VOLUME, not instantaneous core count — cores
    bound concurrency, not the number of store instances worth
    paying fixed costs for."""
    import glob as globmod
    import math
    import os

    env = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS")
    if env and env.isdigit():
        return int(env)
    nbytes = sum(
        os.path.getsize(p)
        for p in globmod.glob(os.path.join(source_dir, glob))
        if os.path.isfile(p)
    )
    par = spark.sparkContext.defaultParallelism
    return max(floor, min(10 * par, math.ceil(nbytes / target_bytes)))


def run_stream_to_memory(
    agg: DataFrame,
    query_name: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drive a streaming aggregation to completion against a memory
    sink (local smoke-test harness; production uses foreachBatch or
    a file/Kafka sink). Returns the materialized result table.

    ``state_partitions`` (see :func:`stream_state_partitions`) is
    applied as the session's shuffle-partition count for the
    DURATION OF THE START — a streaming query captures the conf at
    start and keeps it for life, so this pins the state-store count
    without disturbing the session's batch setting."""
    spark = agg.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(state_partitions)
        )
    try:
        q = (
            agg.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .start()
        )
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_foreach_batch_parquet(
    agg: DataFrame,
    dest_path: str,
    checkpoint_path: str,
    output_mode: str = "update",
) -> None:
    """Drive a streaming aggregation into a parquet sink via
    ``foreachBatch`` — the idiomatic adapter for sinks without a
    native streaming writer (JDBC, upsert stores). Each micro-batch
    arrives as a plain DataFrame; with the checkpoint location the
    (batch_id, write) pair is recoverable, and an idempotent batch
    writer (partition-by-batch overwrite, or a key-dedup append like
    sources/maintenance.append_new_by_key) upgrades at-least-once
    re-delivery to effectively exactly-once."""
    from pyspark.sql import functions as F

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(dest_path)
        )

    q = (
        agg.writeStream.outputMode(output_mode)
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
