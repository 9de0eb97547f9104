"""Measure sustained Structured-Streaming throughput through the
watermarked windowed-agg path (r8 verdict #6: the parity queries
prove the streaming plans CORRECT; this prints the rows/sec number
that belongs beside that proof in SCALE.md).

What it does:
1. Re-chunks the corpus ``events`` table into an N-file parquet
   landing zone (scratch dir) — a single-file source gives
   ``maxFilesPerTrigger`` nothing to meter, so the one-table corpus
   layout would otherwise collapse the run into one micro-batch.
2. Streams it through ``read_event_stream`` →
   ``hourly_event_counts`` (the same watermark + 1-hour tumbling
   window plan the value-checked ``streaming_hourly_parity`` query
   runs) into a foreachBatch null sink (count-only: sink cost would
   measure the sink, not the operator).
3. Reports rows/sec two ways: END-TO-END (wall clock from
   ``start()`` to ``processAllAvailable()`` — includes stream
   bring-up, listing, every micro-batch's planning) and
   STEADY-STATE (input rows / summed batch durations from
   ``recentProgress``, excluding the first batch, which pays
   state-store + codegen bring-up).

Usage::

    python tools/stream_throughput.py \
        [sf_dir] [n_files] [files_per_trigger] [shuffle_partitions]

defaults: /root/testdata/sf0.1, 16 files, 2 files per trigger
(→ 8 micro-batches of ~12.5K rows each at sf0.1), session-default
shuffle partitions. The 4th arg overrides
``spark.sql.shuffle.partitions`` for the window-key exchange (r9
verdict #6: the state-store partition count is pinned per
checkpoint, so each run gets a fresh scratch checkpoint keyed by
the full parameter tuple).

Throughput scales with executor count until the per-micro-batch
fixed cost (~0.1-0.3 s scheduling + state-store commit) dominates;
at 100 TB the lever is bigger files-per-trigger (bigger
micro-batches amortize the fixed cost) and more shuffle partitions
for the window-key exchange, not more triggers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    per_trigger = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    shuffle_parts = int(sys.argv[4]) if len(sys.argv) > 4 else None

    from big_data_processing_spark import get_spark
    from big_data_processing_spark.sources.catalog import load_table
    from big_data_processing_spark.sources.maintenance import scratch_dir
    from big_data_processing_spark.streaming.windowed import (
        hourly_event_counts,
        read_event_stream,
    )

    spark = get_spark(app_name="stream-throughput")
    if shuffle_parts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    work = scratch_dir(
        "stream_tp", f"{sf_dir}:{n_files}:{per_trigger}:{shuffle_parts}"
    )
    land, ckpt = f"{work}/landing", f"{work}/ckpt"

    events = load_table(spark, sf_dir, "events")
    n_rows = events.count()
    # deterministic N-file landing zone; repartition(N) (not
    # coalesce) so every file carries ~equal rows and each trigger's
    # micro-batch has a stable size
    events.repartition(n_files).write.mode("overwrite").parquet(land)

    stream = read_event_stream(
        spark, land, max_files_per_trigger=per_trigger,
        glob="part-*.parquet",
    )
    agg = hourly_event_counts(stream)

    def sink(batch_df, batch_id):  # count-only: don't measure a sink
        batch_df.count()

    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        wall = time.perf_counter() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()

    batches = [
        {
            "batch_id": p["batchId"],
            "input_rows": p["numInputRows"],
            "batch_ms": p["batchDuration"],
        }
        for p in prog
        if p["numInputRows"] > 0
    ]
    steady = [b for b in batches[1:]] or batches
    steady_rows = sum(b["input_rows"] for b in steady)
    steady_ms = sum(b["batch_ms"] for b in steady)
    out = {
        "metric": "streaming_windowed_agg_throughput",
        "sf_dir": sf_dir,
        "n_rows": n_rows,
        "n_files": n_files,
        "files_per_trigger": per_trigger,
        "shuffle_partitions": int(
            spark.conf.get("spark.sql.shuffle.partitions")
        ),
        "n_batches": len(batches),
        "wall_sec": round(wall, 3),
        "rows_per_sec_end_to_end": round(n_rows / wall, 1),
        "rows_per_sec_steady_state": round(
            steady_rows / (steady_ms / 1000.0), 1
        )
        if steady_ms
        else None,
        "batches": batches,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
