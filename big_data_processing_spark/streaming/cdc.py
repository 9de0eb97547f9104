"""Streaming CDC upsert: maintain a latest-row-per-key snapshot
table from an event stream via ``foreachBatch`` merge — the
change-data-capture sink pattern (north-star extension; the
reference has no streaming surface, SURVEY.md §2.8).

Each micro-batch is reduced to its per-key latest row FIRST (a
partial ``max_by`` — batch-sized work), then merged last-writer-wins
into the persistent state table. Production uses an ACID MERGE sink
(Delta/Iceberg ``MERGE INTO``); this local variant emulates the
merge with a read-union-reduce-rewrite of a parquet state dir,
which is the same logical plan a MERGE executes — the swap just
isn't transactional. State size is one row per key, NOT per event:
at 100 TB of events the snapshot is |keys| rows, and the per-batch
merge cost is |batch keys| + |state| with both sides shuffled on
the key (a Delta MERGE additionally prunes untouched files).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key: str, ts_col: str, payload_cols: list[str]
) -> DataFrame:
    """Per-key latest row by ``ts_col`` (``max_by`` on a struct —
    one partial-aggregating shuffle, no window sort)."""
    ordered = F.struct(F.col(ts_col), *[F.col(c) for c in payload_cols])
    return df.groupBy(key).agg(
        F.max(ordered).alias("__latest")
    ).select(
        key,
        F.col(f"__latest.{ts_col}").alias(ts_col),
        *[F.col(f"__latest.{c}").alias(c) for c in payload_cols],
    )


def cdc_upsert_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str,
    ts_col: str,
    payload_cols: list[str],
) -> None:
    """Drive ``stream`` to completion, maintaining ``state_dir`` as
    the latest-per-key snapshot (last-writer-wins upsert)."""
    spark = stream.sparkSession

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        new = latest_per_key(batch_df, key, ts_col, payload_cols)
        if os.path.isdir(state_dir):
            cur = spark.read.parquet(state_dir)
            new = latest_per_key(
                cur.unionByName(new), key, ts_col, payload_cols
            )
        tmp = f"{state_dir}__tmp_{batch_id}"
        new.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(state_dir):
            shutil.rmtree(state_dir)
        os.rename(tmp, state_dir)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(state_dir)


def incremental_agg_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group_cols: list[str],
    count_col: str = "n_events",
    sum_col: str | None = "total_value",
    sum_src: str = "value",
) -> None:
    """Incrementally-maintained materialized aggregate: each
    micro-batch is reduced to per-key partials (count + sum), then
    MERGED into the snapshot by adding partials — the commutative-
    monoid update that makes streaming view maintenance exact
    regardless of how events are batched. Same sink emulation as
    :func:`cdc_upsert_stream` (production: MERGE INTO with
    ``n = s.n + b.n``); state is |groups| rows, per-batch cost is
    |batch groups| + |state|.
    """
    spark = stream.sparkSession

    def partials(df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("long").alias(count_col)]
        if sum_col:
            aggs.append(F.sum(sum_src).alias(sum_col))
        return df.groupBy(*group_cols).agg(*aggs)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        new = partials(batch_df)
        if os.path.isdir(state_dir):
            cur = spark.read.parquet(state_dir)
            merged = (
                cur.unionByName(new)
                .groupBy(*group_cols)
                .agg(
                    F.sum(count_col).cast("long").alias(count_col),
                    *(
                        [F.sum(sum_col).alias(sum_col)]
                        if sum_col
                        else []
                    ),
                )
            )
        else:
            merged = new
        tmp = f"{state_dir}__tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(state_dir):
            shutil.rmtree(state_dir)
        os.rename(tmp, state_dir)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
