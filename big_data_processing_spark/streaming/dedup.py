"""Streaming deduplication: drop repeated records from an unbounded
stream with watermark-bounded state.

The batch engine's exact dedup (functions/dedup.py
``exact_deduplicate``) keeps the full key set; a stream cannot.
``dedup_stream`` uses ``dropDuplicatesWithinWatermark`` so the state
store retains keys only for the watermark horizon — the standard
at-least-once → exactly-once repair for replayed sources (Kafka
redelivery, file re-lists), where duplicates arrive CLOSE to the
original, not arbitrarily late.

Scale: state is sharded by key hash across executors like any
stateful operator; size is (keys seen within the watermark window) ×
a few bytes of key hash — independent of total stream history.
Dedup on a fingerprint of the payload (md5, as the batch twin does)
rather than wide natural keys so the state rows stay fixed-width.

No reference counterpart (its surface is batch-only, SURVEY.md
§2.8); this extends the streaming family the way the windowed and
sessionization operators do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
    fingerprint: bool = False,
) -> DataFrame:
    """Emit each key's FIRST arrival; suppress re-deliveries within
    the watermark horizon.

    ``fingerprint=True`` dedups on md5(concat of ``key_cols``)
    instead of the raw columns — one 16-byte state row per key
    regardless of key width (the batch ``fingerprint_column``
    semantics, streamed)."""
    wm = stream.withWatermark(ts_col, watermark)
    if fingerprint:
        fp = F.md5(
            F.concat_ws(
                "\x1f", *[F.col(c).cast("string") for c in key_cols]
            )
        )
        wm = wm.withColumn("__fp", fp)
        return wm.dropDuplicatesWithinWatermark(["__fp"]).drop("__fp")
    return wm.dropDuplicatesWithinWatermark(key_cols)
