"""Frequency sketches: distributed Misra-Gries heavy hitters.

North-star extension — the reference has no sketch/summary code
(SURVEY.md §2.8; `/root/reference/src/main.py` has no frequency
analysis beyond plain group-by).

Production pattern: two-pass sketch-then-recount. Pass 1 runs a
bounded-memory Misra-Gries summary per partition (`mapInPandas`,
Arrow-batched, pandas ``value_counts`` per batch merged into the
summary — no per-row Python). Pass 2 recounts ONLY the candidate
keys exactly (broadcast semi-join, then grouped count) and applies
the threshold. The result is EXACT heavy hitters with O(k) memory
per task; the full-vocabulary groupBy over a billion-key column
never happens, and the second scan's shuffle carries at most
|candidates| ≤ k·num_partitions keys.

Correctness: a capacity-k Misra-Gries summary undercounts any key
by at most n/(k+1) (Misra & Gries 1982; merge bound: Agarwal et
al., "Mergeable Summaries", PODS 2012 — combining summaries and
subtracting the (k+1)-st largest count preserves the bound). With
k ≥ 1/θ, any key with true frequency > θ·n therefore survives at
least one partition summary, so the candidate set is a superset of
the true heavy hitters and the exact recount removes every false
positive. Deterministic end-to-end — the sketch only proposes
candidates, never final counts.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_combine(summary: pd.Series, batch_counts: pd.Series, k: int) -> pd.Series:
    """Merge exact batch counts into a capacity-k MG summary.

    Combine, then subtract the (k+1)-st largest count from all
    entries and drop non-positives — the mergeable-summaries
    reduction, which leaves ≤ k entries and adds ≤ n_batch/(k+1)
    undercount.
    """
    combined = (
        batch_counts if summary.empty else summary.add(batch_counts, fill_value=0)
    )
    if len(combined) <= k:
        return combined
    kth = combined.nlargest(k + 1).iloc[-1]
    reduced = combined - kth
    return reduced[reduced > 0]


def _mg_partition_sketch(col: str, k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            counts = pdf[col].value_counts()
            summary = _mg_combine(summary, counts, k)
        yield pd.DataFrame(
            {col: summary.index.astype(str), "mg_count": summary.values}
        )

    return gen


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition capacity-k Misra-Gries candidate keys.

    Output is the DISTINCT union of per-partition summary keys —
    guaranteed to contain every key with global frequency
    > n/(k+1). At most k·num_partitions rows: small enough to
    broadcast for the usual (small k, bounded partition count)
    setup, but NOT unconditionally — a tiny ``threshold_frac`` on a
    many-partition 100 TB scan can push k·P past the broadcast /
    driver-memory budget, which is why :func:`heavy_hitters` checks
    the k·P bound before choosing the broadcast plan.
    """
    sketched = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        _mg_partition_sketch(col, k), schema=f"{col} string, mg_count long"
    )
    return sketched.select(col).distinct()


def heavy_hitters(
    df: DataFrame, col: str, threshold_frac: float, capacity: int | None = None
) -> DataFrame:
    """Exact keys with frequency > threshold_frac of all rows, found
    via MG-sketch candidates + exact recount of candidates only.

    Returns (col, n) with n the exact count. ``capacity`` defaults
    to ceil(1/threshold_frac), the minimum that guarantees no true
    heavy hitter is missed; raise it to shrink the candidate set's
    false-positive tail (fewer rows surviving the recount's
    semi-join).

    Scale note: three scans (sketch, total count, recount), each
    column-pruned to one column; at 100 TB fuse the total count
    into the sketch pass or read it from table stats — and when the
    keyed input sits on expensive lineage (an explode, a decode),
    ``cache()`` it before calling, or the three scans re-execute
    that lineage. The candidate join broadcasts only while the
    k·num_partitions bound stays within a safe broadcast budget;
    past it (tiny ``threshold_frac`` × many partitions) it falls
    back to a shuffle semi-join rather than overrunning the driver.
    """
    k = capacity or int(math.ceil(1.0 / threshold_frac))
    keyed = df.select(F.col(col).cast("string").alias(col))
    cand = mg_candidates(keyed, col, k)
    # k·P upper-bounds the candidate row count without running a
    # count job; broadcast only under ~1M keys (≲ tens of MB).
    if k * keyed.rdd.getNumPartitions() <= 1_000_000:
        cand = F.broadcast(cand)
    total = keyed.groupBy().agg(F.count(F.lit(1)).alias("_total"))
    return (
        keyed.join(cand, col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") > F.lit(threshold_frac) * F.col("_total"))
        .drop("_total")
    )
