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


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction
# ---------------------------------------------------------------------------


def _bloom_positions(key: str, num_bits: int, num_hashes: int) -> list:
    """The k bit positions of one key: pmod(xxhash64(key, seed_i),
    m). Seeding xxhash64 with the hash index gives k independent
    hash functions from the one JVM intrinsic — no Python in the
    row path."""
    return [
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_bitmap(
    keys: DataFrame, col: str, num_bits: int = 1 << 16, num_hashes: int = 5
) -> list[int]:
    """Aggregate a Bloom-filter bitmap over ``keys[col]`` as
    ``num_bits / 64`` longs.

    Distributed build: each key explodes to its k bit positions,
    positions group to 64-bit words, ``bit_or`` folds each word's
    masks map-side, and the collect is bounded by the FILTER size
    (num_bits/64 rows — 8 KiB of longs at the default 2^16 bits),
    never by the key count. This is the repo's bounded-collect
    contract: driver memory holds the sketch, not the data.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    pos = _bloom_positions(col, num_bits, num_hashes)
    words = (
        keys.select(F.explode(F.array(*pos)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_prefilter_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT inner join with a Bloom-filter semi-join reduction on
    the fact side.

    The classic 100 TB shuffle cut: when the dim side is selective
    (a filtered dimension) and the fact side is the huge table, a
    plain join still scans and shuffles every fact row before the
    join discards the misses. Here a Bloom bitmap of the dim keys
    (built distributed, collected bounded — see :func:`bloom_bitmap`)
    is embedded as a literal array and applied as a plain JVM
    filter expression AT THE FACT SCAN, so non-matching fact rows
    die before the exchange. False positives pass the bitmap but
    are removed by the real join that follows — the result is
    EXACTLY the inner join, which is what makes this oracle-checkable
    against plain SQL. With m=2^16 bits and k=5 hashes the false-
    positive rate stays < 1% up to ~5.5K dim keys (p ≈ (1−e^{−kn/m})^k);
    size ``num_bits`` ~ 14·|dim keys| to hold that rate at scale.

    Spark can inject this automatically on shuffle joins
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``), but only
    below creation-size thresholds and never through a Python
    boundary; this operator makes the reduction explicit, plannable
    and testable. The dim side is broadcast for the residual join —
    the prefilter only pays off when dim is small, which is the same
    regime where broadcast is right.
    """
    bitmap = bloom_bitmap(
        dim.select(dim_key).distinct(), dim_key, num_bits, num_hashes
    )
    test = bloom_membership(fact_key, bitmap, num_hashes)
    return fact.filter(test).join(
        F.broadcast(dim), fact[fact_key] == dim[dim_key]
    )


def bloom_membership(key: str, bitmap: list[int], num_hashes: int = 5):
    """Column expression: might ``key`` be in the set ``bitmap`` was
    built from? Pure JVM expressions (xxhash64 / element_at /
    getbit) over a literal array — whole-stage-codegen-friendly and
    pushable to the scan side of a join."""
    num_bits = len(bitmap) * 64
    words = F.array(*[F.lit(w) for w in bitmap])
    test = F.lit(True)
    for pos in _bloom_positions(key, num_bits, num_hashes):
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        test = test & (F.getbit(word, F.pmod(pos, F.lit(64))) == 1)
    return test


def bloom_scan_filter(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    domain_count: int | None = None,
    selectivity_max: float = 0.5,
    max_dim_keys: int = 1 << 16,
    num_hashes: int = 5,
) -> tuple[DataFrame, bool]:
    """COST-GATED Bloom semi-join reduction: measure the dim side,
    and inject the bitmap filter at the fact scan only when it can
    pay. Returns ``(fact', injected)`` — ``fact'`` is semantically
    identical to ``fact`` for any subsequent inner join on
    ``fact_key`` against ``dim`` (the bitmap admits every true
    match; false positives die in the real join), so adopters keep
    their join structure and their oracles unchanged.

    The gate, from measured scalars (one bounded countDistinct on
    the dim side):

    - ``n ≤ max_dim_keys`` — the 14·n bits rule (k=5 → false-
      positive rate < 1%, p ≈ (1−e^{−kn/m})^k) caps the broadcast
      literal at 14·2^16 bits = 112 KiB at the default ceiling;
      past that the filter stops being a cheap literal.
    - ``n / domain_count ≤ selectivity_max`` (when the caller knows
      the unfiltered key-domain size) — a bitmap of an UNselective
      dim (local_supplier_volume's full customer table: every fact
      row matches) filters nothing and only taxes the scan; the
      gate declines and the plain join runs.

    Bitmap sizing is derived, not fixed: the next multiple of 64
    ≥ 14·n (floor 1024), so a 100-key dim costs a 1 Kib literal and
    a 60K-key dim the full 112 KiB — the bounded-collect contract
    scales with what the filter actually holds.

    Measurement cost is itself gated: a plain count() (scan +
    partial counts, no shuffle) runs first, and the countDistinct —
    a keyed shuffle — only when the row count already fits under
    ``max_dim_keys``; a 100 TB unselective dim is declined after
    the cheap pass alone."""
    if dim.count() > max_dim_keys:
        return fact, False
    n = dim.select(dim_key).distinct().count()
    if n == 0 or n > max_dim_keys:
        return fact, False
    if domain_count and n / domain_count > selectivity_max:
        return fact, False
    num_bits = max(1024, ((14 * n + 63) // 64) * 64)
    bitmap = bloom_bitmap(
        dim.select(dim_key).distinct(), dim_key, num_bits, num_hashes
    )
    return fact.filter(
        bloom_membership(fact_key, bitmap, num_hashes)
    ), True


def countmin_table(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a key
    column, as a (row, col, cnt) table — the mergeable frequency
    sketch that completes the family next to HLL (distinct),
    Misra-Gries (heavy hitters) and Bloom (membership).

    Build is one explode + one partial agg: each key contributes
    ``depth`` (row, pmod(xxhash64(key, row), width)) cells, so the
    shuffle carries at most depth × width counter partials per task
    — corpus-size-independent, like every sketch here. Estimates
    read with :func:`countmin_estimate` (min over the depth cells):
    never below the true count, above it by at most εN with
    probability 1−δ (ε = e/width, δ = e^−depth). Deterministic:
    xxhash64 is a fixed function of (key, row-seed)."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            F.xxhash64(F.col(col), F.lit(i)),
                            F.lit(width),
                        ).cast("int").alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell")
    )
    return (
        cells.groupBy(
            F.col("cell.row").alias("row"), F.col("cell.col").alias("col")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a Count-Min
    table: join each key's depth cells against the sketch (broadcast
    — the sketch is ≤ width×depth rows by construction) and take the
    min. Missing cells count 0 (a key whose cell nobody touched)."""
    probes = keys.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            F.xxhash64(F.col(col), F.lit(i)),
                            F.lit(width),
                        ).cast("int").alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(col, F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
