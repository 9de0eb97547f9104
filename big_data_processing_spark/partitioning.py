"""Partitioning utilities: align partition count with COMPUTE, not
bytes, for CPU-dense operators.

Spark sizes scan partitions by input bytes
(``spark.sql.files.maxPartitionBytes``) and AQE coalesces shuffle
partitions by output bytes — both correct for IO-bound relational
work, both wrong for operators that do orders of magnitude more CPU
per byte (shingling, pairwise set similarity, vector math). A small
input arrives as ONE partition and the whole operator runs on one
core of a 1000-core cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin_now(df: DataFrame) -> DataFrame:
    """Materialize ``df`` NOW as a local checkpoint and return the
    pinned frame — the safe spelling of ``localCheckpoint(eager=True)``.

    Measured at sf0.1/local[32] (r12): ``eager=True`` materializes
    through ``Dataset.checkpoint``'s internal ``rdd.count()`` and ran
    FAR slower than executing the identical plan as a normal query —
    the md5 gram-bitmap build stage cost 8.0 s executor CPU eager vs
    1.3 s lazy-then-``count()`` (md5_minhash_build 20.3 → 9.6 s,
    doc_cluster_build 23.9 → 18.5 s standalone after converting
    every pin). A lazy checkpoint followed by one ``count()`` action
    materializes the same blocks exactly once — same lifecycle, same
    lineage truncation, same pinned-block semantics (the count scans
    the blocks it just wrote) — while the materializing execution
    keeps whole-stage codegen + AQE. Use this anywhere a frame is
    referenced by concurrently-launched consumer jobs (broadcast
    sides race a purely lazy pin and rebuild the frame per side)."""
    out = df.localCheckpoint(eager=False)
    out.count()
    return out


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition to the session's default parallelism, hashed on
    ``cols``.

    Use immediately before CPU-dense per-row work. The exchange
    itself is tiny for the narrow projections these operators feed
    (ids + short text / id pairs); on inputs that are already wide
    (100 TB corpora, thousands of scan partitions) it rebalances the
    same row count and costs one narrow shuffle — measure before
    removing it, skew in upstream partitioning usually makes it a
    win there too.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols)


def spread_even(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism —
    the CPU-dense twin of :func:`spread` for frames whose BYTES are
    small but whose per-row work is not (candidate pairs entering
    exact set-similarity verification: ~20 bytes/row shuffled, an
    array-intersect per row computed).

    Why not ``spread`` (hash on columns): a keyed
    ``repartition(n, cols)`` whose child is already hash-partitioned
    on the same columns is ELIMINATED as redundant at planning time,
    and the surviving upstream exchange is then AQE-coalesced by
    BYTES — measured at sf0.1: a 582k-row candidate set (~5 MB)
    coalesced to 4 post-shuffle partitions, putting 2/3 of the
    query's CPU on 4 of 32 cores (verify stage 17 s wall instead of
    ~1 s). A keyless round-robin exchange has a different output
    partitioning, so it can never be eliminated, and its explicit
    numPartitions is exempt from AQE coalescing. Rows are spread
    evenly regardless of key skew.

    Cost: one narrow shuffle (the rows are id pairs), plus the
    deterministic pre-sort Spark applies to keyless repartitions
    (``spark.sql.execution.sortBeforeRepartition``) so task retries
    reproduce the same assignment. At cluster scale a downstream
    sort-merge join would re-shuffle by key anyway — this exchange
    stays cheap relative to the per-row verification it widens."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def spread_arrow(df: DataFrame, *cols: str, target_bytes: int = 8 << 20
                 ) -> DataFrame:
    """Partition count for Arrow/Python kernel inputs sized by input
    BYTES, not core count (r12, guide §2/§4): every ``mapInPandas``
    task pays a fixed Python-worker/Arrow round-trip (measured at
    sf0.1: ~10 ms warm, ~280 ms after worker churn — 32 tasks of a
    2000-row GEMM spent 8.9 s cumulative runtime on 0.8 s CPU), and
    AQE cannot size an opaque kernel stage. ``ceil(plan-estimated
    bytes / target_bytes)`` clamped to [1, 10 × defaultParallelism]
    keeps byte-small frames in a handful of tasks while a 100 TB
    input still fans out to thousands; when Catalyst has no estimate
    the default parallelism is kept. Kernel outputs here are
    per-row/batch-local (each function rounds before any cut), so
    partition count never changes results — the same invariance the
    8-core driver bench already exercises."""
    import math

    n_default = df.sparkSession.sparkContext.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — stats unavailable for some plans
        size = None
    if size is None or size >= 1 << 62:  # unknown ≠ huge (see below)
        n = n_default
    else:
        n = max(1, min(10 * n_default, math.ceil(size / target_bytes)))
    return df.repartition(n, *cols) if cols else df.repartition(n)


def warn_if_quadratic(
    df: DataFrame,
    what: str,
    ceiling_bytes: int = 2 << 30,
    allow_quadratic: bool = False,
) -> None:
    """Soft scale guard for the EXACT quadratic baselines (r7
    verdict #4): the uncapped/unblocked exact paths
    (``ngram_jaccard_pairs`` with ``max_df=None``,
    ``cosine_near_dup_pairs``, flat ``kmeans_assign``) are kept as
    value-checked ground truth beside their scale valves
    (df-capped / IVF-celled / two-level), but nothing stopped a
    caller from pointing the quadratic baseline at a 100 TB corpus.
    This mirrors ``dsum``'s overflow-note pattern — document the
    ceiling where the caller meets it, and make it impossible to
    cross silently.

    Emits one ``RuntimeWarning`` when the input's Catalyst size
    estimate exceeds ``ceiling_bytes`` (default 2 GiB ≈ sf2 of this
    corpus family — past measured slopes of 40-130x per 10x data,
    the exact baselines stop finishing in bench-scale time well
    before that). ``allow_quadratic=True`` acknowledges the cost and
    silences the warning. The estimate is driver-side plan metadata
    (file sizes for scans) — no job is launched, so the guard is
    free at any scale and never fails the caller (stats may be
    unavailable for some plans)."""
    if allow_quadratic:
        return
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return
    # Catalyst reports spark.sql.defaultSizeInBytes (Long.MaxValue
    # by default) when it has NO estimate for a plan — that's
    # "unknown", not "huge"; warning on it would fire for every
    # in-memory test relation
    if size >= 1 << 62:
        return
    if size > ceiling_bytes:
        import warnings

        warnings.warn(
            f"{what}: input size estimate {size >> 20} MiB exceeds the "
            f"{ceiling_bytes >> 20} MiB ceiling documented for this "
            "EXACT quadratic baseline — candidate work grows with the "
            "square of block size (measured 40-130x per 10x data; "
            "SCALE.md 'Measured scaling slopes'). Use the scale path "
            "(max_df cap / IVF cells / two-level k-means), or pass "
            "allow_quadratic=True to acknowledge the cost.",
            RuntimeWarning,
            stacklevel=3,
        )
