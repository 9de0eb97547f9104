"""Window-function operators (north-star extension — absent from the
reference, SURVEY.md §2.8).

Scale notes: every window here partitions by a real key (never a
global ``Window.orderBy`` without partitioning, which would funnel
100 TB through one task). Top-k-per-group uses ``row_number`` +
filter — Spark pushes the rank filter into the sort via
``WindowGroupLimit`` (no full materialization per group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition_by: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group via row_number ≤ k. Include a unique
    tie-break column in ``order`` for deterministic output."""
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def running_total(
    df: DataFrame,
    partition_by: list[str],
    order: list[Column],
    value: str,
    out: str = "running_total",
) -> DataFrame:
    """Cumulative sum within each partition in the given order."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value).over(w))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float,
    session_col: str = "session_id",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``.

    Classic lag + cumulative-sum-of-boundaries pattern — two window
    passes over the same (user, ts) partitioning, so one shuffle.
    Timestamps compare at fractional-second (µs) precision; pass
    ``tiebreak`` columns for a total order when timestamps repeat.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    t = F.col(ts_col).cast("double")  # epoch seconds incl. µs fraction
    gap_sec = t - F.lag(t).over(w)
    is_new = F.when(
        gap_sec.isNull() | (gap_sec > gap_minutes * 60.0), 1
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    step: str = "1 hour",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Time-series resampling: complete the ``ts_col`` grid from each
    series' min to max at ``step`` intervals and FORWARD-FILL the
    ``value_cols`` across the synthesized rows (the
    resample().ffill() of a distributed engine). Adds a ``filled``
    flag marking synthesized rows.

    Semantics match pandas ``resample(step).ffill()``: genuine NULLs
    in present rows are forward-filled too (ffill is value-based,
    not presence-based). Input rows whose ``ts_col`` does not land
    on the min-anchored grid are KEPT (the spine joins FULL OUTER,
    not left), interleaved in fill order between their neighboring
    grid points — so no observation is ever dropped; pre-truncate
    ``ts_col`` to the grid if grid-only output is wanted.

    Plan shape: one aggregate for the per-series bounds, a generated
    spine (explode of ``sequence``), a full outer join back, and one
    ordered window per series for the fill. The spine is
    |span/step| rows per series — tiny for monitoring-grade steps;
    the fill window orders WITHIN each series, so width is bounded
    by the longest single series, not the corpus."""
    parts = list(partition_cols or [])
    bounds = df.groupBy(*parts).agg(
        F.min(ts_col).alias("__mn"), F.max(ts_col).alias("__mx")
    )
    spine = bounds.select(
        *parts,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"interval {step}"))
        ).alias(ts_col),
    )
    joined = spine.join(
        df.withColumn("__present", F.lit(True)), on=[*parts, ts_col],
        how="full",
    )
    # Empty ``parts`` → a single global ordered window (one task holds
    # the whole series). That is ONLY safe for a pre-aggregated single
    # series whose row count is bounded by span/step (e.g. an hourly
    # rollup: 8.8k rows/year); for per-key series ALWAYS pass
    # ``partition_cols`` so the fill parallelizes per series.
    w = (
        Window.partitionBy(*parts) if parts else Window.partitionBy()
    ).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = joined
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.withColumn(
        "filled", F.col("__present").isNull()
    ).drop("__present")


def collapse_runs(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    status_col: str,
    ts_col: str,
) -> DataFrame:
    """Gaps-and-islands collapse → SCD-type-2 intervals.

    Consecutive rows (per key, in ``order_cols`` order) sharing the
    same ``status_col`` value collapse into one interval row:
    (key…, status, valid_from, valid_to, n_events, is_current) —
    ``valid_to`` is the next interval's start (NULL on the open,
    current interval). The classic change-data-capture snapshot
    build: lag-compare marks changes, a running sum numbers the
    islands, one group-by collapses them.

    One shuffle: every window and the aggregate share the key
    partitioning, so Catalyst plans a single exchange and sorts
    within it. State per key is the key's row count — bounded by
    per-entity history, never table size.
    """
    key = [F.col(c) for c in key_cols]
    order = [F.col(c) for c in order_cols]
    w = Window.partitionBy(*key).orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    changed = (
        F.lag(status_col).over(w).isNull()
        | (F.lag(status_col).over(w) != F.col(status_col))
    ).cast("int")
    islands = (
        df.withColumn("__grp", F.sum(changed).over(w_run))
        .groupBy(*key, F.col(status_col).alias("status"), F.col("__grp"))
        .agg(
            F.min(ts_col).alias("valid_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__grp")
    )
    w_iv = Window.partitionBy(*key).orderBy("valid_from")
    return islands.select(
        *key_cols,
        "status",
        "valid_from",
        F.lead("valid_from").over(w_iv).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(w_iv).isNull().alias("is_current"),
    )


def ewma_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially-weighted moving average — the recursive
    per-entity feature built with grouped ``applyInPandas``.

    The recurrence s_i = α·v_i + (1−α)·s_{i−1} (s_0 = v_0) is
    inherently sequential per key, which SQL window frames cannot
    express directly — exactly the case for an Arrow-batched grouped
    kernel: one shuffle on the key, then a vectorized numpy pass per
    group; group state is one double, group size is per-entity
    history. No row-at-a-time Python, no driver collect.

    The kernel emits the raw double; callers round JVM-side
    (``F.round`` — HALF_UP, matching SQL engines) if they need
    cross-engine parity. For such parity, prefer a NON-dyadic α:
    α = 0.5 keeps results dyadic, which lands exactly on decimal
    rounding midpoints often enough (≈3/10k rows at 6 dp on the
    corpus) that engines' differing midpoint handling (BigDecimal
    of the shortest repr vs scale-multiply-rint) becomes visible.

    PERF (r11 optimization): implemented as ONE ``mapInPandas`` over
    key-hash-partitioned, (key, order)-sorted partitions rather than
    grouped ``applyInPandas`` — the grouped form invokes the Python
    kernel once per KEY (tens of thousands of single-user pandas
    frames at sf0.1; per-call pandas overhead dominated the actual
    recurrence, measured 3.3 s → 1.1 s). Same one shuffle on the
    key; the sort moves from per-group pandas ``sort_values`` into
    the exchange's ``sortWithinPartitions``; segment boundaries are
    detected vectorized and the scalar recurrence runs in ONE loop
    per Arrow batch with carry state across batches. Per-key float
    op order is unchanged, so results are bit-identical."""
    import numpy as np
    import pandas as pd  # noqa: F401 — kernel runtime dep

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    one_minus = 1.0 - alpha

    def kernel(batches):
        carry_key: tuple | None = None
        acc = 0.0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                pdf = pdf.copy()
                pdf[out_col] = np.empty(0, dtype="float64")
                yield pdf
                continue
            v = pdf[value_col].to_numpy(dtype="float64")
            # vectorized segment starts: row 0 continues the carried
            # key's segment unless any key column differs
            start = np.zeros(n, dtype=bool)
            kcols = [pdf[k].to_numpy() for k in key_cols]
            for kc in kcols:
                start[1:] |= kc[1:] != kc[:-1]
            first_key = tuple(kc[0] for kc in kcols)
            if carry_key is None or first_key != carry_key:
                start[0] = True
            out = np.empty_like(v)
            for i in range(n):
                x = v[i]
                acc = x if start[i] else alpha * x + one_minus * acc
                out[i] = acc
            carry_key = tuple(kc[n - 1] for kc in kcols)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartition(n_parts, *key_cols).sortWithinPartitions(
        *key_cols, *order_cols
    )
    return parts.mapInPandas(
        kernel, schema=f"{out_fields}, {out_col} double"
    )


def rolling_median(
    df: DataFrame,
    partition_by: list[str],
    order: list[Column],
    value_col: str,
    n: int,
    out_col: str = "roll_median",
    interpolate: bool = False,
) -> DataFrame:
    """Exact moving median over the trailing ``n``-row frame,
    entirely JVM-side: ``collect_list`` over the ROWS frame,
    ``array_sort``, pick the middle element. No Python UDF, stays
    inside whole-stage codegen.

    Default is the DISCRETE (lower) median — element at ceil(s/2),
    i.e. SQL ``quantile_disc(x, 0.5)`` — because it returns an
    actual input value, bit-identical across engines with no
    rounding policy needed. ``interpolate=True`` averages the two
    middles on even frames (SQL ``median`` semantics); that (a+b)/2
    lands on half-cent decimal-rounding midpoints for 2-dp inputs,
    where engines' round() midpoint handling diverges — round ≥3 dp
    if you need cross-engine parity on the interpolated form.

    Scale: frame is bounded (≤ n values buffered per row) and the
    window partitions by a real key, so state per task is
    O(n · rows_per_key_partition) — safe at any corpus size for
    small n. Include enough columns in ``order`` for a total order
    (or ties whose ``value_col`` is equal) — frame membership is
    order-dependent.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    arr = F.array_sort(F.collect_list(F.col(value_col)).over(w))
    sz = F.size(arr)
    lo = F.element_at(arr, F.ceil(sz / 2).cast("int"))
    if not interpolate:
        return df.withColumn(out_col, lo)
    hi = F.element_at(arr, (F.floor(sz / 2) + F.lit(1)).cast("int"))
    return df.withColumn(out_col, (lo + hi) / 2)
