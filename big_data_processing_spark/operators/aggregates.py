"""Aggregation operators: grouped stats, global column stats,
second-level rollups.

Re-expresses the reference's aggregation suite
(`/root/reference/src/data_processing/spark_processor.py:204-400`):
A1-A3 grouped aggs (`:223-232,258-266,295-303`), A4 per-column
min/max/avg/stddev (`:377-400`), A10 driver-side pandas rollup
(`/root/reference/src/main.py:213-219`).

Spark-first design
------------------
- Grouped aggs are single ``groupBy().agg()`` calls: Catalyst plans
  partial (map-side) + final hash aggregation, so the shuffle moves
  one row per (partition, key) — at 100 TB with low-cardinality
  keys the shuffle is kilobytes.
- A4 computes ALL columns' stats in ONE job (the reference ran one
  job per column, `:388-393`) and transposes JVM-side via
  ``stack`` — no driver loop.
- A10 re-aggregates the (tiny) A1 output instead of collecting to
  driver pandas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Exact cross-engine double aggregation (the repo-wide fixed-point
# policy, round 6): floating-point sums are order-dependent, so once
# a scan spans multiple partitions two engines' partial-sum trees
# diverge in the last ulp — and a rounded output then gambles on the
# noise not straddling a rounding boundary (lost once at sf1).
# Policy: sum in integer micro-units — floor(x·1e6 + 0.5) as a LONG
# — an exact associative sum, bit-identical on any engine,
# partitioning, or cluster size. floor of an identical IEEE
# expression tree is engine-independent (round()/decimal-cast of a
# non-terminating double is not: both Spark and DuckDB re-derive the
# decimal digits differently at half boundaries). The long fast path
# stays inside whole-stage codegen: measured 6x faster than the
# decimal(30,6) formulation at sf0.1 (0.27 s vs 1.67 s for a
# 5-column grouped sum) and within noise of a raw double sum.
# Bound: the micro-unit sum must fit a long — |Σ x|·1e6 < 9.2e18,
# i.e. ~$9.2T per group at 6 dp. Past that, use dsum_decimal (same
# contract, decimal(38,6) accumulator, no overflow, ~6x slower).
# The matching oracle spellings are DSUM_SQL / DAVG_SQL — valid in
# both Spark SQL and DuckDB (DuckDB sums BIGINT into HUGEINT; both
# engines convert the identical exact integer to double with the
# same IEEE rounding).
def dsum(col: str) -> Column:
    return (
        F.sum(
            F.floor(F.col(col) * F.lit(1e6) + F.lit(0.5)).cast("long")
        ).cast("double")
        / F.lit(1e6)
    )


def davg(col: str) -> Column:
    return dsum(col) / F.count(F.lit(1))


def dsum_decimal(col: str) -> Column:
    """Overflow-proof variant of :func:`dsum` for group sums past
    ~9.2e18 micro-units: decimal accumulator, same exactness
    contract, ~6x slower (per-row BigDecimal + non-codegen agg).

    Where the long ceiling actually sits: Spark's non-ANSI BIGINT
    sum WRAPS silently past 2^63 micro-units (~$9.2T per group at
    6 dp) while DuckDB promotes to HUGEINT — so past the ceiling
    the engines diverge with no error. For this corpus that is
    ~sf40 for a whole-table money sum (sf1 lineitem revenue mass
    ≈ 2.3e17 micro-units, linear in sf). Policy (r6 ADVICE):
    UNBOUNDED groups — rollup/cube/grouping-sets grand totals,
    whole-table sums — use this decimal path; keyed groups whose
    mass is a bounded slice of the scan may use the codegen long
    path with the ceiling noted."""
    return F.sum(
        F.floor(F.col(col) * F.lit(1e6) + F.lit(0.5)).cast("decimal(38,0)")
    ).cast("double") / F.lit(1e6)


def davg_decimal(col: str) -> Column:
    return dsum_decimal(col) / F.count(F.lit(1))


DSUM_SQL = (
    "CAST(sum(CAST(floor({c} * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6"
)
DAVG_SQL = "(" + DSUM_SQL + ") / count(*)"
# Overflow-proof spelling, valid in BOTH Spark SQL and DuckDB:
# DECIMAL(38,0) accumulates ~1e38 micro-units before overflow
# (DuckDB's BIGINT sum already promotes to HUGEINT; Spark's does
# not — this makes the Spark side match past the long ceiling).
DSUM_DECIMAL_SQL = (
    "CAST(sum(CAST(floor({c} * 1e6 + 0.5) AS DECIMAL(38,0))) "
    "AS DOUBLE) / 1e6"
)
DAVG_DECIMAL_SQL = "(" + DSUM_DECIMAL_SQL + ") / count(*)"


# Display rounding of a fixed-point sum, computed IN INTEGER SPACE.
# Why round(dsum(x), dp) is not enough: when x carries MORE decimal
# places than dp (e.g. price·(1-discount) has 4, displayed at 2),
# the exact sum lands on a decimal tie (...xx50) about once per 100
# groups, and the engines' round() disagree there — Spark rounds the
# shortest decimal repr HALF_UP while DuckDB rounds the binary
# double to nearest, so an exact tie goes up on one engine and down
# on the other (first seen: local_supplier_volume at sf1, one
# nation's revenue ending in .4350). Half-up rounding the LONG
# micro-unit sum — add half a step, strip the remainder — keeps
# every step exact and both engines then cast the identical integer
# to double identically. Positive-sum contract (integer % semantics
# diverge below zero across engines); same ~9.2e18 micro-unit long
# ceiling as dsum.
def dsum_round(col: str, dp: int = 2) -> Column:
    div = 10 ** (6 - dp)
    s = F.sum(
        F.floor(F.col(col) * F.lit(1e6) + F.lit(0.5)).cast("long")
    ) + F.lit(div // 2)
    return (s - s % F.lit(div)).cast("double") / F.lit(1e6)


def dsum_round_sql(c: str, dp: int = 2) -> str:
    """Oracle spelling of :func:`dsum_round`, valid in Spark SQL and
    DuckDB (DuckDB's HUGEINT sum takes the same +/%/- path)."""
    div = 10 ** (6 - dp)
    s = f"(sum(CAST(floor({c} * 1e6 + 0.5) AS BIGINT)) + {div // 2})"
    return f"CAST({s} - {s} % {div} AS DOUBLE) / 1e6"


def grouped_stats(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    order_by: list[str] | None = None,
) -> DataFrame:
    """A1-A3/A11 shape: ``groupBy(keys).agg(...).orderBy(keys)``.

    Callers pass pre-aliased agg Columns so output names are part
    of the operator contract (oracle-comparable).
    """
    out = df.groupBy(*keys).agg(*aggs)
    if order_by is None:
        order_by = keys
    if order_by:
        out = out.orderBy(*order_by)
    return out


def column_stats(df: DataFrame, columns: list[str], ndigits: int = 2) -> DataFrame:
    """A4: per-column ``min/max/avg/stddev`` (sample stddev, 2 dp —
    reference `spark_processor.py:388-399`) for every column in ONE
    aggregation pass, returned long-form as
    ``(column, min, max, mean, stddev)`` rows.

    The transpose uses ``stack`` so it happens JVM-side on a
    one-row intermediate — no per-column jobs, no driver loop.
    """
    aggs: list[Column] = []
    for c in columns:
        aggs += [
            F.round(F.min(c), ndigits).alias(f"{c}__min"),
            F.round(F.max(c), ndigits).alias(f"{c}__max"),
            F.round(F.avg(c), ndigits).alias(f"{c}__mean"),
            F.round(F.stddev(c), ndigits).alias(f"{c}__stddev"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__min, {c}__max, {c}__mean, {c}__stddev" for c in columns
    )
    return wide.selectExpr(
        f"stack({len(columns)}, {stack_args}) as "
        "(column, min, max, mean, stddev)"
    )


def summary_rollup(
    grouped: DataFrame,
    sum_cols: list[str],
    avg_cols: list[str],
) -> DataFrame:
    """A10: grand-total row over a grouped-agg result
    (reference did this in driver pandas, `main.py:213-219`).

    Runs as a second Spark aggregation over the already-tiny
    grouped output — same numbers, no driver materialization.
    """
    aggs = [F.sum(c).alias(f"total_{c}") for c in sum_cols]
    aggs += [F.avg(c).alias(f"mean_{c}") for c in avg_cols]
    return grouped.agg(*aggs)
