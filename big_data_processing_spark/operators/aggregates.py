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
# Summing each addend rounded to 6 decimals and cast to
# DECIMAL(30,6) (the round first keeps the cast away from the
# engine-dependent half-boundary of a full-precision double) is an
# exact associative sum: bit-identical on any engine, partitioning,
# or cluster size. The matching oracle spellings are DSUM_SQL /
# DAVG_SQL — valid in both Spark SQL and DuckDB. For full-precision
# derived values (ratios, products), aggregate floor(x·10^s) as an
# integer sum instead: floor of the identical IEEE expression tree
# is bit-identical where round()/decimal-cast is not.
def dsum(col: str) -> Column:
    return F.sum(
        F.round(F.col(col), 6).cast("decimal(30,6)")
    ).cast("double")


def davg(col: str) -> Column:
    return dsum(col) / F.count(F.lit(1))


DSUM_SQL = "CAST(sum(CAST(round({c}, 6) AS DECIMAL(30,6))) AS DOUBLE)"
DAVG_SQL = DSUM_SQL + " / count(*)"


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
