"""Multi-dimensional data layout: z-order (Morton) clustering.

North-star extension (the reference writes unclustered parquet —
`/root/reference/src/main.py` has no layout control; SURVEY.md §2.7).

Why this matters at 100 TB: parquet pruning is min/max-range based,
so a table range-partitioned on ONE column prunes only filters on
that column. Interleaving the bits of two (quantile-normalized)
columns into a single z-value and range-partitioning + sorting on
it bounds EVERY file's extent in BOTH dimensions — a filter on
either column (or both) skips most files/row-groups at scan time.
This is the same technique Delta Lake's OPTIMIZE ZORDER BY applies.

The bit-spread uses the classic multiply-mask ladder (public-domain
"Interleave bits by Binary Magic Numbers", Stanford bit-twiddling
hacks) expressed as pure JVM column ops — shiftleft/AND/OR inside
whole-stage codegen, no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (shift, mask) ladder spreading a 16-bit value to even bit positions
# of a 32-bit lane: 0xFFFF -> 0x55555555.
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread_bits16(c: Column) -> Column:
    """Spread the low 16 bits of a long into even bit positions."""
    c = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def z_value(x: Column, y: Column) -> Column:
    """Morton z-value of two 16-bit lanes (x in even bits, y odd)."""
    return spread_bits16(x).bitwiseOR(F.shiftleft(spread_bits16(y), 1))


def zorder_layout(
    df: DataFrame,
    col_x: str,
    col_y: str,
    path: str,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of two
    columns.

    Each dimension is quantile-normalized to 16 bits with
    ``percent_rank`` (rank-based, so skewed value distributions
    still fill the lattice uniformly), interleaved, then
    ``repartitionByRange`` + ``sortWithinPartitions`` on the
    z-value: every output file covers a compact z-range, hence a
    bounded rectangle in (x, y) — parquet min/max stats prune on
    BOTH columns.

    Scale note: percent_rank here runs per-dimension global windows
    — at 100 TB replace with ``approxQuantile``-derived bin edges
    (a bounded driver-side array, same lattice) so no global sort is
    needed; the z-math and write path are unchanged.
    """
    wx = F.percent_rank().over(Window.orderBy(F.col(col_x)))
    wy = F.percent_rank().over(Window.orderBy(F.col(col_y)))
    lat = df.withColumn("_zx", (wx * 65535).cast("long")).withColumn(
        "_zy", (wy * 65535).cast("long")
    )
    z = lat.withColumn("_z", z_value(F.col("_zx"), F.col("_zy")))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_zx", "_zy", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )
