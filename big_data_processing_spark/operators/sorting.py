"""Sorts / limits / top-k.

Re-expresses O1-O3 (`/root/reference/src/main.py:326-339`,
`spark_processor.py:232,266,303`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O2: ``ORDER BY ... LIMIT k``.

    Spark plans this as TakeOrderedAndProject — each task keeps a
    k-row heap and the driver merges heaps, so no full sort, no
    shuffle of the full data. The right top-k at 100 TB.
    """
    return df.orderBy(*order).limit(k)
