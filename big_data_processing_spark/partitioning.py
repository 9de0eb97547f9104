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
