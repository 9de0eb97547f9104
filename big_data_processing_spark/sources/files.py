"""File sources and sinks (parquet / CSV), path-scheme agnostic.

Collapses the reference's LocalFileManager + dead HDFS sink +
aspirational S3 manager (`/root/reference/src/storage/
local_file_manager.py:37-54`, `/root/reference/src/main.py:140-145`)
into thin ``DataFrameReader``/``DataFrameWriter`` wrappers: in
Spark, sink *location* is just the path scheme (``file://``,
``hdfs://``, ``s3a://``), so one code path serves all tiers.

Scale notes: writers take ``partition_by`` for hive-style layout
(enables partition pruning on re-read) and ``target_partitions`` to
coalesce small outputs; both are no-ops when unset so large jobs
keep their natural parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Parquet scan. Schema optional — parquet footers carry types,
    but passing one skips footer reads and enforces a contract."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan. Always pass a schema in production — ``inferSchema``
    costs an extra full pass over the data."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_partitions: int | None = None,
) -> None:
    """Parquet sink (reference S3: `local_file_manager.py:43-44`)."""
    if target_partitions is not None:
        df = df.coalesce(target_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    target_partitions: int | None = None,
) -> None:
    """CSV sink with header (reference S4: `local_file_manager.py:45-46`)."""
    if target_partitions is not None:
        df = df.coalesce(target_partitions)
    df.write.mode(mode).option("header", header).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table sink.

    Both sides of a repeated equi-join written with the SAME
    ``bucket_cols`` and ``num_buckets`` co-locate matching keys in
    matching files — the join then runs with NO shuffle exchange on
    either side (see tests/test_sources.py plan assertion). This is
    the 100 TB answer to "we join these two facts every day":
    pay the shuffle once at write time, never again at read time.

    Bucketing metadata lives in the session catalog (``saveAsTable``
    is required — plain ``.parquet(path)`` cannot record it); pass
    ``path`` to keep the data files at an external location.
    """
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
