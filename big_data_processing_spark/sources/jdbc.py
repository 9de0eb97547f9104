"""JDBC source and sink (reference S5/S6: the PostgreSQL manager,
`/root/reference/src/storage/postgres_manager.py:80-152`).

The reference moved data through driver-side pandas + psycopg2
multi-row INSERTs (chunksize 1000). Spark's JDBC writer does the
same batching executor-side and in parallel — each partition opens
its own connection and writes ``batchsize`` rows per round trip, so
throughput scales with partitions instead of being driver-bound.

Tested end-to-end against the embedded Derby engine that ships in
Spark's jars (tests/test_sources.py); for PostgreSQL/MySQL add the
driver jar to the classpath
(``spark.jars.packages=org.postgresql:postgresql:...``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    query_or_table: str,
    user: str | None = None,
    password: str | None = None,
    fetchsize: int = 10_000,
    partition_options: dict[str, str] | None = None,
) -> DataFrameReader:
    """Configured JDBC reader (S6: `postgres_manager.py:80-93`).

    Pass a table name or ``(SELECT ...) q`` subquery. For parallel
    reads supply ``partition_options`` with partitionColumn/
    lowerBound/upperBound/numPartitions — otherwise the read is a
    single partition (fine for dims, wrong for facts)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", query_or_table)
        .option("fetchsize", str(fetchsize))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    for k, v in (partition_options or {}).items():
        reader = reader.option(k, v)
    return reader


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 1000,
):
    """Configured JDBC writer (S5: `postgres_manager.py:95-152`;
    batchsize 1000 mirrors the reference's chunked inserts).
    Call ``.save()`` on the returned writer to execute."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    return writer
