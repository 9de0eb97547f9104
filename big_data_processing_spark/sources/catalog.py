"""Table catalog over a directory of parquet files.

The engine's canonical corpus is a directory holding one parquet
file per table (TESTDATA.md layout). ``load_table`` gives a lazy
DataFrame; ``register_views`` exposes every table to ``spark.sql``.

Replaces the reference's three-way source dispatch (Spark read /
pandas read / Postgres fetch — `/root/reference/src/data_processing/
spark_processor.py:44-61`, `/root/reference/src/storage/
postgres_manager.py:80-93`): here a table is always a lazy Spark
relation and SQL always runs in Catalyst over temp views.

Scale notes: reads are plain ``spark.read.parquet`` so partition
count follows ``spark.sql.files.maxPartitionBytes`` — at 100 TB the
same code yields ~800k splits that executors stream through;
nothing here materializes on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one corpus table.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as nanos-long and convert with integer
    division to a µs timestamp (same truncation DuckDB's µs timestamp
    applies, so both engines see identical values)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        # Files already written at µs/ms precision arrive as a real
        # timestamp (nanosAsLong only rewrites NANOS columns) — only
        # the nanos-long shape needs the conversion.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            # files re-written at µs precision without a timezone
            # (e.g. the sf1 scale replica) arrive as TIMESTAMP_NTZ,
            # which rejects numeric casts downstream; reinterpret the
            # wall-clock value in the session zone (UTC-pinned) so
            # every SF presents one ts type
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register every corpus table as a temp view for ``spark.sql``."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def list_tables(spark: SparkSession) -> list[str]:
    """Names of tables/views registered in the current catalog
    (reference S10, `local_file_manager.py:68-85` — its recursive
    sink-directory walk becomes a catalog listing in an engine with
    an actual catalog)."""
    return sorted(t.name for t in spark.catalog.listTables())
