"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(``big_data_processing_spark.plans.registry``): every implemented
operator from SURVEY.md §2 is registered there with its Spark
builder and (where SQL-expressible) its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on sf0.001: lineitem scan → conjunctive
    range clean → bucketing → grouped vendor stats (SURVEY.md §7.1)."""
    from big_data_processing_spark.plans.parity_queries import flagship

    return flagship(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from big_data_processing_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from big_data_processing_spark.plans.registry import ORACLE_SQL

    return dict(ORACLE_SQL)
