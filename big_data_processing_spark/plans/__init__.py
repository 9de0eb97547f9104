from big_data_processing_spark.plans.registry import (
    QUERIES,
    ORACLE_SQL,
    QuerySpec,
    register,
)

__all__ = ["QUERIES", "ORACLE_SQL", "QuerySpec", "register"]
