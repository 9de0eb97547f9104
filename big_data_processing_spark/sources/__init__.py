from big_data_processing_spark.sources.catalog import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from big_data_processing_spark.sources.files import (
    read_csv,
    read_parquet,
    write_csv,
    write_parquet,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_parquet",
    "read_csv",
    "write_parquet",
    "write_csv",
]
