from big_data_processing_spark.operators.cleaning import (
    iqr_bounds,
    iqr_filter,
    range_filter,
)
from big_data_processing_spark.operators.enrichment import (
    bucketize,
    guarded_ratio,
    sink_projection,
)
from big_data_processing_spark.operators.aggregates import (
    column_stats,
    grouped_stats,
    summary_rollup,
)
from big_data_processing_spark.operators.sampling import (
    fixed_size_sample,
    fraction_sample,
)
from big_data_processing_spark.operators.sorting import top_k

__all__ = [
    "range_filter",
    "iqr_bounds",
    "iqr_filter",
    "bucketize",
    "guarded_ratio",
    "sink_projection",
    "grouped_stats",
    "column_stats",
    "summary_rollup",
    "fraction_sample",
    "fixed_size_sample",
    "top_k",
]
