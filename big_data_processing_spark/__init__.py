"""big_data_processing_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference pipeline
(Nihar-SANTOKI/big-data-processing): parquet/CSV/JDBC sources and
sinks, conjunctive range cleaning, data-dependent IQR outlier
removal, derived-feature projection (bucketing, guarded ratios),
grouped/global aggregation suites, sorts/limits/top-k, sampling,
single-pass data-quality validation, and a SQL surface over temp
views — plus the large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing,
streaming windows).

Design stance (SURVEY.md §7.0): one SparkSession factory, declared
schemas, and pure ``DataFrame -> DataFrame`` operator functions.
Everything is declarative DataFrame/SQL so Catalyst handles
pushdown, pruning, join strategy and AQE handles skew/coalescing at
scale. No pandas fallback, no driver-side loops in hot paths.
"""

from big_data_processing_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
