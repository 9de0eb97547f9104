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


def run_pipeline(*args, **kwargs):
    """Convenience re-export of :func:`pipeline.run_pipeline`
    (lazy import keeps bare session bootstrap cheap)."""
    from big_data_processing_spark.pipeline import run_pipeline as _rp

    return _rp(*args, **kwargs)


def queries():
    """The named-query registry: {name: (spark, sf_dir) -> DataFrame}."""
    from big_data_processing_spark.plans.registry import QUERIES

    return dict(QUERIES)


__all__ = ["get_spark", "stop_spark", "run_pipeline", "queries"]
__version__ = "0.1.0"
