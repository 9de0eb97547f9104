"""End-to-end batch ETL pipeline: the engine's equivalent of the
reference's orchestrator (`/root/reference/src/main.py:88-309`).

Stages (same DAG, Spark-first execution):
  scan → schema gate → single-pass quality metrics → F1 range clean
  → F2 IQR outlier filter → P1-P3 enrichment → ONE cache point →
  fan-out {A1 vendor / A2 category / A3 payment aggs, A10 summary
  rollup, A4 column stats} → parquet + CSV sinks → unpersist.

Differences from the reference, by design:
- Validation is one aggregation pass, not ~2+2·ncols jobs
  (`data_validator.py:102-155`).
- Sinks are path-scheme-agnostic ``DataFrameWriter`` calls — a
  ``file://`` / ``hdfs://`` / ``s3a://`` prefix picks the filesystem
  (collapses LocalFileManager / the dead ``write_to_hdfs``,
  `local_file_manager.py:37-54`, `main.py:140-145`).
- No ``toPandas`` round-trips: aggregates are written distributed;
  only the tiny metric row is collected.

Scale notes
-----------
- The single ``cache()`` point pins the cleaned+enriched table once
  for the multi-agg fan-out (reference's M1 pattern, `main.py:
  136-137`); everything upstream streams through it one time.
- Each aggregate is a partial-agg shuffle on its own key; none of
  them re-reads the source.
- ``quality_metrics`` and the IQR quantile job are the only extra
  passes over the raw table, both single-column-pruned scans.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_processing_spark.monitoring import PipelineMonitor
from big_data_processing_spark.operators.cleaning import iqr_filter
from big_data_processing_spark.plans.parity_queries import (
    CLEAN_RULES,
    clean,
    enrich,
)
from big_data_processing_spark.sources.catalog import load_table
from big_data_processing_spark.sources.files import write_csv, write_parquet
from big_data_processing_spark.validation import (
    quality_metrics,
    validate_schema,
)

EXPECTED_COLUMNS = {c for c, *_ in CLEAN_RULES} | {"l_returnflag", "l_linestatus"}
CRITICAL_COLUMNS = {"l_extendedprice", "l_quantity"}


@dataclass
class PipelineResult:
    """Stage-by-stage outcome of one pipeline run."""

    schema_valid: bool
    quality: dict[str, Any]
    raw_rows: int
    clean_rows: int
    outputs: dict[str, str] = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    table: str = "lineitem",
    monitor: "PipelineMonitor | None" = None,
) -> PipelineResult:
    """Run the full ETL DAG over ``{sf_dir}/{table}.parquet`` and
    write aggregate outputs under ``out_dir`` (any Hadoop-supported
    scheme). Returns per-stage metrics.

    Pass a ``monitoring.PipelineMonitor`` to record per-stage
    wall/cpu/rss/task metrics (reference `pipeline_monitor.py:1-18`
    role); omit for zero overhead."""
    if monitor is None:
        monitor = PipelineMonitor()  # record locally, discard
    raw = load_table(spark, sf_dir, table)

    with monitor.stage("schema_gate"):
        gate = validate_schema(raw, EXPECTED_COLUMNS, CRITICAL_COLUMNS)
        if not gate.valid:
            raise ValueError(
                f"schema gate failed: missing critical {gate.missing_critical}"
            )

    rules = [
        ("invalid_price", F.col("l_extendedprice") > 100000),
        ("invalid_qty", F.col("l_quantity") >= 50),
        ("invalid_discount", F.col("l_discount") > 0.08),
    ]
    with monitor.stage("quality_metrics") as mrec:
        quality = quality_metrics(raw, rules).first().asDict()
        mrec.rows = int(quality["total_rows"])

    cleaned = iqr_filter(clean(raw), "l_extendedprice", exact=False)
    enhanced = enrich(cleaned).cache()
    try:
        vendor = (
            enhanced.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("total_trips"),
                F.sum("l_extendedprice").alias("total_revenue"),
                F.avg("l_quantity").alias("avg_quantity"),
                F.avg("l_extendedprice").alias("avg_price"),
            )
            .orderBy("l_returnflag")
        )
        category = (
            enhanced.groupBy("qty_category")
            .agg(
                F.count(F.lit(1)).alias("total_trips"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.avg("price_per_unit").alias("avg_price_per_unit"),
            )
            .orderBy("qty_category")
        )
        payment = (
            enhanced.groupBy("l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("total_trips"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.round(
                    F.avg("l_discount") / F.avg("l_extendedprice") * 100.0, 6
                ).alias("discount_price_ratio_pct"),
            )
            .orderBy("l_linestatus")
        )
        summary = vendor.agg(
            F.sum("total_trips").alias("total_total_trips"),
            F.round(F.sum("total_revenue"), 2).alias("total_total_revenue"),
            F.round(F.avg("avg_quantity"), 6).alias("mean_avg_quantity"),
            F.round(F.avg("avg_price"), 6).alias("mean_avg_price"),
        )

        outputs: dict[str, str] = {}
        sinks: list[tuple[str, DataFrame, str]] = [
            ("processed", enhanced, "parquet"),
            ("vendor_stats", vendor, "parquet"),
            ("category_stats", category, "parquet"),
            ("payment_stats", payment, "parquet"),
            ("summary", summary, "csv"),
        ]
        for name, df, fmt in sinks:
            path = f"{out_dir}/{name}"
            with monitor.stage(f"sink:{name}"):
                if fmt == "parquet":
                    write_parquet(df, path)
                else:
                    write_csv(df, path)
            outputs[name] = path

        with monitor.stage("clean_count") as crec:
            clean_rows = enhanced.count()
            crec.rows = clean_rows

        return PipelineResult(
            schema_valid=True,
            quality=quality,
            raw_rows=int(quality["total_rows"]),
            clean_rows=clean_rows,
            outputs=outputs,
        )
    finally:
        enhanced.unpersist()
