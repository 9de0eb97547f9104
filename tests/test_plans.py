"""Plan-quality regression tests: the physical plans the engine is
DESIGNED to produce (pushdown, pruning, broadcast, true top-k,
partial aggregation, whole-stage codegen) — so a refactor that
silently loses one of them fails loudly."""

from __future__ import annotations

import re

from big_data_processing_spark.plans.registry import SPECS
from tests.conftest import SF0001


def _plan(df, execute: bool = False) -> str:
    if execute:  # resolve AQE's runtime re-plan before reading it
        df.collect()
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _scan_count(plan: str) -> int:
    """Distinct scan NODES (formatted explain repeats nodes across
    the adaptive-final and initial plan sections)."""
    return len(set(re.findall(r"\((\d+)\) Scan parquet", plan)))


def test_range_filter_pushes_down_to_scan(spark):
    plan = _plan(SPECS["clean_range_filter"].fn(spark, SF0001))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    line = pushed[0]
    # every F1 range predicate reaches the parquet reader
    for frag in (
        "GreaterThan(l_extendedprice,0.0)",
        "LessThan(l_quantity,50.0)",
        "LessThanOrEqual(l_discount,0.08)",
    ):
        assert frag in line, line


def test_sink_projection_prunes_scan_columns(spark):
    plan = _plan(SPECS["sink_projection"].fn(spark, SF0001))
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # 6 projected source columns, nothing else (11-column table)
    assert read.count(":") - 1 == 6 or read.count(",") == 5, read
    assert "l_shipdate" not in read
    assert "l_partkey" not in read


def test_topk_uses_take_ordered_not_full_sort(spark):
    plan = _plan(SPECS["topk_orders"].fn(spark, SF0001))
    assert "TakeOrderedAndProject" in plan


def test_dim_join_broadcasts(spark):
    plan = _plan(SPECS["join_mktsegment_revenue"].fn(spark, SF0001))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_grouped_agg_is_partial_plus_final_codegen(spark):
    plan = _plan(SPECS["vendor_stats"].fn(spark, SF0001), execute=True)
    # map-side partial + final aggregate, inside whole-stage codegen
    assert plan.count("HashAggregate") >= 2
    assert "codegen id" in plan


def test_quality_metrics_single_scan(spark):
    plan = _plan(SPECS["quality_metrics"].fn(spark, SF0001))
    # one scan for all null/violation counts + one for the exact
    # distinct (duplicate detection) — NOT one job per column
    assert _scan_count(plan) == 2, plan
