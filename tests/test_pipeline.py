from __future__ import annotations

from big_data_processing_spark.pipeline import run_pipeline
from tests.conftest import SF0001


def test_pipeline_end_to_end(spark, tmp_path):
    out = tmp_path / "out"
    result = run_pipeline(spark, SF0001, str(out))

    assert result.schema_valid
    assert result.raw_rows > 0
    assert 0 < result.clean_rows <= result.raw_rows
    assert result.quality["quality_score"] > 0

    # sinks exist and read back consistently
    processed = spark.read.parquet(result.outputs["processed"])
    assert processed.count() == result.clean_rows
    assert "qty_category" in processed.columns

    vendor = spark.read.parquet(result.outputs["vendor_stats"])
    assert vendor.count() > 0
    summary = (
        spark.read.option("header", True).csv(result.outputs["summary"])
    )
    assert summary.count() == 1


def test_pipeline_schema_gate_fails_on_wrong_table(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="schema gate"):
        run_pipeline(spark, SF0001, str(tmp_path / "x"), table="region")
