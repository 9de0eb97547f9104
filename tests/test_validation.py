from __future__ import annotations

from pyspark.sql import functions as F

from big_data_processing_spark.validation import (
    completeness,
    quality_metrics,
    validate_schema,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1.0, 10.0),
            (2.0, None),
            (None, 30.0),
            (-5.0, 40.0),  # violates rule below
            (1.0, 10.0),  # exact duplicate of row 1
        ],
        "fare double, dist double",
    )


def test_quality_metrics_single_pass(spark):
    rules = [("invalid_fare", F.col("fare") < 0)]
    row = quality_metrics(_df(spark), rules).collect()[0]
    assert row.total_rows == 5
    assert row.null_fare == 1
    assert row.null_dist == 1
    assert row.invalid_fare == 1
    assert row.duplicate_count == 1
    # score = (5 - 1) / 5 * 100 = 80.0 (data_validator.py:150-152 formula)
    assert row.quality_score == 80.0


def test_quality_score_clamped_at_zero(spark):
    df = spark.createDataFrame([(-1.0,), (-2.0,)], "fare double")
    rules = [
        ("r1", F.col("fare") < 0),
        ("r2", F.col("fare") < 100),  # both rules fire on every row
    ]
    row = quality_metrics(df, rules, include_duplicates=False).collect()[0]
    assert row.quality_score == 0.0  # max(0, ...) clamp


def test_quality_metrics_approx_duplicates(spark):
    row = quality_metrics(_df(spark), [], approx=True).collect()[0]
    # approx_count_distinct is within a few % on tiny data
    assert 0 <= row.duplicate_count <= 2


def test_completeness(spark):
    row = completeness(_df(spark)).collect()[0]
    assert row.fare == 80.0 and row.dist == 80.0  # 4/5 non-null


def test_schema_gate_critical_vs_optional(spark):
    df = spark.createDataFrame([(1.0,)], "fare double")
    expected = {"fare", "dist", "tip"}
    # dist critical and missing → invalid
    check = validate_schema(df, expected, critical={"fare", "dist"})
    assert not check.valid and check.missing_critical == ["dist"]
    assert check.missing_optional == ["tip"]
    # only optional missing → valid with warning list
    check = validate_schema(df, expected, critical={"fare"})
    assert check.valid and check.missing_optional == ["dist", "tip"]


def test_dtype_report_no_job(spark):
    from big_data_processing_spark.validation import dtype_report

    df = spark.createDataFrame([(1, 2.5, "x")], "a long, b double, c string")
    assert dtype_report(df) == {"a": "bigint", "b": "double", "c": "string"}


def test_list_tables(spark):
    from big_data_processing_spark.sources.catalog import (
        list_tables,
        register_views,
    )
    from tests.conftest import SF0001

    register_views(spark, SF0001, ("region",))
    assert "region" in list_tables(spark)
