from __future__ import annotations

import math

from pyspark.sql import functions as F

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


def test_grouped_stats_basic(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )
    out = grouped_stats(
        df,
        ["k"],
        [F.count(F.lit(1)).alias("n"), F.avg("v").alias("avg_v")],
    ).collect()
    assert [(r.k, r.n, r.avg_v) for r in out] == [("a", 2, 2.0), ("b", 1, 10.0)]


def test_grouped_stats_empty_input(spark):
    df = spark.createDataFrame([], "k string, v double")
    out = grouped_stats(df, ["k"], [F.sum("v").alias("s")]).collect()
    assert out == []


def test_avg_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", None), ("a", 4.0)], "k string, v double"
    )
    out = grouped_stats(df, ["k"], [F.avg("v").alias("m")]).collect()
    assert out[0].m == 3.0


def test_column_stats_known_values(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    row = column_stats(df, ["x"]).collect()[0]
    assert (row["column"], row["min"], row["max"], row["mean"]) == (
        "x", 1.0, 3.0, 2.0,
    )
    assert row["stddev"] == 1.0  # sample stddev of 1,2,3


def test_column_stats_single_row_stddev_null(spark):
    df = spark.createDataFrame([(5.0,)], "x double")
    row = column_stats(df, ["x"]).collect()[0]
    assert row["stddev"] is None or (
        isinstance(row["stddev"], float) and math.isnan(row["stddev"])
    )


def test_summary_rollup(spark):
    grouped = spark.createDataFrame(
        [("a", 2, 10.0), ("b", 3, 20.0)], "k string, n long, avg_v double"
    )
    row = summary_rollup(grouped, ["n"], ["avg_v"]).collect()[0]
    assert row.total_n == 5 and row.mean_avg_v == 15.0


def test_top_k(spark):
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(100)], "id long, v double")
    out = top_k(df, [F.col("v").desc(), F.col("id")], 3).collect()
    assert [(r.id, r.v) for r in out] == [(6, 6.0), (13, 6.0), (20, 6.0)]


def test_fixed_size_sample_exact_n(spark):
    df = spark.range(1000)
    assert fixed_size_sample(df, 10).count() == 10


def test_fraction_sample_deterministic_for_seed(spark):
    df = spark.range(10000)
    a = fraction_sample(df, 0.1, seed=42).count()
    b = fraction_sample(df, 0.1, seed=42).count()
    assert a == b
    assert 500 < a < 1500


def test_dsum_round_exact_tie_matches_duckdb(spark):
    """The 2-dp display rounding of a fixed-point sum must agree
    with DuckDB AT AN EXACT DECIMAL TIE. round(dsum(x), 2) does not:
    for a sum ending in ...xx50 Spark's HALF_UP goes up while
    DuckDB rounds the binary double to nearest (down for e.g.
    549463674.435 — the sf1 local_supplier_volume failure). The
    integer-space recipe adds half a step and strips the remainder,
    so both engines round the identical long identically."""
    import duckdb

    from big_data_processing_spark.operators.aggregates import (
        dsum_round,
        dsum_round_sql,
    )

    # four 4-dp values summing to 7.1050 — an exact 2-dp tie — plus
    # a non-tie group as control
    rows = [("a", 1.0125), ("a", 2.0300), ("a", 3.0500), ("a", 1.0125),
            ("b", 1.2345)]
    df = spark.createDataFrame(rows, "k string, x double")
    got = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(dsum_round("x", 2).alias("s")).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        k: s
        for k, s in con.execute(
            f"SELECT k, {dsum_round_sql('x', 2)} AS s FROM t GROUP BY k"
        ).fetchall()
    }
    assert got == want
    assert got["a"] == 7.11  # half-up at the tie, on BOTH engines
    assert got["b"] == 1.23
