"""Property-based tests (hypothesis): operator semantics hold on
arbitrary inputs, checked against plain-Python models — the edge
grid (bucket boundaries, zero denominators, empty/short strings)
explores itself."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from big_data_processing_spark.functions.text import char_ngrams, tokens
from big_data_processing_spark.operators.cleaning import range_filter
from big_data_processing_spark.operators.enrichment import (
    bucket_column,
    guarded_ratio,
)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)


@_slow
@given(st.lists(finite, min_size=1, max_size=30))
def test_bucketize_matches_left_closed_ladder(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    out = df.select(
        "v",
        bucket_column(
            F.col("v"), [("lo", 1.0), ("mid", 5.0), ("hi", 10.0)], "top"
        ).alias("b"),
    ).collect()

    def model(v):  # left-closed when-ladder (SURVEY.md §2.3 P1)
        if v < 1.0:
            return "lo"
        if v < 5.0:
            return "mid"
        if v < 10.0:
            return "hi"
        return "top"

    for r in out:
        assert r.b == model(r.v), (r.v, r.b)


@_slow
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=30))
def test_guarded_ratio_total_and_zero_safe(spark, pairs):
    df = spark.createDataFrame(pairs, "num double, den double")
    out = guarded_ratio(df, "num", "den", "r").collect()
    for r in out:
        # reference semantics (spark_processor.py:190-195): guard is
        # den > 0 only — num/den may still overflow to ±inf for
        # subnormal den; never null, never NaN
        assert r.r is not None
        assert not math.isnan(r.r)
        if r.den <= 0:
            assert r.r == 0.0
        elif math.isfinite(r.r):
            assert abs(r.r - r.num / r.den) <= 1e-9 * max(1.0, abs(r.r))


@_slow
@given(st.lists(finite, min_size=1, max_size=30))
def test_range_filter_equals_python_filter(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    rules = [("v", 0.0, 100.0, False, True)]  # 0 < v <= 100
    got = sorted(r.v for r in range_filter(df, rules).collect())
    want = sorted(v for v in values if 0.0 < v <= 100.0)
    assert got == want


@_slow
@given(st.text(max_size=40))
def test_char_ngrams_are_distinct_substrings(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        char_ngrams(F.col("t"), 3).alias("g"),
        F.trim(F.regexp_replace(F.lower("t"), r"\s+", " ")).alias("norm"),
    ).first()
    grams, norm = row.g, row.norm
    assert len(grams) == len(set(grams))  # distinct
    assert all(len(g) == 3 and g in norm for g in grams)
    if len(norm) >= 3:
        assert len(grams) == len({norm[i : i + 3] for i in range(len(norm) - 2)})
    else:
        assert grams == []


@_slow
@given(st.text(max_size=60))
def test_tokens_nonempty_and_whitespace_free(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    toks = df.select(tokens(F.col("t")).alias("tk")).first().tk
    for tok in toks:
        assert tok != ""
        assert " " not in tok
