"""Misra-Gries heavy hitters: merge bound, candidate-superset
guarantee, and end-to-end exactness of sketch-then-recount."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from big_data_processing_spark.functions.sketches import (
    _mg_combine,
    heavy_hitters,
    mg_candidates,
)


def test_mg_combine_caps_size_and_undercount_bound():
    # Stream: key i appears i times, i = 1..50 (n = 1275), capacity 10.
    counts = pd.Series({f"k{i}": i for i in range(1, 51)}, dtype="int64")
    summary = _mg_combine(pd.Series(dtype="int64"), counts, k=10)
    assert len(summary) <= 10
    n = int(counts.sum())
    for key, true in counts.items():
        est = int(summary.get(key, 0))
        assert est <= true
        assert true - est <= n / (10 + 1)


def test_mg_combine_incremental_batches_keeps_bound():
    # Feed 20 batches; every key's undercount stays ≤ n/(k+1).
    k = 8
    rng_keys = [f"t{i}" for i in range(30)]
    true = Counter()
    summary = pd.Series(dtype="int64")
    for b in range(20):
        batch = {key: (j + b) % 7 + 1 for j, key in enumerate(rng_keys)}
        true.update(batch)
        summary = _mg_combine(
            summary, pd.Series(batch, dtype="int64"), k
        )
        assert len(summary) <= k
    n = sum(true.values())
    for key, t in true.items():
        assert t - int(summary.get(key, 0)) <= n / (k + 1)


def test_candidates_superset_of_true_heavy_hitters(spark):
    # Skewed column: 'hot' holds 40% of rows spread over partitions.
    rows = [("hot",)] * 400 + [(f"c{i}",) for i in range(600)]
    df = spark.createDataFrame(rows, "key string").repartition(8)
    cand = {r.key for r in mg_candidates(df, "key", k=20).collect()}
    assert "hot" in cand
    # candidate set bounded by k per partition
    assert len(cand) <= 20 * 8


def test_heavy_hitters_exact_end_to_end(spark):
    rows = (
        [("a",)] * 300 + [("b",)] * 200 + [("c",)] * 90
        + [(f"z{i}",) for i in range(410)]
    )
    df = spark.createDataFrame(rows, "key string").repartition(8)
    got = {r.key: r.n for r in heavy_hitters(df, "key", 0.1).collect()}
    # n = 1000; threshold > 100 → exactly a and b
    assert got == {"a": 300, "b": 200}


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from pyspark.sql import functions as F

    from big_data_processing_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 100.0 if i < 50 else 1.0) for i in range(1000)],
        "id long, w double",
    )
    a = {r.id for r in weighted_sample(df, "id", "w", 100, "s1").collect()}
    b = {
        r.id
        for r in weighted_sample(
            df.repartition(7), "id", "w", 100, "s1"
        ).collect()
    }
    assert a == b  # partitioning-independent
    # the 50 heavy rows (weight 100 vs 1, 5% of rows) dominate the
    # sample far beyond their population share
    heavy = sum(1 for i in a if i < 50)
    assert heavy >= 35
    c = {r.id for r in weighted_sample(df, "id", "w", 100, "s2").collect()}
    assert a != c  # independent draw per seed


def test_weighted_sample_drops_nonpositive_weights(spark):
    from big_data_processing_spark.operators.sampling import weighted_sample

    # A-ES precondition: weight <= 0 rows are excluded, never
    # preferentially sampled (w<0 would make u^(1/w) > 1) or keyed
    # null (w=0)
    df = spark.createDataFrame(
        [(1, 5.0), (2, -3.0), (3, 0.0), (4, 1.0)], "id long, w double"
    )
    got = {r.id for r in weighted_sample(df, "id", "w", 10, "s").collect()}
    assert got == {1, 4}


def test_bloom_prefilter_join_exact_vs_plain_join(spark):
    from big_data_processing_spark.functions.sketches import (
        bloom_prefilter_join,
    )

    fact = spark.createDataFrame(
        [(i % 500, i) for i in range(5000)], "k long, payload long"
    ).repartition(8)
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 500, 25)], "dk long, label string"
    )
    got = sorted(
        (r.k, r.payload, r.label)
        for r in bloom_prefilter_join(fact, "k", dim, "dk").collect()
    )
    want = sorted(
        (r.k, r.payload, r.label)
        for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    assert got == want and len(got) == 200  # 20 dim keys × 10 copies


def test_bloom_membership_no_false_negatives_and_low_fpp(spark):
    from pyspark.sql import functions as F

    from big_data_processing_spark.functions.sketches import (
        bloom_bitmap,
        bloom_membership,
    )

    members = spark.range(0, 200).select(F.col("id").alias("k"))
    bitmap = bloom_bitmap(members, "k")
    assert len(bitmap) == (1 << 16) // 64
    # every inserted key passes (Bloom's no-false-negative contract)
    n_in = members.filter(bloom_membership("k", bitmap)).count()
    assert n_in == 200
    # non-members pass only at the (tiny at n=200, m=2^16) FP rate
    outsiders = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    n_fp = outsiders.filter(bloom_membership("k", bitmap)).count()
    assert n_fp < 20  # expected ≈ 20000 · (1-e^{-5·200/65536})^5 ≈ 0.002


def test_mg_bound_property_random_streams():
    """Property: for ANY stream and batch split, capacity-k MG
    undercounts every key by at most n/(k+1) and never overcounts
    (hypothesis-driven, pure pandas — no Spark)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                 max_size=400),
        st.integers(min_value=2, max_value=12),
        st.integers(min_value=1, max_value=5),
    )
    def check(stream, k, n_batches):
        true = Counter(stream)
        n = len(stream)
        summary = pd.Series(dtype="int64")
        size = max(1, n // n_batches)
        for i in range(0, n, size):
            batch = pd.Series(stream[i : i + size]).value_counts()
            summary = _mg_combine(summary, batch, k)
            assert len(summary) <= k
        for key, t in true.items():
            est = int(summary.get(key, 0))
            assert est <= t
            assert t - est <= n / (k + 1)

    check()
