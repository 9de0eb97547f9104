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


@_slow
@given(
    st.lists(  # left events: (key 0-2, minute 0-120)
        st.tuples(st.integers(0, 2), st.integers(0, 120)),
        min_size=1,
        max_size=15,
    ),
    st.lists(  # right quotes: (key, minute, value) — unique (key, ts)
        st.tuples(
            st.integers(0, 2), st.integers(0, 120), st.integers(0, 100)
        ),
        max_size=15,
        unique_by=lambda r: (r[0], r[1]),
    ),
)
def test_asof_join_matches_python_model(spark, lefts, rights):
    import datetime as dt

    from big_data_processing_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(k, ts(m), i) for i, (k, m) in enumerate(lefts)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(k, ts(m), float(v)) for k, m, v in rights],
        "k long, ts timestamp, quote double",
    ) if rights else spark.createDataFrame(
        [], "k long, ts timestamp, quote double"
    )
    got = {
        r.lid: r.asof_quote
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            payload_cols=["quote"],
        ).collect()
    }

    def model(k, m):  # latest quote at-or-before m for key k
        cands = [(rm, v) for rk, rm, v in rights if rk == k and rm <= m]
        return float(max(cands)[1]) if cands else None

    assert got == {
        i: model(k, m) for i, (k, m) in enumerate(lefts)
    }


@_slow
@given(
    st.lists(  # events: (user 0-1, minute)
        st.tuples(st.integers(0, 1), st.integers(0, 500)),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_sessionize_matches_python_model(spark, events):
    import datetime as dt

    from big_data_processing_spark.operators.windows import sessionize

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (u, t0 + dt.timedelta(minutes=m), i)
            for i, (u, m) in enumerate(events)
        ],
        "user_id long, ts timestamp, event_id long",
    )
    out = sessionize(df, "user_id", "ts", 30.0, tiebreak=["event_id"])
    got = {r.event_id: r.session_id for r in out.collect()}

    expected = {}
    for u in {u for u, _ in events}:
        rows = sorted(
            (m, i) for i, (uu, m) in enumerate(events) if uu == u
        )
        sid, last = 0, None
        for m, i in rows:
            if last is None or m - last > 30:
                sid += 1
            expected[i] = sid
            last = m
    assert got == expected


# --- round-10 additions: tokenizer + banding properties -----------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="▁"
            ),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_unigram_roundtrip_property(texts):
    """decode(encode(text)) == whitespace-normalized text for ANY
    corpus the trainer sees (driver-side model, no Spark)."""
    from big_data_processing_spark.functions.tokenize import (
        WB,
        _viterbi_segment,
        train_unigram_vocab,
        unigram_decode,
    )

    vocab = train_unigram_vocab(texts, vocab_size=64)
    for t in texts:
        words = t.split()
        toks = []
        for w in words:
            pieces = _viterbi_segment(w, vocab, 8)
            assert "".join(pieces) == w  # full cover, always
            toks += [WB + pieces[0], *pieces[1:]]
        assert unigram_decode(toks) == " ".join(words)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**64 - 1),
    st.integers(min_value=0, max_value=2**64 - 1),
    st.integers(min_value=0, max_value=8),
)
def test_hash64_banding_pigeonhole_property(a, b, max_h):
    """The (max_hamming+1)-chunk split can never miss a pair within
    the threshold: if popcount(a^b) <= max_h, at least one chunk is
    bit-identical (the pigeonhole guarantee the banded join relies
    on at ANY threshold after the r9 generalization)."""
    n = max_h + 1
    width = 64 // n + (1 if 64 % n else 0)
    hamming = bin(a ^ b).count("1")
    chunks_equal = any(
        ((a >> (i * width)) & ((1 << width) - 1))
        == ((b >> (i * width)) & ((1 << width) - 1))
        for i in range(n)
        if i * width < 64
    )
    if hamming <= max_h:
        assert chunks_equal
