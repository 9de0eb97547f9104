from __future__ import annotations

from pyspark.sql import functions as F

from big_data_processing_spark.functions.text import (
    char_jaccard,
    char_ngrams,
    lang_id,
    md5_fingerprint,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col(F.col("text")).alias("v")
    ).collect()[0].v


def test_normalize_text(spark):
    assert _one(spark, "  Hello   WORLD \n", normalize_text) == "hello world"


def test_token_count(spark):
    assert _one(spark, "a b  c", token_count) == 3
    assert _one(spark, "", token_count) == 0  # empty tokens removed
    assert _one(spark, "   \n ", token_count) == 0


def test_char_ngrams(spark):
    got = _one(spark, "abcd", lambda c: char_ngrams(c, 3))
    assert got == ["abc", "bcd"]


def test_char_ngrams_short_text_empty(spark):
    assert _one(spark, "ab", lambda c: char_ngrams(c, 3)) == []


def test_md5_fingerprint_normalization_invariant(spark):
    a = _one(spark, "Hello  World", md5_fingerprint)
    b = _one(spark, "hello world", md5_fingerprint)
    assert a == b and len(a) == 32


def test_punct_ratio(spark):
    assert _one(spark, "ab!!", punct_ratio) == 0.5
    assert _one(spark, "", punct_ratio) == 0.0


def test_stopword_ratio(spark):
    assert _one(spark, "the cat and dog", stopword_ratio) == 0.5


def test_lang_id_markers(spark):
    assert _one(spark, "the cat and the hat is here", lang_id) == "en"
    assert _one(spark, "der hund ist nicht da und die katze", lang_id) == "de"
    assert _one(spark, "zzz qqq xxx", lang_id) == "und"


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [("a reasonable length document with many plain words in it "
          "that goes on for a while longer",),
         ("!!!???###",), ("",)],
        "text string",
    )
    scores = [
        r.q for r in df.select(quality_score(F.col("text")).alias("q")).collect()
    ]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[1]  # clean prose beats punctuation soup


def test_char_jaccard_matches_duckdb_semantics(spark):
    import duckdb

    expected = duckdb.connect().execute(
        "SELECT jaccard('hello', 'hallo')"
    ).fetchone()[0]
    df = spark.createDataFrame([("hello", "hallo")], "a string, b string")
    got = df.select(
        char_jaccard(F.col("a"), F.col("b")).alias("j")
    ).collect()[0].j
    assert abs(got - expected) < 1e-12


def test_winnowing_fingerprints_model(spark):
    """Fingerprints equal the hand-computed windowed-minima model."""
    from big_data_processing_spark.functions.text import (
        winnowing_fingerprints,
    )

    text = "abcdefghij"
    k, w = 3, 4
    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(
            winnowing_fingerprints(F.col("t"), k, w).alias("fp"),
            F.array(*[
                F.xxhash64(F.lit(text[i : i + k]))
                for i in range(len(text) - k + 1)
            ]).alias("h"),
        )
        .first()
    )
    hashes = row.h
    expect = sorted(
        {min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)}
    )
    assert row.fp == expect


def test_winnowing_shared_substring_guarantee(spark):
    """Docs sharing a substring of length >= k+window-1 share >=1
    fingerprint; short texts sketch to empty."""
    from big_data_processing_spark.functions.text import (
        winnowing_fingerprints,
    )

    shared = "the quick brown fox jumps"
    rows = (
        spark.createDataFrame(
            [
                (1, "AAA " + shared + " BBB"),
                (2, "xyz " + shared + " qqq"),
                (3, "completely different words here"),
                (4, "hi"),
            ],
            "id long, t string",
        )
        .select("id", winnowing_fingerprints(F.col("t"), 5, 4).alias("fp"))
        .collect()
    )
    fp = {r.id: set(r.fp) for r in rows}
    assert fp[1] & fp[2]
    assert not (fp[1] & fp[3] and fp[2] & fp[3])  # unrelated doc
    assert fp[4] == set()


def test_scrub_pii_patterns(spark):
    from big_data_processing_spark.functions.text import (
        pattern_count,
        scrub_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.org today"),
            (2, "see https://ex.org/a?b=1 and http://t.co/x"),
            (3, "call +1 (555) 123-4567 now"),
            (4, "nothing sensitive here"),
            (5, None),
        ],
        "id long, t string",
    )
    out = df.select(
        "id",
        scrub_pii(F.col("t")).alias("s"),
        pattern_count(F.col("t")).alias("n"),
    ).collect()
    by = {r.id: r for r in out}
    assert "@" not in by[1].s and by[1].n == 1
    assert "http" not in by[2].s and by[2].n == 2
    assert "555" not in by[3].s and by[3].n == 1
    assert by[4].s == "nothing sensitive here" and by[4].n == 0
    assert by[5].s is None


def test_scrub_pii_custom_patterns(spark):
    from big_data_processing_spark.functions.text import scrub_pii

    df = spark.createDataFrame([(1, "the customer saw a vector")], "id long, t string")
    got = df.select(
        scrub_pii(F.col("t"), [r"\bcustomer\b|\bvector\b"], "[X]").alias("s")
    ).first().s
    assert got == "the [X] saw a [X]"
