from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_processing_spark.functions.dedup import (
    dedup_by_fingerprint,
    exact_dedup,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64_table,
    simhash_near_duplicates,
)

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_A2 = "the quick brown fox jumps over the lazy dog again and again tonight"
DOC_B = "completely unrelated text about database systems and query engines"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A2), (3, DOC_B), (4, DOC_A)],
        "doc_id long, text string",
    )


def test_exact_dedup(docs):
    assert exact_dedup(docs, ["text"]).count() == 3


def test_dedup_by_fingerprint(docs):
    out = {r.doc_id: r.n_copies for r in
           dedup_by_fingerprint(docs, "text", "doc_id").collect()}
    assert out == {1: 2, 2: 1, 3: 1}  # min-id representative, copy count


def test_minhash_signature_shape_and_determinism(spark, docs):
    sig1 = minhash_signatures(docs, "text", "doc_id", num_perm=16).collect()
    sig2 = minhash_signatures(docs, "text", "doc_id", num_perm=16).collect()
    assert sorted(map(tuple, sig1)) == sorted(map(tuple, sig2))
    assert len(sig1[0]) == 17  # id + 16 permutation minima


def test_minhash_identical_docs_identical_signatures(docs):
    sigs = {r.doc_id: tuple(r)[1:] for r in
            minhash_signatures(docs, "text", "doc_id").collect()}
    assert sigs[1] == sigs[4]


def test_minhash_near_duplicates_finds_pair(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             minhash_near_duplicates(docs, "text", "doc_id",
                                     threshold=0.5).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0  # near dup
    assert not any(3 in p for p in pairs)  # unrelated doc in no pair


def test_simhash_near_duplicates(docs):
    out = {(r.id_a, r.id_b): r.hamming for r in
           simhash_near_duplicates(docs, "text", "doc_id").collect()}
    assert out.get((1, 4)) == 0  # identical docs, hamming 0
    assert (1, 3) not in out and (2, 3) not in out


def test_simhash_is_64bit_long(spark, docs):
    rows = simhash64_table(docs, "text", "doc_id").collect()
    assert all(isinstance(r.simhash, int) for r in rows)
    by_id = {r.doc_id: r.simhash for r in rows}
    assert by_id[1] == by_id[4]


def test_ngram_jaccard_pairs_with_blocking(spark):
    df = spark.createDataFrame(
        [(1, DOC_A, "en"), (2, DOC_A2, "en"), (3, DOC_B, "en"),
         (4, DOC_A, "de")],  # same text, different block → never paired
        "doc_id long, text string, lang string",
    )
    pairs = {(r.id_a, r.id_b) for r in
             ngram_jaccard_pairs(df, "text", "doc_id", ["lang"],
                                 threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_max_df_subset_and_exact_values(spark):
    """df-capped candidate generation returns a SUBSET of the exact
    pairs, with identical (exact) jaccard values for every returned
    pair; a generous cap reproduces the exact result in full."""
    from big_data_processing_spark.functions.dedup import (
        ngram_jaccard_pairs,
    )
    from big_data_processing_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", "text"
    )
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", ["lang"], n=3, threshold=0.3
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", ["lang"], n=3, threshold=0.3, max_df=8
        ).collect()
    }
    assert set(capped) <= set(exact)
    for pair, j in capped.items():
        assert j == exact[pair]
    # generous cap (>= max block size) == fully exact
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", ["lang"], n=3, threshold=0.3,
            max_df=10_000,
        ).collect()
    }
    assert full == exact
