"""Trained BPE tokenizer: merge determinism, lossless roundtrip
(including characters unseen in training), and the distributed
apply path."""

from __future__ import annotations

from big_data_processing_spark.functions.tokenize import (
    EOW,
    _encode_word,
    bpe_decode,
    bpe_encode_table,
    bpe_roundtrip_report,
    train_bpe_merges,
)


def test_train_merges_frequency_order_and_tie_break():
    # "ab" appears 4x, "cd" 2x: (a,b) merges first; ties break
    # lexicographically so reruns are bit-identical.
    merges = train_bpe_merges(["ab ab ab ab cd cd"], num_merges=2)
    assert merges[0] == ("a", "b")
    again = train_bpe_merges(["ab ab ab ab cd cd"], num_merges=2)
    assert merges == again


def test_train_stops_when_no_pair_repeats():
    merges = train_bpe_merges(["xy"], num_merges=50)
    # "xy" = one word: (x,y) and (y,EOW) each occur once — below
    # the min-count-2 bar, so training stops immediately.
    assert merges == []


def test_encode_word_applies_merges_by_rank():
    # lowest rank first: (l,o) beats (w,EOW) even though both are
    # present, so "low" collapses left-to-right, and the terminal
    # EOW survives because ("low", EOW) was never learned.
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("w", EOW): 2}
    assert _encode_word("low", ranks) == ["low", EOW]
    # with the terminal merge learned, the word is one token
    ranks[("low", EOW)] = 3
    assert _encode_word("low", ranks) == ["low" + EOW]


def test_roundtrip_exact_with_unseen_chars():
    corpus = ["the quick brown fox jumps over the lazy dog"] * 5
    merges = train_bpe_merges(corpus, num_merges=30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for text in (
        corpus[0],
        "the quick fox",
        "zebra überraschung 123",  # chars never seen in training
        "",
        "a",
    ):
        toks: list[str] = []
        for w in text.split():
            toks.extend(_encode_word(w, ranks))
        assert bpe_decode(toks) == " ".join(text.split())


def test_encode_table_distributed_roundtrip(spark):
    rows = [
        (1, "spark shuffles the shuffled shuffle"),
        (2, "bpe merges merge merged tokens"),
        (3, "   leading and   irregular   spacing "),
        (4, "unseen ümläuts pass through"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe_merges([r[1] for r in rows], num_merges=40)
    enc = bpe_encode_table(df, "text", "doc_id", merges)
    got = {r.id: r for r in enc.collect()}
    assert all(got[i].roundtrip_ok for i in (1, 2, 3, 4))
    assert all(got[i].n_tokens == len(got[i].tokens) for i in got)
    rep = bpe_roundtrip_report(enc).collect()[0]
    assert rep.n_docs == 4
    assert rep.n_roundtrip_ok == 4
    assert rep.n_tokenized == 4


def test_merges_actually_compress(spark):
    # With merges, repeated words tokenize to far fewer symbols
    # than characters.
    text = " ".join(["tokenization"] * 20)
    merges = train_bpe_merges([text], num_merges=30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    toks = _encode_word("tokenization", ranks)
    assert len(toks) <= 2  # fully merged after 30 merges
