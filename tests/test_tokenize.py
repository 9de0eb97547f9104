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


def test_unigram_train_deterministic_and_open_vocab():
    from big_data_processing_spark.functions.tokenize import (
        _viterbi_segment,
        train_unigram_vocab,
    )

    texts = [
        "spark joins shuffle rows into hash buckets",
        "hash joins beat shuffle sorts for small builds",
        "spark rows stream through hash joins",
    ] * 10
    a = train_unigram_vocab(texts, vocab_size=64)
    b = train_unigram_vocab(texts, vocab_size=64)
    assert a == b
    # every single sample character survives pruning (open vocab)
    chars = {c for t in texts for c in t if c != " "}
    assert chars <= set(a)
    # frequent full words become single pieces
    assert _viterbi_segment("hash", a, 8) == ["hash"]
    assert _viterbi_segment("joins", a, 8) == ["joins"]
    # unseen characters pass through as singles
    segs = _viterbi_segment("zebraZ9", a, 8)
    assert "".join(segs) == "zebraZ9"


def test_unigram_encode_roundtrip_exact(spark):
    from pyspark.sql import functions as F

    from big_data_processing_spark.functions.tokenize import (
        WB,
        corpus_unigram_vocab,
        unigram_decode,
        unigram_encode_table,
    )
    from big_data_processing_spark.sources.catalog import load_table
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents")
    vocab = corpus_unigram_vocab(spark, docs, SF0001)
    enc = unigram_encode_table(docs, "text", "doc_id", vocab)
    bad = enc.filter(~F.col("roundtrip_ok")).count()
    assert bad == 0
    row = enc.orderBy("id").first()
    assert row.tokens[0].startswith(WB)
    assert unigram_decode(list(row.tokens)) == " ".join(
        docs.orderBy("doc_id").first().text.split()
    )
