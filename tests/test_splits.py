"""Deterministic corpus split / mixture / shard-packing ops
(functions/splits.py) — hash-based, so assignments must be stable
across recomputation and row order."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_processing_spark.functions.splits import (
    hash_split,
    mixture_sample,
    pack_shards,
)
from big_data_processing_spark.sources.catalog import load_table
from tests.conftest import SF0001


def test_hash_split_fraction_and_stability(spark):
    docs = load_table(spark, SF0001, "documents")
    split = hash_split(docs, "doc_id", 13)
    counts = {r.split: r.n for r in split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    assert n == docs.count()
    # 13/16 = 81.25% expected; allow sampling noise on 500 docs
    assert 0.70 <= counts["train"] / n <= 0.92
    # deterministic: recomputation gives identical assignment
    a = {(r.doc_id, r.split) for r in split.select("doc_id", "split").collect()}
    b = {
        (r.doc_id, r.split)
        for r in hash_split(
            docs.orderBy(F.rand(7)), "doc_id", 13
        ).select("doc_id", "split").collect()
    }
    assert a == b


def test_hash_split_stable_under_corpus_growth(spark):
    """Adding documents must not move existing ones between splits —
    the anti-leakage property RNG splits lack."""
    docs = load_table(spark, SF0001, "documents")
    half = docs.filter("doc_id < 250")
    full_assign = {
        (r.doc_id, r.split)
        for r in hash_split(docs, "doc_id", 13)
        .filter("doc_id < 250").select("doc_id", "split").collect()
    }
    half_assign = {
        (r.doc_id, r.split)
        for r in hash_split(half, "doc_id", 13)
        .select("doc_id", "split").collect()
    }
    assert full_assign == half_assign


def test_mixture_sample_rates(spark):
    docs = load_table(spark, SF0001, "documents")
    kept = mixture_sample(
        docs, "doc_id", "source", {"src0": 128, "src1": 64}, default_256ths=0
    )
    rates = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # default weight 0 drops every other source
    assert set(rates) <= {"src0", "src1"}
    assert 0.25 <= rates["src0"] / totals["src0"] <= 0.75  # ~50%
    assert 0.08 <= rates["src1"] / totals["src1"] <= 0.45  # ~25%


def test_pack_shards_budget_property(spark):
    docs = load_table(spark, SF0001, "documents")
    budget = 20_000
    packed = pack_shards(docs, "doc_id", "n_chars", budget)
    rows = packed.select("doc_id", "n_chars", "shard_id").orderBy(
        "doc_id").collect()
    # shard ids start at 0, are nondecreasing in doc order
    assert rows[0].shard_id == 0
    for a, b in zip(rows, rows[1:]):
        assert b.shard_id >= a.shard_id
    # every shard's size stays within budget + max single doc
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r.shard_id] = sizes.get(r.shard_id, 0) + r.n_chars
    max_doc = max(r.n_chars for r in rows)
    for sid, size in sizes.items():
        assert size <= budget + max_doc, (sid, size)
    # all shards except the last reach the budget
    last = max(sizes)
    for sid, size in sizes.items():
        if sid != last:
            assert size >= budget - max_doc, (sid, size)


def test_pack_shards_per_group(spark):
    docs = load_table(spark, SF0001, "documents")
    packed = pack_shards(
        docs, "doc_id", "n_chars", 50_000, partition_cols=["lang"]
    )
    # shard numbering restarts per language group
    firsts = (
        packed.groupBy("lang").agg(F.min("shard_id").alias("m")).collect()
    )
    assert all(r.m == 0 for r in firsts)


def test_pack_sequences_spans(spark):
    from big_data_processing_spark.functions.splits import pack_sequences

    meta = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 50), ("a", 3, 0), ("b", 9, 70)],
        "src string, doc_id bigint, n_tok bigint",
    )
    got = [
        (r.src, r.doc_id, r.seq_id, r.tok_start, r.tok_end)
        for r in pack_sequences(meta, "doc_id", "n_tok", 64, ["src"])
        .orderBy("src", "doc_id", "seq_id")
        .collect()
    ]
    assert got == [
        # group a: doc 1 tokens [0,100) -> seq 0 holds [0,64), seq 1 [64,100)
        ("a", 1, 0, 0, 64),
        ("a", 1, 1, 64, 100),
        # doc 2 at offset 100 -> seq 1 gets [0,28), seq 2 [28,50)
        ("a", 2, 1, 0, 28),
        ("a", 2, 2, 28, 50),
        # doc 3 has 0 tokens: dropped. group b restarts offsets
        ("b", 9, 0, 0, 64),
        ("b", 9, 1, 64, 70),
    ]


def test_pack_sequences_token_accounting(spark):
    from big_data_processing_spark.functions.splits import pack_sequences

    docs = load_table(spark, SF0001, "documents")
    meta = docs.select(
        "source", "doc_id", (F.col("n_chars") % 37 + 1).alias("n_tok")
    )
    packed = pack_sequences(meta, "doc_id", "n_tok", 16, ["source"])
    total_spans = packed.agg(
        F.sum(F.col("tok_end") - F.col("tok_start"))
    ).collect()[0][0]
    total_toks = meta.agg(F.sum("n_tok")).collect()[0][0]
    assert total_spans == total_toks
    # every span is non-empty and within the sequence length
    bad = packed.filter(
        (F.col("tok_end") <= F.col("tok_start"))
        | (F.col("tok_end") - F.col("tok_start") > 16)
    ).count()
    assert bad == 0


def test_deterministic_shuffle_is_stable_permutation(spark):
    from big_data_processing_spark.functions.splits import (
        deterministic_shuffle,
    )

    docs = load_table(spark, SF0001, "documents").select("doc_id")
    a = deterministic_shuffle(docs, "doc_id", n_shards=8, seed="42")
    b = deterministic_shuffle(docs, "doc_id", n_shards=8, seed="42")
    rows_a = {r.doc_id: (r.shard, r.pos_in_shard) for r in a.collect()}
    rows_b = {r.doc_id: (r.shard, r.pos_in_shard) for r in b.collect()}
    # same seed -> identical assignment; every doc present exactly once
    assert rows_a == rows_b and len(rows_a) == docs.count()
    # shards in range, positions contiguous from 1 within each shard
    from collections import defaultdict

    by_shard = defaultdict(list)
    for shard, pos in rows_a.values():
        assert 0 <= shard < 8
        by_shard[shard].append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed gives a different permutation
    c = deterministic_shuffle(docs, "doc_id", n_shards=8, seed="43")
    rows_c = {r.doc_id: (r.shard, r.pos_in_shard) for r in c.collect()}
    assert rows_c != rows_a


def test_chunk_documents_covers_every_token(spark):
    from big_data_processing_spark.functions.splits import chunk_documents

    rows = [
        (1, [f"t{i}" for i in range(35)]),  # multi-chunk
        (2, [f"t{i}" for i in range(7)]),  # single short chunk
        (3, []),  # empty -> no chunks
        (4, [f"t{i}" for i in range(16)]),  # exactly one full chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    out = chunk_documents(df, "toks", "doc_id", chunk_size=16, overlap=4)
    got = sorted(
        (r.doc_id, r.chunk_id, r.tok_start, r.n_tok, r.chunk_text)
        for r in out.collect()
    )
    # doc 1: starts 0,12,24 (n=35, stride 12); tail chunk 11 tokens
    starts = [(d, s) for d, _, s, _, _ in got]
    assert starts == [(1, 0), (1, 12), (1, 24), (2, 0), (4, 0)]
    by_doc = {}
    for d, cid, s, n, text in got:
        toks = text.split(" ")
        assert len(toks) == n
        # chunk content matches the source slice
        src = dict(rows)[d][s : s + 16]
        assert toks == src
        by_doc.setdefault(d, set()).update(range(s, s + n))
    # every token of every non-empty doc is covered by some chunk
    for d, toks in rows:
        if toks:
            assert by_doc[d] == set(range(len(toks)))


def test_temperature_mixture_weights_flatten(spark):
    from big_data_processing_spark.functions.splits import (
        temperature_mixture_weights,
    )

    df = spark.createDataFrame(
        [("hi",)] * 90 + [("lo",)] * 10, "k string"
    )
    out = {
        r.k: r for r in temperature_mixture_weights(df, "k", 0.5).collect()
    }
    assert out["hi"].n_docs == 90 and out["lo"].n_docs == 10
    assert abs(out["hi"].raw_share - 0.9) < 1e-9
    # alpha=0.5 flattens: sqrt(90)/(sqrt(90)+sqrt(10)) = 0.75
    assert abs(out["hi"].adj_share - 0.75) < 1e-6
    assert abs(out["hi"].adj_share + out["lo"].adj_share - 1.0) < 1e-6
    # low-resource group is up-weighted, high-resource down-weighted
    assert out["lo"].sample_weight > 1 > out["hi"].sample_weight


def test_quantize_embeddings_roundtrip(spark):
    import json

    from big_data_processing_spark.functions.similarity import (
        quantize_embeddings,
    )

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        (3, [2.0, 1.0, -2.0, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert out[1].scale == 1.0
    assert json.loads(out[1].q) == [64, -127, 32, 0]  # floor(x+0.5) half-up
    assert out[2].scale == 0.0 and json.loads(out[2].q) == [0, 0, 0, 0]
    # dequantization error bounded by scale/254 per component
    for vid, emb in rows:
        scale, q = out[vid].scale, json.loads(out[vid].q)
        assert all(abs(c) <= 127 for c in q)
        for orig, code in zip(emb, q):
            assert abs(orig - scale * code / 127.0) <= scale / 254 + 1e-9


def test_grouped_hash_split_disjoint_and_stable(spark):
    """Every group lands in exactly one split (the leakage-free
    contract), and adding documents to a group never moves it."""
    import pytest

    from big_data_processing_spark.functions.splits import (
        grouped_hash_split,
    )

    docs = load_table(spark, SF0001, "documents")
    assigned = grouped_hash_split(docs, "source", 10, 3)
    per_group = (
        assigned.groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert per_group and all(r.n_splits == 1 for r in per_group)
    # all three labels only; group assignment is a pure function of
    # the key, so a half corpus assigns identically
    labels = {r.split for r in assigned.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}
    half = grouped_hash_split(
        docs.filter("doc_id % 2 = 0"), "source", 10, 3
    )
    full_map = {
        (r.source, r.split)
        for r in assigned.select("source", "split").distinct().collect()
    }
    half_map = {
        (r.source, r.split)
        for r in half.select("source", "split").distinct().collect()
    }
    assert half_map <= full_map
    for bad in [(0, 3), (13, 3), (10, 0), (16, 1)]:
        with pytest.raises(ValueError):
            grouped_hash_split(docs, "source", *bad)


def test_bm25_topk_ranking_contract(spark):
    """Top-1 for a single-term query is the doc that repeats the
    term most (all else equal); output bounded by k; deterministic
    across row orders."""
    from big_data_processing_spark.functions.hygiene import bm25_topk

    rows = [
        (0, "apple apple apple apple banana"),
        (1, "apple banana cherry date elderberry"),
        (2, "banana cherry date elderberry fig"),
        (3, "cherry date elderberry fig grape"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(
        docs, "text", "doc_id", {"qa": ["apple"], "qb": ["banana"]}, k=2
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert [r.doc_id for r in by_q["qa"]] == [0, 1]  # tf 4 beats tf 1
    assert len(by_q["qa"]) <= 2 and len(by_q["qb"]) <= 2
    assert all(r.score > 0 for r in out)
    # shorter doc wins at equal tf: doc 1 vs a padded twin
    rows2 = rows + [(4, "banana " + "pad " * 40)]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    out2 = bm25_topk(docs2, "text", "doc_id", {"qb": ["banana"]}, k=4)
    got = [r.doc_id for r in out2.collect()]
    assert got.index(2) < got.index(4)  # 5-token doc beats 41-token doc
    # deterministic under shuffling
    out3 = bm25_topk(
        docs2.orderBy(F.rand(11)), "text", "doc_id", {"qb": ["banana"]}, k=4
    )
    assert [tuple(r) for r in out2.collect()] == [
        tuple(r) for r in out3.collect()
    ]
