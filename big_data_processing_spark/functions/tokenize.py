"""Trained BPE tokenizer: sample-trained merges, distributed apply.

North-star extension — the reference has no tokenizer (SURVEY.md
§2.8); the existing token queries (token_count_histogram /
token_topk) count whitespace/regex tokens. This module adds the
piece an LLM-data pipeline actually runs before training: a REAL
byte-pair-encoding tokenizer (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016).

Scale design — the standard 100 TB split:

* TRAINING is driver-side over a BOUNDED, deterministic sample
  (``orderBy(id).limit(n)`` → collect). This mirrors production
  practice (tokenizers train on a corpus sample measured in MBs,
  never the full corpus) and the repo's bounded-collect contract
  (IVF centroids train the same way). The artifact is a merge
  list — KBs.
* APPLICATION is distributed: the merge ranks broadcast to
  executors inside an Arrow-batched ``mapInPandas``; each batch
  memoizes word → token expansions (natural text repeats words
  heavily, so the amortized cost per word is a dict hit). No
  per-row Python beyond the batch loop; no shuffle — tokenization
  is embarrassingly parallel.

Determinism contract (what makes the roundtrip audit hash-green at
every sf): merge selection breaks count ties lexicographically, the
sample is keyed by ``orderBy(id)``, and encoding is a pure function
of (merges, word) — so the same corpus always yields the same
tokens, with no RNG anywhere.

Word model: whitespace pre-tokenization; each word becomes its
character sequence plus a terminal ``</w>`` symbol (the original
BPE formulation), so decoding is exact: concatenate tokens, turn
``</w>`` into a space, strip the trailing one. Characters unseen
in training pass through as single-character tokens — the vocab is
open at the character level, there is no UNK loss.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EOW = "</w>"


def train_bpe_merges(
    texts: list[str], num_merges: int
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from ``texts``.

    Pure, deterministic: the most frequent adjacent symbol pair is
    merged each step, count ties broken by lexicographic pair
    order; stops early when no pair occurs twice.
    """
    word_freq: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in (t or "").split():
            word_freq[(*w, EOW)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for sym, n in word_freq.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best[1] < 2:
            break
        pair = best[0]
        merged = pair[0] + pair[1]
        new_freq: Counter[tuple[str, ...]] = Counter()
        for sym, n in word_freq.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == pair[0]
                    and sym[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_freq[tuple(out)] += n
        word_freq = new_freq
        merges.append(pair)
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Standard rank-greedy BPE apply: repeatedly merge the
    lowest-rank adjacent pair present."""
    sym = [*word, EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_decode(tokens: list[str]) -> str:
    """Exact inverse of encoding: token concat, ``</w>`` → space."""
    return "".join(tokens).replace(EOW, " ").rstrip(" ")


def train_bpe_from_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_merges: int = 200,
    sample_docs: int = 512,
) -> list[tuple[str, str]]:
    """Deterministic bounded-sample training off a DataFrame: the
    first ``sample_docs`` rows by ``id_col`` (a pushed-down
    TakeOrderedAndProject — the scan never materializes the corpus)
    feed :func:`train_bpe_merges`. The collect is bounded by
    ``sample_docs``, not the table."""
    rows = (
        df.select(id_col, text_col)
        .orderBy(id_col)
        .limit(sample_docs)
        .collect()
    )
    return train_bpe_merges([r[1] for r in rows], num_merges)


def bpe_encode_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Distributed BPE apply: (id, tokens array<string>, n_tokens,
    roundtrip_ok boolean).

    ``roundtrip_ok`` pins the lossless contract row-by-row on the
    executors (decode(encode(text)) == whitespace-normalized text),
    so the audit query aggregates booleans instead of shipping
    token arrays anywhere.
    """
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = bc.value
        cache: dict[str, list[str]] = {}

        def enc(text: str) -> tuple[list[str], bool]:
            toks: list[str] = []
            words = (text or "").split()
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            return toks, bpe_decode(toks) == " ".join(words)

        for pdf in batches:
            encoded = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "tokens": [e[0] for e in encoded],
                    "n_tokens": [len(e[0]) for e in encoded],
                    "roundtrip_ok": [e[1] for e in encoded],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        gen,
        schema="id long, tokens array<string>, n_tokens long, "
        "roundtrip_ok boolean",
    )


_MERGES_CACHE: dict[tuple[int, str, int, int], list[tuple[str, str]]] = {}


def corpus_bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    cache_key: str,
    num_merges: int = 200,
    sample_docs: int = 512,
) -> list[tuple[str, str]]:
    """Per-(session, corpus) memoized training — the bench and the
    driver invoke a query several times; the merge list is a pure
    function of the corpus sample, so train once."""
    key = (id(spark), cache_key, num_merges, sample_docs)
    if key not in _MERGES_CACHE:
        _MERGES_CACHE[key] = train_bpe_from_table(
            docs, "text", "doc_id", num_merges, sample_docs
        )
    return _MERGES_CACHE[key]


def bpe_roundtrip_report(encoded: DataFrame) -> DataFrame:
    """One-row audit frame: every encode must decode back exactly,
    and every non-empty text must produce tokens."""
    return encoded.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("roundtrip_ok").cast("long")).alias(
            "n_roundtrip_ok"
        ),
        F.sum((F.col("n_tokens") > 0).cast("long")).alias(
            "n_tokenized"
        ),
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (Kudo, "Subword Regularization", ACL 2018 —
# the SentencePiece unigram model), hard-EM variant: the second real
# tokenizer family next to BPE. Same 100 TB split: driver-side
# training on the bounded deterministic sample, distributed
# Arrow-batched apply with a broadcast vocabulary.
#
# Honest simplification, documented: full Kudo training computes
# EXPECTED piece counts via forward-backward over all segmentations
# and prunes by held-out likelihood loss; this implementation uses
# Viterbi (hard) EM — each iteration segments the sample with the
# current piece log-probs, re-estimates probs from the hard counts,
# and prunes zero-count multi-char pieces, then cuts to vocab_size
# by (count, piece) order. Deterministic end-to-end: no RNG, float
# ties in Viterbi break toward the LONGER piece then lexicographic.

WB = "▁"  # SentencePiece word-boundary marker


def _viterbi_segment(
    word: str, logp: dict[str, float], max_len: int
) -> list[str]:
    """Best segmentation of ``word`` into vocabulary pieces.
    Characters missing from the vocabulary pass through as
    single-char pieces at a fixed penalty — open vocab, no UNK
    loss (mirrors the BPE module's contract)."""
    unk = min(logp.values(), default=0.0) - 10.0
    n = len(word)
    best = [0.0] + [float("-inf")] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = unk
            score = best[j] + lp
            # strictly-better wins; on an exact tie prefer the
            # longer final piece (smaller j) — j ascends, so keep
            # the first maximum
            if score > best[i]:
                best[i], back[i] = score, j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def train_unigram_vocab(
    texts: list[str],
    vocab_size: int = 400,
    max_piece_len: int = 8,
    em_iters: int = 4,
) -> dict[str, float]:
    """Learn a unigram-LM piece vocabulary (piece → log-prob).

    Seed = every substring of every sample word up to
    ``max_piece_len`` chars, weighted by word frequency; then
    ``em_iters`` rounds of Viterbi-EM (segment → hard counts →
    re-estimate), pruning unused multi-char pieces each round and
    finally cutting to ``vocab_size`` by (count desc, piece asc).
    Single characters are never pruned (open vocabulary)."""
    import math

    word_freq: Counter[str] = Counter()
    for t in texts:
        for w in (t or "").split():
            word_freq[w] += 1
    counts: Counter[str] = Counter()
    for w, n in word_freq.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                counts[w[i : i + ln]] += n
    chars = {p for p in counts if len(p) == 1}
    total = sum(counts.values())
    logp = {p: math.log(c / total) for p, c in counts.items()}
    for _ in range(em_iters):
        used: Counter[str] = Counter()
        for w, n in word_freq.items():
            for piece in _viterbi_segment(w, logp, max_piece_len):
                used[piece] += n
        # chars always survive (smoothed at count 1 when unused)
        for ch in chars:
            used.setdefault(ch, 1)
        kept = {p: c for p, c in used.items() if c > 0}
        if len(kept) > vocab_size:
            ordered = sorted(
                kept.items(), key=lambda kv: (-kv[1], kv[0])
            )
            keep_set = {p for p, _ in ordered[:vocab_size]} | chars
            kept = {p: c for p, c in kept.items() if p in keep_set}
        tot = sum(kept.values())
        logp = {p: math.log(c / tot) for p, c in kept.items()}
    return logp


def unigram_decode(tokens: list[str]) -> str:
    """Exact inverse: concat, ``▁`` → space, strip the leading one."""
    return "".join(tokens).replace(WB, " ").lstrip(" ")


def unigram_encode_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: dict[str, float],
    max_piece_len: int = 8,
) -> DataFrame:
    """Distributed unigram-LM apply: (id, tokens array<string>,
    n_tokens, roundtrip_ok). The first piece of each word carries
    the ``▁`` word-boundary prefix (SentencePiece convention), so
    the token stream alone reconstructs the normalized text;
    ``roundtrip_ok`` is computed row-by-row on the executors."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(vocab)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        logp = bc.value
        cache: dict[str, list[str]] = {}

        def enc(text: str) -> tuple[list[str], bool]:
            words = (text or "").split()
            toks: list[str] = []
            for w in words:
                got = cache.get(w)
                if got is None:
                    pieces = _viterbi_segment(w, logp, max_piece_len)
                    got = [WB + pieces[0], *pieces[1:]] if pieces else []
                    cache[w] = got
                toks.extend(got)
            return toks, unigram_decode(toks) == " ".join(words)

        for pdf in batches:
            encoded = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "tokens": [e[0] for e in encoded],
                    "n_tokens": [len(e[0]) for e in encoded],
                    "roundtrip_ok": [e[1] for e in encoded],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        gen,
        schema="id long, tokens array<string>, n_tokens long, "
        "roundtrip_ok boolean",
    )


_UNIGRAM_CACHE: dict[tuple[int, str, int], dict[str, float]] = {}


def corpus_unigram_vocab(
    spark: SparkSession,
    docs: DataFrame,
    cache_key: str,
    vocab_size: int = 400,
    sample_docs: int = 512,
) -> dict[str, float]:
    """Per-(session, corpus) memoized training, mirror of
    :func:`corpus_bpe_merges`."""
    key = (id(spark), cache_key, vocab_size)
    if key not in _UNIGRAM_CACHE:
        rows = (
            docs.select("doc_id", "text")
            .orderBy("doc_id")
            .limit(sample_docs)
            .collect()
        )
        _UNIGRAM_CACHE[key] = train_unigram_vocab(
            [r[1] for r in rows], vocab_size=vocab_size
        )
    return _UNIGRAM_CACHE[key]
