"""Text-analysis functions for large-scale document pipelines:
normalization, token statistics, quality scoring, language ID,
fingerprinting (north-star extension, SURVEY.md §7.4).

Everything here is built from JVM-side ``pyspark.sql.functions``
(regexp/string/array expressions inside whole-stage codegen) — no
Python UDFs in any hot path, so these run at scan speed over 100 TB
of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword marker sets for the n-gram/stopword
# language heuristic. Deliberately tiny and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "de", "es"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]


def normalize_text(col: Column) -> Column:
    """Lowercase + collapse whitespace + trim — the canonical form
    used for fingerprinting and dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text → array<string>.

    Empty tokens are removed — ``split("", " ")`` yields ``[""]``,
    which would count whitespace-only documents as having one token
    (found by the hypothesis property suite)."""
    return F.array_remove(F.split(normalize_text(col), " "), "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-ish proxy token count: word-piece-like segments
    (letter runs, digit runs, single punctuation) counted via
    regexp extraction — a deterministic stand-in for a real
    tokenizer's token count."""
    return F.size(
        F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    )


def avg_token_length(col: Column) -> Column:
    toks = tokens(col)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size(toks),
    ).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    n = F.length(col)
    stripped = F.length(
        F.regexp_replace(col, r"[!-/:-@\[-`{-~]", "")
    )
    return F.when(n > 0, (n - stripped).cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (array-filter based —
    stays JVM-side; the stopword list is a literal array)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column) -> Column:
    """Composite document quality heuristic in [0, 1]: rewards
    mid-length docs and plausible word shape, penalizes punctuation
    soup. Deterministic, explainable, cheap."""
    n_tok = token_count(col).cast("double")
    length_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    shape_score = F.when(
        (avg_token_length(col) >= 2) & (avg_token_length(col) <= 12),
        F.lit(1.0),
    ).otherwise(F.lit(0.5))
    punct_penalty = F.least(punct_ratio(col) * 2.0, F.lit(1.0))
    score = length_score * 0.5 + shape_score * 0.3 + (1.0 - punct_penalty) * 0.2
    return F.round(score, 4)


def marker_hits(col: Column, words: list[str]) -> Column:
    """Occurrence count of any marker word (token-exact) in the text."""
    sw = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def lang_id_from_hits(hits: dict[str, Column]) -> Column:
    """Argmax over per-language marker-hit columns; ties go to the
    alphabetically-first language; 'und' when all counts are zero.

    Implemented as a CASE ladder (branch i: hits_i > 0 AND hits_i >=
    every other) so the exact same logic is expressible in ANSI SQL
    for the oracle."""
    codes = sorted(hits)
    expr: Column | None = None
    for code in codes:
        cond = hits[code] > 0
        for other in codes:
            if other != code:
                cond = cond & (hits[code] >= hits[other])
        expr = F.when(cond, code) if expr is None else expr.when(cond, code)
    assert expr is not None
    return expr.otherwise(F.lit("und"))


def lang_id(col: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Stopword-marker language ID (n-gram heuristic family):
    argmax of per-language marker hit counts."""
    markers = markers or LANG_MARKERS
    return lang_id_from_hits(
        {code: marker_hits(col, words) for code, words in markers.items()}
    )


def md5_fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized
    text. Engine-portable (md5 is standard), used for exact-dup
    detection across pipelines."""
    return F.md5(normalize_text(col))


def char_jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of the character *sets* of two strings
    (DuckDB-`jaccard`-compatible semantics)."""
    ca = F.array_distinct(F.split(a, ""))
    cb = F.array_distinct(F.split(b, ""))
    inter = F.size(F.array_intersect(ca, cb))
    union = F.size(F.array_union(ca, cb))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def char_ngrams_of_norm(norm: Column, n: int = 3) -> Column:
    """Distinct character n-grams (shingles) of an ALREADY-normalized
    text column. ``norm`` must be a materialized column reference
    (see ``char_ngrams`` for why), not a normalization expression."""
    count = F.greatest(F.length(norm) - (n - 1), F.lit(0))
    idx = F.when(count > 0, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(n))))


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams (shingles) of the normalized text
    — the input sets for MinHash/Jaccard dedup.

    PERF: the normalization expression inside the transform lambda
    re-executes per array element (measured 8× slower at corpus
    scale). Hot paths should ``withColumn("nrm", normalize_text(c))``
    first and call ``char_ngrams_of_norm(F.col("nrm"), n)`` so the
    regex runs once per row — the DataFrame helpers in
    functions/dedup.py do exactly that."""
    return char_ngrams_of_norm(normalize_text(col), n)


def char_ngram_hashes_of_norm(norm: Column, n: int = 3) -> Column:
    """Distinct 64-bit hashes of the character n-grams of an
    ALREADY-normalized text column (``array<long>``).

    The set-similarity operators (Jaccard intersect/union, MinHash)
    only need set identity, not the gram strings themselves — and
    ``array_intersect``/``array_union`` over primitive longs are far
    cheaper than over strings, and an 8-byte hash shuffles narrower
    than a (multi-byte) gram. Collisions change a similarity value
    only if two distinct grams of the same document pair collide:
    probability ~|grams|²/2⁶⁴ per document — negligible below ~10⁹
    distinct grams per doc."""
    count = F.greatest(F.length(norm) - (n - 1), F.lit(0))
    idx = F.when(count > 0, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(norm.substr(i, F.lit(n))))
    )


def kgram_hashes_ordered(norm: Column, k: int = 5) -> Column:
    """POSITIONAL (non-deduped) k-gram hashes of an already-
    normalized text column — window order matters for winnowing."""
    count = F.greatest(F.length(norm) - (k - 1), F.lit(0))
    idx = F.when(count > 0, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.xxhash64(norm.substr(i, F.lit(k))))


def winnow_of_hashes(hashes: Column, window: int = 4) -> Column:
    """Winnowing sketch of a MATERIALIZED ordered k-gram hash array:
    minimum of each sliding window, deduplicated + sorted.

    ``hashes`` must be a bound column reference, not the hash
    expression itself — an expression inlined here re-executes per
    window element, turning the sketch O(n²) per document (measured
    ~40× slower at corpus scale; same trap as ``char_ngrams``)."""
    n_windows = F.greatest(F.size(hashes) - (window - 1), F.lit(0))
    widx = F.when(n_windows > 0, F.sequence(F.lit(0), n_windows - 1)).otherwise(
        F.array().cast("array<int>")
    )
    mins = F.transform(
        widx, lambda w: F.array_min(F.slice(hashes, w + 1, window))
    )
    return F.array_sort(F.array_distinct(mins))


def winnowing_fingerprints(
    col: Column, k: int = 5, window: int = 4
) -> Column:
    """Winnowing fingerprints (rolling-hash document sketch, the
    MOSS scheme): hash every k-gram, then keep the MINIMUM hash of
    each sliding window of ``window`` consecutive k-gram hashes,
    deduplicated (array<long>).

    Guarantees: any shared substring of length ≥ k + window - 1
    between two documents yields at least one shared fingerprint —
    the basis for plagiarism/near-copy detection at corpus scale
    with a sketch ~|doc|/window long. All JVM-side expressions.

    PERF: convenience form — inlines the hash expression into the
    window lambda, which re-executes per window. Hot paths MUST
    materialize in two steps:
    ``select(kgram_hashes_ordered(norm).alias("h"))`` then
    ``select(winnow_of_hashes(F.col("h")))``."""
    return winnow_of_hashes(
        kgram_hashes_ordered(normalize_text(col), k), window
    )


# Default redaction patterns: email, URL, long digit runs
# (phone/SSN-ish). Java-regex and RE2 compatible subset — no
# backrefs, no lookaround — so the same pattern string runs in any
# engine that audits the scrub.
PII_PATTERNS = [
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    r"https?://[^\s]+",
    r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
]


def scrub_pii(
    col: Column, patterns: list[str] | None = None, mask: str = "[REDACTED]"
) -> Column:
    """Redact every match of each pattern with ``mask`` — the
    PII-removal pass a training corpus gets before anything else.
    One JVM-side regexp_replace per pattern, fused into a single
    projection by codegen; no Python, no shuffle."""
    out = col
    for p in patterns or PII_PATTERNS:
        out = F.regexp_replace(out, p, mask)
    return out


def pattern_count(col: Column, patterns: list[str] | None = None) -> Column:
    """Total match count across patterns (the scrub audit metric)."""
    total = F.lit(0)
    for p in patterns or PII_PATTERNS:
        total = total + F.regexp_count(col, F.lit(p))
    return total
