"""Deterministic corpus splitting, mixing, and sharding — the
reproducibility-critical half of a training-data pipeline.

Every operator here derives its decision from a cryptographic hash
of a stable key (md5 hex, identical across engines and runs), NOT
from seeded RNG: re-running the pipeline on a grown corpus keeps
every previously-assigned document in the same split/shard bucket,
and any SQL engine can audit the assignment bit-for-bit (these are
the hash-checkable members of the sampling family).

Scale notes
-----------
- md5-of-key decisions are embarrassingly parallel: one projection,
  no shuffle, no state. At 100 TB the split is free.
- ``pack_shards`` is the one op with a global running sum (shard
  boundaries depend on every prior row). The window over a single
  global ordering serializes at the final stage — fine up to ~10^8
  docs of metadata (the window input is (id, size) only, never
  text). Beyond that, shard per (partition-key) group instead: pack
  within e.g. each (source, day) — same code with partition keys
  added to the window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hex_bucket(key: Column, n_hex: int = 2) -> Column:
    """First ``n_hex`` lowercase hex chars of md5(key-as-string) —
    a uniform, engine-independent [0, 16^n_hex) bucket label."""
    return F.substring(
        F.md5(F.encode(key.cast("string"), "UTF-8")), 1, n_hex
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    train_frac_16ths: int = 13,
) -> DataFrame:
    """Deterministic train/val assignment: documents whose first
    md5 hex digit falls below ``train_frac_16ths`` (of 16) go to
    'train' (13/16 ≈ 81%), the rest to 'val'.

    Hash-based (not RNG): stable under re-runs, corpus growth, and
    repartitioning; the same doc never migrates between splits —
    the property that prevents train/val leakage across pipeline
    versions."""
    threshold = format(train_frac_16ths, "x")
    return df.withColumn(
        "split",
        F.when(
            _hex_bucket(F.col(key_col), 1) < F.lit(threshold), "train"
        ).otherwise("val"),
    )


def grouped_hash_split(
    df: DataFrame,
    group_col: str,
    train_16ths: int = 10,
    val_16ths: int = 3,
) -> DataFrame:
    """Group-disjoint train/val/test assignment: the split decision
    hashes the GROUP key (source domain, site, author), so every
    document of a group lands in the same split — the leakage-free
    split a training pipeline needs when near-duplicate documents
    cluster within groups (per-document hashing would scatter a
    domain's near-identical pages across train AND val, leaking
    eval content into training).

    Same md5-hex-digit mechanics as ``hash_split``: deterministic,
    engine-independent, stable under corpus growth — a new document
    of a known group inherits the group's split. Pure projection:
    no shuffle, no state; at 100 TB the assignment is free and the
    disjointness is structural (a function of the group key alone),
    not something a join has to verify."""
    if not (0 < train_16ths and 0 < val_16ths
            and train_16ths + val_16ths < 16):
        raise ValueError(
            "need 0 < train_16ths, 0 < val_16ths, sum < 16; got "
            f"{train_16ths}, {val_16ths}"
        )
    h = _hex_bucket(F.col(group_col), 1)
    t_hi = format(train_16ths, "x")
    v_hi = format(train_16ths + val_16ths, "x")
    return df.withColumn(
        "split",
        F.when(h < F.lit(t_hi), "train")
        .when(h < F.lit(v_hi), "val")
        .otherwise("test"),
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weights_256ths: dict[str, int],
    default_256ths: int = 0,
) -> DataFrame:
    """Weighted per-group deterministic sampling — the data-mixing
    primitive (e.g. keep 50% of web text, 25% of forum text).

    ``weights_256ths[g]`` = keep-rate numerator out of 256 for group
    ``g``; a doc survives iff its first two md5 hex chars compare
    below the group's threshold. Pure projection + filter: no
    shuffle, no state, reproducible anywhere md5 exists."""
    thresholds = F.create_map(
        *[
            x
            for g, w in sorted(weights_256ths.items())
            for x in (F.lit(g), F.lit(format(w, "02x")))
        ]
    )
    thr = F.coalesce(
        thresholds[F.col(group_col)],
        F.lit(format(default_256ths, "02x")),
    )
    return df.filter(_hex_bucket(F.col(key_col), 2) < thr)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    ntok_col: str,
    seq_len: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing manifest — the final step of
    an LLM pretraining pipeline: documents are concatenated in
    ``id_col`` order (within each ``partition_cols`` group) into one
    token stream, which is cut into fixed ``seq_len`` training
    sequences. Unlike :func:`pack_shards` (whole docs into size
    buckets), documents here SPLIT across sequence boundaries; the
    output is one row per (document, sequence) overlap:

      ``seq_id``   — 0-based sequence index within the group
      ``tok_start``/``tok_end`` — the within-document token span
        [start, end) that lands in this sequence

    so a writer can assemble every sequence exactly, and token
    accounting (``sum(tok_end - tok_start) == sum(n_tok)``) is
    auditable in SQL. Zero-token documents are dropped (they occupy
    no span).

    Scale: the running-offset window serializes per group — ``df``
    here is (id, n_tok) metadata, never text, so a group of 10^8
    docs is ~GBs through one task. Pack per (source, day)-style
    groups (as real pipelines shard tokenizer output) and the window
    parallelizes across groups; the explode fan-out is
    ≤ 1 + n_tok/seq_len rows per doc — linear in corpus tokens."""
    n = F.col(ntok_col)
    w = (
        Window.partitionBy(*partition_cols) if partition_cols else Window
    ).orderBy(id_col)
    off = (
        F.sum(n).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - n
    ).alias("__off")
    keep = list(partition_cols or []) + [id_col]
    spans = (
        df.filter(n > 0)
        .select(*keep, n.cast("bigint").alias("__n"), off)
        # materialize the window result before the explode below:
        # seq bounds reference __off twice and generator filter
        # inference would re-inline the window expression
        .select(
            *keep,
            "__n",
            "__off",
            F.explode(
                F.sequence(
                    F.floor(F.col("__off") / seq_len),
                    F.floor((F.col("__off") + F.col("__n") - 1) / seq_len),
                )
            ).alias("seq_id"),
        )
    )
    return spans.select(
        *keep,
        F.col("seq_id").cast("bigint").alias("seq_id"),
        F.greatest(
            F.col("seq_id") * seq_len - F.col("__off"), F.lit(0)
        ).cast("bigint").alias("tok_start"),
        F.least(
            (F.col("seq_id") + 1) * seq_len - F.col("__off"), F.col("__n")
        ).cast("bigint").alias("tok_end"),
    )


def pack_shards(
    df: DataFrame,
    key_col: str,
    size_col: str,
    shard_budget: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Assign documents to training shards by cumulative size
    budget: ``shard_id = floor(running_sum(size) / budget)`` in
    ``key_col`` order (optionally within ``partition_cols`` groups —
    the scale path; see module docstring).

    Deterministic bin packing in one window pass: shard boundaries
    land where the running total crosses each budget multiple, so
    every shard (except the last per group) holds ≥ budget-max(size)
    and ≤ budget+max(size) bytes — the even-shard property writers
    need for balanced training files."""
    w = Window.orderBy(key_col)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(key_col)
    running = F.sum(F.col(size_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "shard_id", F.floor((running - F.col(size_col)) / F.lit(shard_budget))
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int = 1024,
    seed: str = "0",
) -> DataFrame:
    """Seeded global shuffle for training-data ordering, as a
    (shard, pos_in_shard) assignment: rows are ordered by
    md5(seed:key) — uniform and uncorrelated with any data
    attribute — and the hash's first 16 bits place each row in one
    of ``n_shards`` contiguous hash-range shards. ``pos_in_shard``
    is the row's rank within its shard, so a writer that emits
    shards in id order, each sorted by pos, reproduces ONE global
    deterministic permutation of the corpus — re-runnable bit-for-
    bit on any engine with md5 (no seeded RNG, no engine-specific
    hash). Changing ``seed`` gives an independent permutation
    (epoch reshuffling).

    Scale: the hash is a pure projection; the only wide op is the
    per-shard rank window, which parallelizes across shards —
    each shard sorts ~|corpus|/n_shards metadata rows. Size
    n_shards so a shard's (key, hash) pairs fit one task."""
    h = F.md5(
        F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))
    )
    v = F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
    out = df.withColumn("__h", h).withColumn(
        "shard", F.floor(v * n_shards / F.lit(65536)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("__h", key_col)
    return out.withColumn(
        "pos_in_shard", F.row_number().over(w).cast("bigint")
    ).drop("__h")


def chunk_documents(
    df: DataFrame,
    toks_col: str,
    id_col: str,
    chunk_size: int = 16,
    overlap: int = 4,
) -> DataFrame:
    """Sliding-window document chunking — the context-window
    preparation step of a training/RAG pipeline: each document's
    token array is cut into chunks of ``chunk_size`` tokens whose
    starts advance by ``stride = chunk_size - overlap``, so
    consecutive chunks share ``overlap`` tokens and no token is
    dropped. Emits one row per chunk:

      ``chunk_id``  — 0-based chunk index within the document
      ``tok_start`` — 0-based token offset of the chunk
      ``n_tok``     — chunk length (< chunk_size only for the tail)
      ``chunk_text``— the chunk's tokens re-joined with spaces

    Pure integer arithmetic on an already-materialized token array
    (``toks_col`` must be a bound column, not an expression — the
    same HOF-inlining discipline as winnowing); empty documents
    emit no chunks. Chunk starts are multiples of the stride, so
    downstream can recover ``chunk_id = tok_start / stride``
    without ordinality.

    Scale: one projection + one generator — no shuffle, no state;
    fan-out is ≤ 1 + n_tok/stride rows per doc, linear in corpus
    tokens."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toks = F.col(toks_col)
    n = F.size(toks)
    # n_chunks = 1 + ceil(max(n - chunk_size, 0) / stride), in exact
    # integer arithmetic (identical across engines)
    extra = F.greatest(n - chunk_size, F.lit(0))
    n_chunks = F.lit(1) + F.floor(
        (extra + (stride - 1)) / F.lit(stride)
    ).cast("int")
    starts = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride
        ),
    ).otherwise(F.array().cast("array<int>"))
    with_starts = df.select(
        F.col(id_col), toks.alias("__toks"), starts.alias("__starts")
    )
    exploded = with_starts.select(
        id_col,
        "__toks",
        F.explode("__starts").alias("tok_start"),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("tok_start") + 1, chunk_size
    )
    return exploded.select(
        id_col,
        (F.col("tok_start") / stride).cast("bigint").alias("chunk_id"),
        F.col("tok_start").cast("bigint"),
        F.size(chunk).cast("bigint").alias("n_tok"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def temperature_mixture_weights(
    df: DataFrame,
    key_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual /
    multi-source sampling scheme of mC4 and XLM-R): group shares
    p_k = n_k / N are flattened to q_k ∝ p_k^alpha, which boosts
    low-resource groups without letting any group dominate. Since
    q_k = n_k^alpha / Σ n_j^alpha, the global total cancels and one
    tiny aggregate suffices. Emits per group:

      ``n_docs``        — group size
      ``raw_share``     — p_k
      ``adj_share``     — q_k (the sampling distribution to draw from)
      ``sample_weight`` — q_k / p_k (per-doc up/down-sampling factor,
        the multiplier a mixture sampler feeds ``mixture_sample``)

    Scale: one partial-agg groupBy over the corpus + a 1-row
    broadcast join of the normalization constants — the group list
    (languages, sources) is assumed driver-small."""
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    norms = counts.agg(
        F.sum("n_docs").cast("double").alias("__tot"),
        F.sum(F.pow(F.col("n_docs").cast("double"), alpha)).alias(
            "__tot_a"
        ),
    )
    p = F.col("n_docs") / F.col("__tot")
    q = F.pow(F.col("n_docs").cast("double"), alpha) / F.col("__tot_a")
    return (
        counts.crossJoin(F.broadcast(norms))
        .select(
            key_col,
            "n_docs",
            F.round(p, 6).alias("raw_share"),
            F.round(q, 6).alias("adj_share"),
            F.round(q / p, 6).alias("sample_weight"),
        )
    )
