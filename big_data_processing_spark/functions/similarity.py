"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH bucketed variant as the scale path
(north-star extension, SURVEY.md §7.4).

Scale notes
-----------
- Brute force is a broadcast nested loop: the query set (small) is
  broadcast, the corpus streams once — O(|corpus|·|queries|·dim)
  with zero corpus shuffle. Right up to ~10^3 queries; beyond that,
  bucket.
- The LSH variant assigns each vector to a signature bucket from
  the sign pattern of dot products with deterministic pseudo-random
  hyperplanes; candidates come only from matching buckets (an
  equi-join on the signature — shuffles ids+vectors once, then the
  per-bucket work is tiny). Recall is tunable via num_planes /
  multi-probe; this is the same design as FAISS IVF/LSH front-ends.
- All vector math is JVM-side (``zip_with`` + ``aggregate`` fold in
  whole-stage codegen). A Pandas-UDF BLAS path is a drop-in swap if
  dim grows to thousands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_processing_spark.operators.windows import topk_per_group


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision (mirrors the
    DuckDB oracle's list_dot_product evaluation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot(a,b) / (||a||·||b||), NULL-safe on zero norms."""
    denom = F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    ndigits: int = 8,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, vec_id, cos, rank), rank 1..k, excluding
    self-matches. Ties break on neighbor id (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("q_vec"), F.col(vec_col)), ndigits).alias(
                "cos"
            ),
        )
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos").desc(), F.col(id_col)],
        k,
    ).select("query_id", id_col, "cos", "rank")


def hyperplane_signature(
    vec: Column, dim: int, num_planes: int = 8
) -> Column:
    """Random-hyperplane LSH signature: bit i = sign of <v, h_i>
    where h_i is a deterministic pseudo-random ±1 hyperplane derived
    from xxhash64(plane, component) — reproducible with no stored
    model."""
    bits = []
    for p in range(num_planes):
        signs = F.array(*[
            F.when(
                F.xxhash64(F.lit(f"plane-{p}-{d}")) % 2 == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0))
            for d in range(dim)
        ])
        proj = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(
            F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    ndigits: int = 8,
) -> DataFrame:
    """Approximate top-k cosine: candidates restricted to vectors
    sharing the query's hyperplane-LSH bucket, then exact cosine +
    rank within candidates. Trades recall for a bucket equi-join
    instead of a full cross product."""
    sig = F.col(vec_col)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_signature(sig, dim, num_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_signature(sig, dim, num_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("q_vec"), F.col(vec_col)), ndigits).alias(
                "cos"
            ),
        )
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos").desc(), F.col(id_col)],
        k,
    ).select("query_id", id_col, "cos", "rank")


def cosine_near_dup_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    ndigits: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking keys:
    all (id_a < id_b) pairs sharing ``block_cols`` whose cosine
    similarity meets ``threshold``.

    Blocking (cluster id / label / LSH bucket) keeps the self-join
    from going quadratic over the corpus — the standard shape for
    embedding-based dedup of a training set. For unblocked corpora,
    feed ``hyperplane_signature`` buckets as the block column.
    """
    base = df.select(
        *block_cols, F.col(id_col), F.col(vec_col)
    )
    left = base.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
    )
    right = base.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
    )
    return (
        left.join(right, on=block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos", F.round(cosine(F.col("v_a"), F.col("v_b")), ndigits)
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
