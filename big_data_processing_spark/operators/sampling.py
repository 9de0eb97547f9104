"""Sampling operators.

Re-expresses SA1/SA2 (`/root/reference/src/main.py:149-153,166-169`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fraction_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """SA1: seeded Bernoulli sample (reference `main.py:149-153`).
    Per-partition, no shuffle — safe at any scale."""
    return df.sample(fraction=fraction, seed=seed)


def fixed_size_sample(
    df: DataFrame,
    n: int,
    seed: int = 42,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """SA2: exact-n random sample (reference capped pandas
    ``sample(n=1000)``, `main.py:166-169`).

    Spark has no native exact-n sample; both paths plan as
    TakeOrderedAndProject — a per-partition top-n plus a driver
    merge of n rows per partition, not a full sort.

    With ``id_cols``, the random key is ``md5(seed:id...)`` — the
    A-ES uniform-draw trick with uniform weights — so the sample is
    identical on ANY engine and ANY partitioning (a value-checkable
    driver row, and the reproducibility a training-data lineage
    audit needs). Without ``id_cols`` it falls back to
    ``rand(seed)``, which is seeded per-partition and therefore
    stable only for a fixed partitioning (SURVEY.md §7.3 caveat).
    """
    if id_cols:
        h = F.md5(
            F.concat_ws(
                ":",
                F.lit(str(seed)),
                *[F.col(c).cast("string") for c in id_cols],
            )
        )
        key = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
        return (
            df.withColumn("__skey", key)
            .orderBy(F.col("__skey"), *[F.col(c) for c in id_cols])
            .limit(n)
            .drop("__skey")
        )
    return df.orderBy(F.rand(seed)).limit(n)


def systematic_sample(
    df: DataFrame,
    key_col: str,
    every: int = 100,
    offset: int = 0,
) -> DataFrame:
    """Deterministic 1-in-``every`` systematic sample by key
    arithmetic: keeps rows where ``key % every == offset``.

    Engine-independent (same rows in any SQL engine — the
    hash-checked member of the sampling family) and fully
    reproducible across runs/partitionings, unlike seeded RNG
    samples. Statistically sound when the key is uncorrelated with
    the measures (e.g. a surrogate id); use ``offset`` to draw
    disjoint replicates. One scan, no shuffle, pushed to the
    parquet reader as a predicate."""
    return df.filter(F.pmod(F.col(key_col), F.lit(every)) == offset)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): each key keeps
    its own fraction — the standard class-balancing sample for
    training sets. Keys absent from ``fractions`` are dropped.
    One scan, no shuffle; executors filter rows by a seeded hash."""
    return df.stat.sampleBy(strata_col, fractions, seed)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "0",
) -> DataFrame:
    """Deterministic weighted sample without replacement (Efraimidis
    & Spirakis A-ES): each row draws a uniform u from md5(seed:id)
    — not a seeded RNG, so the draw is identical on any engine and
    any partitioning — and the k rows with the largest u^(1/weight)
    win. Inclusion probability is proportional to weight, exactly
    the reservoir-sampling semantics, but expressed as a pure
    projection + top-k.

    Scale: no shuffle at all — ``orderBy(key).limit(k)`` plans as
    TakeOrderedAndProject (per-partition top-k, driver merges k
    rows per partition). Changing ``seed`` draws an independent
    sample; the same seed is exactly reproducible forever, which is
    what a training-data lineage audit needs.

    A-ES requires strictly positive weights (weight < 0 would make
    u^(1/w) > 1 and sort FIRST; weight = 0 a null key), so
    non-positive-weight rows are filtered out — they have zero
    inclusion probability under the sampling semantics anyway.
    """
    df = df.filter(F.col(weight_col) > 0)
    h = F.md5(
        F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    )
    v = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
    u = (v + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.withColumn("__wkey", key)
        .orderBy(F.col("__wkey").desc(), F.col(id_col))
        .limit(k)
        .drop("__wkey")
    )
