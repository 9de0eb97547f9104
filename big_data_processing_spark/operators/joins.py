"""Join operators (north-star extension — the reference has no joins,
SURVEY.md §2.8; these follow the TPC-H-style patterns its corpus
enables).

Scale notes
-----------
- ``dim_join`` broadcasts the small side explicitly: dimension
  tables (region/nation/supplier/customer at typical star-schema
  ratios) fit in executor memory, so the fact table never shuffles.
  At 100 TB of facts this is the difference between a map-side join
  and a multi-TB exchange.
- ``fact_join`` leaves strategy to Catalyst + AQE (sort-merge with
  runtime skew splitting). Callers can pre-bucket both sides on the
  key to eliminate the shuffle entirely for repeated joins.
- ``salted_join`` handles a known-skewed key set without AQE by
  exploding the hot keys' build side over ``salt`` replicas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Broadcast-hash join of a fact table against a small dimension."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def fact_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Large-to-large join; Catalyst picks sort-merge/shuffle-hash,
    AQE splits skewed partitions at runtime."""
    return left.join(right, on=on, how=how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each left-side key over
    ``salt`` shards and replicate the right side per shard.

    Use when one key dominates (power-law keys) and AQE's runtime
    skew handling isn't available (e.g. bucketed inputs). Costs a
    ``salt``× blow-up of the right side — keep the right side the
    smaller input.

    Only left-preserving join types are supported: the right side is
    replicated across all salt shards, so 'right'/'full' would emit
    each unmatched right row ``salt`` times.
    """
    if how not in {"inner", "left", "left_semi", "left_anti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, "
            f"not {how!r}: the replicated right side would duplicate "
            f"unmatched right rows"
        )
    left_salted = left.withColumn(
        "__salt", (F.rand(42) * salt).cast("int")
    )
    right_salted = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    out = left_salted.join(right_salted, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time (as-of) join: attach to each left row the most
    recent right row with ``right_ts <= left_ts``, per key
    (``direction="backward"``, the default) — or, with
    ``direction="forward"``, the NEXT right row with
    ``right_ts >= left_ts`` (e.g. each click matched to the user's
    next purchase). Forward is the same union+window formulation
    with the sort reversed; both directions match equal timestamps.

    Spark-first formulation: a naive range join is quadratic per key,
    so instead both sides are tagged and unioned, sorted once within
    each key partition, and the latest right payload is carried
    forward with ``last(ignorenulls)`` — ONE shuffle on the key,
    linear work, and the sort is the same exchange a sort-merge join
    would have paid anyway. Equal timestamps match (right sorts
    before left at the same instant).

    ``payload_cols`` are the right-side columns to carry (emitted as
    ``{prefix}{col}``). Determinism requires right to be unique per
    (key, right_ts); pre-aggregate otherwise. ``how``: 'left' keeps
    unmatched left rows (null payload), 'inner' drops them.
    """
    keys = [on] if isinstance(on, str) else list(on)
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p"),
        F.lit(0).alias("__is_left"),
    )
    lhs = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__is_left", F.lit(1)
    )
    combined = lhs.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__is_left").asc()]
    elif direction == "forward":
        order = [F.col("__ts").desc(), F.col("__is_left").asc()]
    else:
        raise ValueError(f"direction must be backward|forward: {direction}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = combined.withColumn(
        "__match", F.last("__p", ignorenulls=True).over(w)
    ).filter(F.col("__is_left") == 1)
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())
    out = matched.select(
        *[c for c in left.columns],
        *[
            F.col(f"__match.{c}").alias(f"{prefix}{c}")
            for c in payload_cols
        ],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    max_gap_sec: int,
    how: str = "inner",
) -> DataFrame:
    """Interval (range) join: all (left, right) pairs per key with
    ``right_ts ∈ [left_ts - max_gap_sec, left_ts]`` — every right
    event at-or-before the left one within the gap (attribution,
    sensor correlation). Batch twin of
    ``streaming/joins.interval_join_streams``.

    Spark-first formulation: a bare equi-join on the key with the
    range as a post-filter is quadratic in events-per-key (one hot
    key = one giant partition of all-pairs work). Instead both sides
    get a coarse time bucket of ``max_gap_sec`` width appended to
    the equi-join keys: a qualifying right row lives either in the
    left row's bucket or the one before it, so the left side
    explodes to those two bucket ids and the join runs on
    (key, bucket) — pair work per task is bounded by events per
    (key, gap-window), not per key, and the exact range predicate
    filters inside the join. Each qualifying pair matches exactly
    once (the right row's bucket id is unique). Only ``how='inner'``
    is supported: the exploded left would emit spurious null-matches
    under outer semantics — keep-unmatched-left cases are served by
    :func:`asof_join` (latest match or null, one shuffle).
    """
    if how != "inner":
        raise ValueError(f"interval_join supports inner only, not {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    l_bucket = F.floor(F.unix_timestamp(F.col(left_ts)) / max_gap_sec)
    r_bucket = F.floor(F.unix_timestamp(F.col(right_ts)) / max_gap_sec)
    lhs = left.withColumn(
        "__bucket", F.explode(F.array(l_bucket - 1, l_bucket))
    )
    rhs = right.withColumn("__bucket", r_bucket)
    in_range = (F.col(right_ts) <= F.col(left_ts)) & (
        F.col(right_ts)
        >= F.col(left_ts) - F.make_interval(secs=F.lit(max_gap_sec))
    )
    joined = lhs.join(rhs, [*keys, "__bucket"], "inner").filter(in_range)
    out_cols = [
        *left.columns,
        *[c for c in right.columns if c not in set(keys)],
    ]
    return joined.select(*out_cols)


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block_left,
    block_right,
    max_dist: int = 3,
) -> DataFrame:
    """Approximate string (edit-distance) join with candidate
    blocking — the entity-resolution workhorse.

    A naive fuzzy join is a cross product with a Levenshtein
    predicate — quadratic and non-pushable. This runs the classic
    two-phase recipe instead: an EQUI-join on a cheap blocking key
    (``block_left``/``block_right`` Columns, e.g. first token,
    soundex, length band) generates candidates, and the exact
    ``levenshtein`` predicate verifies them inside the join. Pair
    work is bounded by the largest block, never |L|×|R|; at 100 TB
    the blocking key is the only shuffle key. Recall is governed by
    the blocking function (a candidate must share the block) — use
    multiple passes with different keys for higher recall, the same
    multi-table trick LSH uses.

    Returns left ∥ right columns plus ``dist`` (edit distance ≤
    ``max_dist``). Trivial self-matches are NOT filtered — callers
    dedupe/direct pairs with their own id predicate.
    """
    lhs = left.withColumn("__blk", block_left)
    rhs = right.withColumn("__blk", block_right)
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return (
        lhs.join(rhs, on="__blk")
        .filter(dist <= max_dist)
        .drop("__blk")
        .withColumn("dist", dist)
    )
