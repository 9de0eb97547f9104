"""Round-5 advanced operators: k-means / SemDeDup, blocked fuzzy
join, funnel, SCD2 collapse, PageRank."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_processing_spark.functions.semantic import (
    kmeans_assign,
    kmeans_assign_twolevel,
    semantic_dedup_drops,
    semantic_dedup_pairs,
)
from big_data_processing_spark.operators.graph import pagerank
from big_data_processing_spark.operators.joins import blocked_fuzzy_join
from big_data_processing_spark.operators.windows import collapse_runs


def _emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


def test_kmeans_assign_separable(spark):
    # two tight groups on orthogonal axes; seeds = ids 0 and 1
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),
        (3, [0.1, 0.9]),
        (4, [1.0, 0.05]),
        (5, [0.05, 1.0]),
    ]
    out = kmeans_assign(_emb(spark, rows), k=2, iters=2).collect()
    got = {r.vec_id: r.cluster for r in out}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}
    # assigned cosine is to the UPDATED centroid, still near 1
    assert all(r.cos > 0.95 for r in out)


def test_kmeans_centroid_update_moves_assignment(spark):
    # off-axis members join cluster 1 and stay with its updated
    # (mean) centroid on the second assignment pass
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.6, 0.8]),
        (3, [0.5, 0.85]),
    ]
    one = {
        r.vec_id: r.cluster
        for r in kmeans_assign(_emb(spark, rows), k=2, iters=1).collect()
    }
    two = {
        r.vec_id: r.cluster
        for r in kmeans_assign(_emb(spark, rows), k=2, iters=2).collect()
    }
    # sanity: seeds stay with themselves; members follow centroids
    assert one[0] == 0 and one[1] == 1
    assert two[0] == 0 and two[1] == 1
    assert two[2] == 1 and two[3] == 1


def test_semantic_dedup_keep_lowest(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.001]),  # near-dup of 0
        (3, [1.0, 0.002]),  # near-dup of 0 and 2
        (4, [0.0, -1.0]),  # same cluster as nothing similar
    ]
    emb = _emb(spark, rows)
    assign = kmeans_assign(emb, k=2, iters=1)
    pairs = semantic_dedup_pairs(emb, assign, tau=0.999)
    drops = {
        r.drop_id: r.keep_id
        for r in semantic_dedup_drops(pairs).collect()
    }
    # 2 and 3 both drop, each keeping the LOWEST partner (0)
    assert drops == {2: 0, 3: 0}


def test_kmeans_twolevel_partitions_and_bounds(spark):
    # 40 vectors in two orthogonal bands; target=5 forces a real
    # two-level split: k1 = ceil(sqrt(40/5)) = 3 coarse cells, then
    # per-cell sub-clusters of ~5 members each.
    rows = []
    for i in range(20):
        rows.append((i * 2, [1.0, 0.001 * i]))
        rows.append((i * 2 + 1, [0.001 * i, 1.0]))
    out = kmeans_assign_twolevel(_emb(spark, rows), target=5).collect()
    # every vector assigned exactly once
    assert sorted(r.vec_id for r in out) == sorted(i for i, _ in rows)
    # composite id is consistent with (cell, sub)
    assert all(r.cluster == r.cell * 100000 + r.sub for r in out)
    # enough sub-centroids were created that the AVERAGE final
    # population stays ~target (Lloyd bounds the centroid count —
    # pop // target per cell — not each cluster's max population)
    pops = {}
    for r in out:
        pops[r.cluster] = pops.get(r.cluster, 0) + 1
    assert len(pops) >= len(rows) // (2 * 5)
    assert len(rows) / len(pops) <= 2 * 5
    # the two bands never share a final cluster (refine respects the
    # coarse semantic split)
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id % 2)
    assert all(len(bands) == 1 for bands in by_cluster.values())


def test_semantic_dedup_twolevel_finds_planted_dups(spark):
    # planted near-dup pairs land in the same (cell, sub) cluster
    # and the keep-lowest policy drops the higher id
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.001]),  # near-dup of 0
        (3, [0.0, 0.999]),  # near-dup of 1 (scaled)
    ]
    emb = _emb(spark, rows)
    assign = kmeans_assign_twolevel(emb, target=2).select(
        "vec_id", "cluster"
    )
    pairs = semantic_dedup_pairs(emb, assign, tau=0.999)
    drops = {
        r.drop_id: r.keep_id
        for r in semantic_dedup_drops(pairs).collect()
    }
    assert drops == {2: 0, 3: 1}


def test_blocked_fuzzy_join_blocks_and_verifies(spark):
    left = spark.createDataFrame(
        [Row(name_a=n) for n in ["red cap", "red cat", "blue cap"]]
    )
    right = spark.createDataFrame(
        [Row(name_b=n) for n in ["red cap", "red car", "blue gap"]]
    )
    out = blocked_fuzzy_join(
        left,
        right,
        "name_a",
        "name_b",
        F.split("name_a", " ").getItem(0),
        F.split("name_b", " ").getItem(0),
        max_dist=1,
    ).collect()
    got = {(r.name_a, r.name_b, r.dist) for r in out}
    # "blue cap"~"red cap" is dist 2 anyway, but blocking alone
    # already excludes cross-block candidates
    assert got == {
        ("red cap", "red cap", 0),
        ("red cap", "red car", 1),
        ("red cat", "red cap", 1),
        ("red cat", "red car", 1),
        ("blue cap", "blue gap", 1),
    }


def test_collapse_runs_islands(spark):
    rows = [
        Row(k="u", seq=1, st="a"),
        Row(k="u", seq=2, st="a"),
        Row(k="u", seq=3, st="b"),
        Row(k="u", seq=4, st="a"),
        Row(k="v", seq=1, st="b"),
    ]
    out = collapse_runs(
        spark.createDataFrame(rows),
        key_cols=["k"],
        order_cols=["seq"],
        status_col="st",
        ts_col="seq",
    ).collect()
    by_start = {(r.k, r.valid_from): r for r in out}
    assert len(out) == 4
    r1 = by_start[("u", 1)]
    assert (r1.status, r1.valid_to, r1.n_events, r1.is_current) == (
        "a", 3, 2, False,
    )
    r2 = by_start[("u", 3)]
    assert (r2.status, r2.valid_to, r2.n_events, r2.is_current) == (
        "b", 4, 1, False,
    )
    r3 = by_start[("u", 4)]
    assert (r3.status, r3.valid_to, r3.n_events, r3.is_current) == (
        "a", None, 1, True,
    )
    assert by_start[("v", 1)].is_current is True


def test_pagerank_star_graph(spark):
    # 1,2,3 all point at 0; 0 points at 1 — 0 accumulates rank
    edges = spark.createDataFrame(
        [
            Row(src=1, dst=0, w=1),
            Row(src=2, dst=0, w=1),
            Row(src=3, dst=0, w=1),
            Row(src=0, dst=1, w=1),
        ]
    )
    nodes = spark.createDataFrame([Row(node=i) for i in range(4)])
    pr = {r.node: r.pr for r in pagerank(edges, nodes, iters=3).collect()}
    assert math.isclose(sum(pr.values()), 1.0, abs_tol=1e-6)
    assert pr[0] > pr[1] > pr[2]
    assert math.isclose(pr[2], pr[3], abs_tol=1e-12)


def test_pagerank_uniform_on_cycle(spark):
    # symmetric cycle → uniform stationary distribution preserved
    edges = spark.createDataFrame(
        [Row(src=i, dst=(i + 1) % 3, w=1) for i in range(3)]
    )
    nodes = spark.createDataFrame([Row(node=i) for i in range(3)])
    pr = {r.node: r.pr for r in pagerank(edges, nodes, iters=4).collect()}
    for v in pr.values():
        assert math.isclose(v, 1.0 / 3, abs_tol=1e-9)


def test_ewma_per_key_recurrence(spark):
    from big_data_processing_spark.operators.windows import ewma_per_key

    rows = [
        Row(k=1, seq=1, v=10.0),
        Row(k=1, seq=2, v=20.0),
        Row(k=1, seq=3, v=30.0),
        Row(k=2, seq=1, v=5.0),
    ]
    out = ewma_per_key(
        spark.createDataFrame(rows), ["k"], ["seq"], "v", alpha=0.5
    ).collect()
    got = {(r.k, r.seq): r.ewma for r in out}
    assert got == {
        (1, 1): 10.0,
        (1, 2): 15.0,   # 0.5*20 + 0.5*10
        (1, 3): 22.5,   # 0.5*30 + 0.5*15
        (2, 1): 5.0,
    }


def test_cdc_latest_per_key(spark):
    from big_data_processing_spark.streaming.cdc import latest_per_key

    rows = [
        Row(k=1, t=1, x="a"),
        Row(k=1, t=3, x="c"),
        Row(k=1, t=2, x="b"),
        Row(k=2, t=1, x="z"),
    ]
    out = latest_per_key(
        spark.createDataFrame(rows), "k", "t", ["x"]
    ).collect()
    got = {(r.k): (r.t, r.x) for r in out}
    assert got == {1: (3, "c"), 2: (1, "z")}


def test_cdc_upsert_stream_end_to_end(spark, tmp_path):
    from big_data_processing_spark.streaming.cdc import (
        cdc_upsert_stream,
        read_state,
    )
    from big_data_processing_spark.streaming.windowed import (
        read_event_stream,
    )

    sf = "/root/testdata/sf0.001"
    stream = read_event_stream(spark, sf)
    cdc_upsert_stream(
        stream,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        key="user_id",
        ts_col="ts",
        payload_cols=["event_id", "event_type", "value"],
    )
    state = read_state(spark, str(tmp_path / "state"))
    # one row per user, and it is the max-ts event of that user
    events = spark.read.parquet(f"{sf}/events.parquet")
    n_users = events.select("user_id").distinct().count()
    assert state.count() == n_users
    from pyspark.sql import functions as SF

    expect = {
        r.user_id: r.m
        for r in events.groupBy("user_id")
        .agg(SF.max("ts").alias("m"))
        .collect()
    }
    got = {r.user_id: r.ts for r in state.collect()}
    # ns→µs: stream normalizes both sides through the same loader
    assert set(got) == set(expect)


def test_incremental_agg_stream_multi_batch(spark, tmp_path):
    from pyspark.sql import functions as SF

    from big_data_processing_spark.streaming.cdc import (
        incremental_agg_stream,
        read_state,
    )
    from big_data_processing_spark.streaming.windowed import (
        read_event_stream,
    )

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    chunks = str(tmp_path / "chunks")
    events.repartition(3).write.parquet(chunks)
    stream = read_event_stream(spark, chunks, glob="part-*.parquet")
    incremental_agg_stream(
        stream.select("event_type", "value"),
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        group_cols=["event_type"],
    )
    got = {
        r.event_type: (r.n_events, round(r.total_value, 6))
        for r in read_state(spark, str(tmp_path / "state")).collect()
    }
    # ns-long vs µs loader drift is irrelevant here: counts/sums only
    expect = {
        r.event_type: (r.n, round(r.s, 6))
        for r in events.groupBy("event_type")
        .agg(SF.count(SF.lit(1)).alias("n"), SF.sum("value").alias("s"))
        .collect()
    }
    assert got == expect
