from __future__ import annotations

from pyspark.sql import functions as F

from big_data_processing_spark.plans.extension_queries import q_events_hourly
from big_data_processing_spark.streaming.windowed import (
    hourly_event_counts,
    read_event_stream,
    run_stream_to_memory,
)
from tests.conftest import SF0001


def test_streaming_matches_batch_twin(spark):
    """The watermarked streaming agg over the full file equals the
    oracle-checked batch query (same logical plan, incremental)."""
    stream = read_event_stream(spark, SF0001)
    agg = hourly_event_counts(stream)
    got = run_stream_to_memory(agg, "hourly_smoke", output_mode="append")

    expected = q_events_hourly(spark, SF0001).withColumnRenamed(
        "n_events", "n_events"
    )
    g = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in got.collect()
    }
    e = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in expected.collect()
    }
    # append mode emits only watermark-finalized windows — the last
    # window(s) may be withheld; everything emitted must match batch.
    assert len(g) > 0
    for key, val in g.items():
        assert e[key] == val
    missing = set(e) - set(g)
    max_emitted = max(k[0] for k in g) if g else None
    assert all(k[0] >= max_emitted for k in missing)


def test_streaming_is_incremental(spark):
    stream = read_event_stream(spark, SF0001, max_files_per_trigger=1)
    assert stream.isStreaming


def test_stateful_sessionize_stream_matches_batch(spark):
    """Closed sessions emitted by the applyInPandasWithState operator
    equal the batch sessionize twin's non-final sessions."""
    from big_data_processing_spark.operators.windows import sessionize
    from big_data_processing_spark.sources.catalog import load_table
    from big_data_processing_spark.streaming.stateful import (
        sessionize_stream,
    )

    stream = read_event_stream(spark, SF0001)
    sessions = sessionize_stream(stream, gap_minutes=30.0)
    got = run_stream_to_memory(sessions, "sessions_smoke")

    events = load_table(spark, SF0001, "events")
    batch = sessionize(events, "user_id", "ts", 30.0, tiebreak=["event_id"])
    agg = (
        batch.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    # the stream withholds each user's final (still-open) session
    last_per_user = {}
    for r in agg:
        cur = last_per_user.get(r.user_id)
        if cur is None or r.session_id > cur.session_id:
            last_per_user[r.user_id] = r
    expected_closed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in agg
        if last_per_user[r.user_id].session_id != r.session_id
    }
    emitted = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    }
    assert emitted == expected_closed
    assert len(emitted) > 0


def test_watermark_drops_late_events(spark, tmp_path):
    """Events arriving behind the watermark are dropped; their
    already-finalizable window never reflects them."""
    import os
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    def ns(h, m=0):
        return int(
            pd.Timestamp(2024, 1, 1, h, m).value
        )  # nanos since epoch, matches EVENTS_STREAM_SCHEMA

    def write(path, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, path)

    # batch 1: on-time events 10:00–12:59 → watermark → 10:59
    # batch 2: 13:30 → watermark → 11:30
    # batch 3: LATE event at 08:00, behind the committed watermark.
    # (Three batches because Spark filters late rows against the
    # PREVIOUS batch's watermark — a row arriving in the same batch
    # that first advances past it is still admitted.)
    write(tmp_path / "f1.parquet", [(1, ns(10, 5)), (2, ns(12, 59))])
    write(tmp_path / "f2.parquet", [(4, ns(13, 30))])
    write(tmp_path / "f3.parquet", [(3, ns(8, 0))])
    # file-source batches are ordered by modification time — pin the
    # order explicitly (sub-second writes can tie)
    now = _time.time()
    for i, name in enumerate(["f1", "f2", "f3"]):
        t = now - 180 + i * 60
        os.utime(tmp_path / f"{name}.parquet", times=(t, t))

    stream = read_event_stream(spark, str(tmp_path), glob="*.parquet")
    agg = hourly_event_counts(stream, watermark="2 hours")
    got = run_stream_to_memory(agg, "late_smoke", output_mode="append")
    rows = {r.hour.hour: r.n_events for r in got.collect()}

    # the 10:00 window finalized (end 11:00 ≤ final watermark 11:30)
    assert rows.get(10) == 1
    # the late 08:00 event was dropped — its window never appears
    assert 8 not in rows


def test_foreach_batch_parquet_sink(spark, tmp_path):
    """foreachBatch sink: the streaming agg lands in parquet with
    batch ids; final (update-mode) per-key values match batch."""
    from big_data_processing_spark.streaming.windowed import (
        run_stream_foreach_batch_parquet,
    )

    stream = read_event_stream(spark, SF0001)
    agg = hourly_event_counts(stream)
    dest = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    run_stream_foreach_batch_parquet(agg, dest, ckpt)

    sunk = spark.read.parquet(dest)
    assert "batch_id" in sunk.columns
    # update mode re-emits a window on change — keep the LAST emission
    latest = {}
    for r in sunk.collect():
        key = (r.hour, r.event_type)
        if key not in latest or r.batch_id > latest[key][0]:
            latest[key] = (r.batch_id, r.n_events, r.total_value)
    expected = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in q_events_hourly(spark, SF0001).collect()
    }
    assert set(latest) == set(expected)
    for key, (_, n, tv) in latest.items():
        assert expected[key] == (n, tv)


def test_stream_static_join_enrichment(spark):
    """Stream-static join: the events stream enriched against a
    static per-user profile (batch-derived) — stateless, no
    watermark needed; the static side is re-planned per micro-batch
    so slowly-changing dims pick up updates."""
    from big_data_processing_spark.sources.catalog import load_table

    events = load_table(spark, SF0001, "events")
    profile = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("lifetime_events")
    )

    stream = read_event_stream(spark, SF0001)
    enriched = stream.join(profile, on="user_id").select(
        "event_id", "user_id", "lifetime_events"
    )
    got = run_stream_to_memory(enriched, "enrich_smoke")

    assert got.count() == events.count()  # inner join, all users known
    # spot-check: every row's lifetime count matches the profile
    prof = {r.user_id: r.lifetime_events for r in profile.collect()}
    for r in got.limit(50).collect():
        assert prof[r.user_id] == r.lifetime_events


def test_streaming_dedup_drops_redelivery(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps each key's first arrival
    and suppresses re-deliveries, within and across batches."""
    import os
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_spark.streaming.dedup import dedup_stream

    def ns(h, m=0):
        return int(pd.Timestamp(2024, 1, 1, h, m).value)

    def write(path, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([float(r[2]) for r in rows]),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, path)

    # batch 1 contains an in-batch duplicate of id 2; batch 2
    # redelivers id 2 (different value — must NOT replace the
    # original) plus a fresh id 3.
    write(
        tmp_path / "f1.parquet",
        [(1, ns(10, 0), 1.0), (2, ns(10, 5), 2.0), (2, ns(10, 5), 99.0)],
    )
    write(tmp_path / "f2.parquet", [(2, ns(10, 6), 98.0), (3, ns(13, 0), 3.0)])
    now = _time.time()
    for i, name in enumerate(["f1", "f2"]):
        t = now - 120 + i * 60
        os.utime(tmp_path / f"{name}.parquet", times=(t, t))

    stream = read_event_stream(spark, str(tmp_path), glob="*.parquet")
    out = dedup_stream(stream, ["event_id"], watermark="2 hours")
    got = run_stream_to_memory(out, "dedup_smoke", output_mode="append")
    rows = sorted((r.event_id, r.value) for r in got.collect())
    assert rows == [(1, 1.0), (2, 2.0), (3, 3.0)]


def test_streaming_dedup_fingerprint_key(spark, tmp_path):
    """fingerprint=True dedups on md5 of the composite key with one
    fixed-width state row; the helper column does not leak out."""
    import os
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_spark.streaming.dedup import dedup_stream

    def ns(h, m=0):
        return int(pd.Timestamp(2024, 1, 1, h, m).value)

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([ns(10, 0), ns(10, 1), ns(10, 2)], pa.int64()),
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "event_type": pa.array(["view", "view", "view"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, tmp_path / "f1.parquet")

    stream = read_event_stream(spark, str(tmp_path), glob="*.parquet")
    out = dedup_stream(
        stream, ["user_id", "event_type"], watermark="1 hour", fingerprint=True
    )
    got = run_stream_to_memory(out, "dedup_fp_smoke", output_mode="append")
    rows = sorted((r.user_id, r.event_id) for r in got.collect())
    # user 7 deduped to first arrival; helper __fp column dropped
    assert rows == [(7, 1), (8, 3)]
    assert "__fp" not in got.columns


def test_stream_stream_interval_join_attribution(spark, tmp_path):
    """Watermarked stream-stream interval join: each purchase pairs
    with the same user's clicks within 1h before it, nothing else."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_spark.streaming.joins import (
        purchase_click_attribution_stream,
    )

    def ns(h, m=0):
        return int(pd.Timestamp(2024, 1, 1, h, m).value)

    rows = [
        # (event_id, ts, user_id, event_type)
        (1, ns(9, 0), 1, "click"),      # >1h before purchase: excluded
        (2, ns(10, 0), 1, "click"),     # within 1h: attributed
        (3, ns(10, 30), 1, "click"),    # within 1h: attributed
        (4, ns(10, 45), 1, "purchase"),
        (5, ns(11, 0), 1, "click"),     # after purchase: excluded
        (6, ns(10, 40), 2, "click"),    # other user
        (7, ns(10, 50), 2, "purchase"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "f1.parquet")

    stream = read_event_stream(spark, str(tmp_path), glob="*.parquet")
    out = purchase_click_attribution_stream(
        stream, max_gap="1 hour", watermark="2 hours"
    )
    got = run_stream_to_memory(out, "attr_smoke", output_mode="append")
    pairs = sorted((r.purchase_id, r.click_id) for r in got.collect())
    assert pairs == [(4, 2), (4, 3), (7, 6)]
    # key survives as one column
    assert got.columns.count("user_id") == 1


def test_enrich_stream_static_matches_batch(spark):
    from big_data_processing_spark.plans.registry import SPECS
    import duckdb

    got = SPECS["streaming_enrich_parity"].fn(spark, SF0001).collect()
    con = duckdb.connect()
    exp = con.execute(
        SPECS["streaming_enrich_parity"].oracle.replace(
            "FROM events e",
            f"FROM read_parquet('{SF0001}/events.parquet') e",
        ).replace(
            "JOIN customer c",
            f"JOIN read_parquet('{SF0001}/customer.parquet') c",
        )
    ).fetchall()
    assert [(r.mktsegment, r.n_events, r.total_value) for r in got] == [
        (a, b, c) for a, b, c in exp
    ]


def test_session_window_exact_gap_merges(spark):
    """Pin the measured engine rule the parity oracle encodes: an
    event at EXACTLY last+gap merges into the session (new session
    only strictly beyond the gap), and the emitted window end is
    last event + gap."""
    import datetime

    from big_data_processing_spark.streaming.windowed import (
        session_window_values,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def mk(uid, *offsets_min):
        return [
            (uid, base + datetime.timedelta(minutes=m), 1.0)
            for m in offsets_min
        ]

    rows = (
        mk(1, 0, 30)          # exactly gap apart -> ONE session
        + mk(2, 0, 30.02)     # just beyond gap -> TWO sessions
        + mk(3, 0, 29.98)     # within gap -> ONE session
        # a closer far apart so every session above is watermark-closed
        + mk(1, 60 * 24) + mk(2, 60 * 24) + mk(3, 60 * 24)
    )
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    # batch mode shares the session-merge algebra with streaming
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_window_values(df).collect()
    }
    g30 = datetime.timedelta(minutes=30)
    assert (1, base, base + g30 + g30, 2) in got          # merged
    assert (3, base, base + datetime.timedelta(minutes=29.98) + g30, 2) in got
    two_a = (2, base, base + g30, 1)
    two_b = (
        2,
        base + datetime.timedelta(minutes=30.02),
        base + datetime.timedelta(minutes=30.02) + g30,
        1,
    )
    assert two_a in got and two_b in got


def test_stream_state_partitions_scale_adaptive(spark, tmp_path, monkeypatch):
    """State-store count tracks input VOLUME (r11 optimization):
    ceil(bytes/target) clamped to [floor, 10x parallelism], env
    override wins, and run_stream_to_memory restores the session's
    batch shuffle-partition setting after the stream starts."""
    import os

    from big_data_processing_spark.streaming.windowed import (
        hourly_event_counts,
        read_event_stream,
        run_stream_to_memory,
        stream_state_partitions,
    )

    d = tmp_path / "chunks"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x" * 1000)
    (d / "b.parquet").write_bytes(b"x" * 1000)
    # 2000 bytes / 1000-byte target = 2 stores, below floor=4 -> 4
    assert stream_state_partitions(
        spark, str(d), glob="*.parquet", target_bytes=1000, floor=4
    ) == 4
    # above the floor: 2000/250 = 8
    assert stream_state_partitions(
        spark, str(d), glob="*.parquet", target_bytes=250, floor=4
    ) == 8
    # ceiling: clamped to 10x defaultParallelism
    par = spark.sparkContext.defaultParallelism
    assert stream_state_partitions(
        spark, str(d), glob="*.parquet", target_bytes=1, floor=4
    ) == 10 * par
    # env override pins the count
    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTITIONS", "7")
    assert stream_state_partitions(
        spark, str(d), glob="*.parquet", target_bytes=1, floor=4
    ) == 7
    monkeypatch.delenv("SPARK_GRAFT_STREAM_PARTITIONS")

    # identical results with a pinned state-partition count, and the
    # session's batch setting is untouched afterwards
    before = spark.conf.get("spark.sql.shuffle.partitions")
    stream = read_event_stream(spark, SF0001)
    agg = hourly_event_counts(stream)
    base = {
        (r.hour, r.event_type, r.n_events, r.total_value)
        for r in run_stream_to_memory(
            agg, "ssp_base", output_mode="append"
        ).collect()
    }
    stream2 = read_event_stream(spark, SF0001)
    agg2 = hourly_event_counts(stream2)
    sized = {
        (r.hour, r.event_type, r.n_events, r.total_value)
        for r in run_stream_to_memory(
            agg2, "ssp_sized", output_mode="append", state_partitions=5
        ).collect()
    }
    assert sized == base
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
