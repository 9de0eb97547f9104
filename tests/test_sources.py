from __future__ import annotations

import os

from big_data_processing_spark.sources.catalog import (
    TABLES,
    load_table,
    register_views,
)
from big_data_processing_spark.sources.files import (
    read_csv,
    read_parquet,
    write_csv,
    write_parquet,
)
from big_data_processing_spark.sources.jdbc import jdbc_reader, write_jdbc
from tests.conftest import SF0001


def test_load_all_tables(spark):
    for name in TABLES:
        df = load_table(spark, SF0001, name)
        assert df.count() > 0, name


def test_events_ts_is_timestamp(spark):
    df = load_table(spark, SF0001, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_register_views_sql(spark):
    register_views(spark, SF0001, ("region", "nation"))
    out = spark.sql(
        "SELECT count(*) AS n FROM region JOIN nation "
        "ON r_regionkey = n_regionkey"
    ).collect()
    assert out[0].n > 0


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    path = os.path.join(str(tmp_path), "t.parquet")
    write_parquet(df, path, target_partitions=1)
    back = read_parquet(spark, path)
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]


def test_csv_roundtrip_with_schema(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5)], "id long, v double")
    path = os.path.join(str(tmp_path), "t.csv")
    write_csv(df, path, target_partitions=1)
    back = read_csv(spark, path, schema=df.schema)
    assert back.collect()[0].v == 2.5


def test_partitioned_parquet_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], "id long, part string"
    )
    path = os.path.join(str(tmp_path), "p.parquet")
    write_parquet(df, path, partition_by=["part"])
    back = read_parquet(spark, path).filter("part = 'x'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 2
    assert "PartitionFilters: [isnotnull(part" in plan  # pruning pushed down


def test_jdbc_wrappers_build_without_db(spark):
    df = spark.createDataFrame([(1,)], "id long")
    reader = jdbc_reader(
        spark, "jdbc:postgresql://localhost/db", "(SELECT 1) q",
        partition_options={"numPartitions": "4"},
    )
    writer = write_jdbc(df, "jdbc:postgresql://localhost/db", "t")
    assert reader is not None and writer is not None


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from pyspark.sql import functions as F

    from big_data_processing_spark.sources.files import write_bucketed

    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bkt_a", ["k"], 4, path=str(tmp_path / "a"))
    write_bucketed(b, "bkt_b", ["k"], 4, path=str(tmp_path / "b"))
    ta, tb = spark.table("bkt_a"), spark.table("bkt_b")
    # hint away the broadcast these tiny fixtures would get — the
    # bucketing claim under test is about the sort-merge path
    joined = ta.hint("merge").join(tb.hint("merge"), on="k")
    assert joined.count() == 500
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: sort-merge join with NO shuffle exchange
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_fetch_url_file_scheme_and_skip(tmp_path):
    from big_data_processing_spark.sources.http import fetch_url, fetch_urls

    src = tmp_path / "src.bin"
    src.write_bytes(b"x" * 200_000)  # > one chunk
    dest = tmp_path / "out" / "src.bin"
    got = fetch_url(src.as_uri(), str(dest))
    assert got == str(dest)
    assert dest.read_bytes() == src.read_bytes()

    # skip-if-exists: a changed source must NOT re-download
    src.write_bytes(b"y")
    fetch_url(src.as_uri(), str(dest))
    assert dest.read_bytes() == b"x" * 200_000

    multi = fetch_urls([src.as_uri()], str(tmp_path / "multi"))
    assert multi == [str(tmp_path / "multi" / "src.bin")]


def test_jdbc_round_trip_embedded_derby(spark, tmp_path):
    """Real executor-side JDBC write + read against the embedded
    Derby engine that ships in Spark's jars — exercises S5/S6
    end-to-end, not just option plumbing."""
    from pyspark.sql import functions as F

    from big_data_processing_spark.sources.jdbc import (
        jdbc_reader,
        write_jdbc,
    )

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("name"),
    )
    write_jdbc(df, url, "t1", mode="overwrite", batchsize=25).save()

    back = jdbc_reader(spark, url, "t1").load()
    assert back.count() == 100
    got = {(r.k, r.v, r.name) for r in back.collect()}
    want = {(r.k, r.v, r.name) for r in df.collect()}
    assert got == want

    # Spark writes case-preserved quoted identifiers; Derby demands
    # the same quoting back in pushed-down subqueries
    sub = jdbc_reader(
        spark, url, '(SELECT "k", "v" FROM t1 WHERE "k" < 10) q'
    ).load()
    assert sub.count() == 10 and set(sub.columns) == {"k", "v"}


def test_compact_parquet(spark, tmp_path):
    from big_data_processing_spark.sources.maintenance import (
        compact_parquet,
    )

    src = str(tmp_path / "sprawl")
    # 40 tiny files
    spark.range(40_000).repartition(40).write.parquet(src)
    import glob

    assert len(glob.glob(src + "/*.parquet")) == 40
    dest = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dest, target_file_mb=128)
    assert n == 1  # well under one target file of input
    assert len(glob.glob(dest + "/*.parquet")) == 1
    assert spark.read.parquet(dest).count() == 40_000


def test_append_new_by_key_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    from big_data_processing_spark.sources.maintenance import (
        append_new_by_key,
    )

    sink = str(tmp_path / "sink")
    batch1 = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    assert append_new_by_key(batch1, sink, "k") == 100
    # re-run of the same batch appends nothing (idempotent)
    assert append_new_by_key(batch1, sink, "k") == 0
    # overlapping batch appends only the new keys
    batch2 = spark.range(50, 150).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    assert append_new_by_key(batch2, sink, "k") == 50
    final = spark.read.parquet(sink)
    assert final.count() == 150
    assert final.select("k").distinct().count() == 150


def test_create_table_ddl_and_drop(spark, tmp_path):
    from pyspark.sql import functions as F

    from big_data_processing_spark.sources.files import (
        create_table,
        drop_table,
    )

    path = str(tmp_path / "ext_tbl")
    spark.range(10).select(
        F.col("id"), (F.col("id") * 1.5).alias("v")
    ).write.parquet(path)
    create_table(
        spark, "ext_tbl_t", "id BIGINT, v DOUBLE", path=path
    )
    try:
        assert spark.sql("SELECT count(*) AS n FROM ext_tbl_t").first()["n"] == 10
        # idempotent via IF NOT EXISTS
        create_table(spark, "ext_tbl_t", "id BIGINT, v DOUBLE", path=path)
        # StructType schema form
        from pyspark.sql import types as T

        create_table(
            spark,
            "ext_tbl_t2",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("v", T.DoubleType()),
                ]
            ),
            path=path,
        )
        assert "v" in spark.table("ext_tbl_t2").columns
    finally:
        drop_table(spark, "ext_tbl_t")
        drop_table(spark, "ext_tbl_t2")
    assert "ext_tbl_t" not in [t.name for t in spark.catalog.listTables()]


def test_copy_file(spark, tmp_path):
    from big_data_processing_spark.sources.files import copy_file

    src = tmp_path / "a.txt"
    src.write_text("manifest-content")
    dest = tmp_path / "sub" / "b.txt"
    assert copy_file(spark, str(src), str(dest))
    assert dest.read_text() == "manifest-content"


def test_append_new_by_key_propagates_read_errors(spark, tmp_path):
    """A corrupt sink must raise, NOT silently overwrite (data-loss
    hazard): only a truly absent sink takes the first-load path."""
    import pytest
    from pyspark.sql import functions as F

    from big_data_processing_spark.sources.maintenance import (
        append_new_by_key,
    )

    sink = tmp_path / "corrupt_sink"
    sink.mkdir()
    (sink / "part-00000.parquet").write_bytes(b"not a parquet file")
    batch = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(Exception):
        append_new_by_key(batch, str(sink), "k")
    # the corrupt file is untouched — nothing was overwritten
    assert (sink / "part-00000.parquet").read_bytes() == b"not a parquet file"


def test_compact_parquet_ceiling_formula():
    """ceil semantics: input exactly 2x target -> 2 files, not 1
    (the old three-term expression returned ceil-1 on exact
    multiples)."""
    from big_data_processing_spark.sources.maintenance import (
        _n_target_files,
    )

    mb = 1024 * 1024
    assert _n_target_files(1, 128) == 1
    assert _n_target_files(128 * mb, 128) == 1
    assert _n_target_files(128 * mb + 1, 128) == 2
    assert _n_target_files(256 * mb, 128) == 2
    assert _n_target_files(5 * 128 * mb + 7, 128) == 6
    assert _n_target_files(0, 128) == 1


def test_scratch_dir_deterministic_and_wiped():
    """scratch_dir contract (r6 ADVICE: mkdtemp accumulation; r7
    ADVICE: cross-process isolation): within one process the path is
    a pure function of (prefix, key) — re-invocation reuses the SAME
    path instead of growing /tmp — each call starts from an EMPTY
    dir, the path lives under a 0700 per-uid parent with a per-pid
    suffix (concurrent same-user sessions never share), and stale
    dirs left by dead processes are reaped."""
    import os

    from big_data_processing_spark.sources.maintenance import (
        scratch_dir,
    )

    a = scratch_dir("sgtest", "/some/sf_dir")
    with open(os.path.join(a, "stale_checkpoint"), "w") as fh:
        fh.write("x")
    b = scratch_dir("sgtest", "/some/sf_dir")
    assert b == a  # deterministic: overwrite in place, no growth
    assert os.listdir(b) == []  # wiped at start of every call
    # distinct keys (two sessions on different corpora) never share
    c = scratch_dir("sgtest", "/other/sf_dir")
    assert c != a
    # per-process isolation + 0700 per-uid parent (tmp squatting fix)
    assert a.endswith(f"_p{os.getpid()}")
    parent = os.path.dirname(a)
    assert os.path.basename(parent) == f"bdps_scratch_u{os.getuid()}"
    st = os.stat(parent)
    assert st.st_uid == os.getuid()
    # a dead process's dir for the same (prefix, key) is reaped; a
    # LIVE sibling's dir is left alone. Use a throwaway child we own
    # as the live pid — pid 1 only worked when the runner was root
    # (os.kill(1, 0) raises PermissionError for everyone else, which
    # the reaper treats as pid-recycled-stale) (r8 ADVICE).
    import shutil
    import subprocess
    import sys as _sys

    dead = a[: -len(str(os.getpid()))] + "4194000"  # > pid_max default
    os.makedirs(dead, exist_ok=True)
    child = subprocess.Popen(
        [_sys.executable, "-c", "import time; time.sleep(60)"]
    )
    alive_other = a[: -len(str(os.getpid()))] + str(child.pid)
    os.makedirs(alive_other, exist_ok=True)
    try:
        scratch_dir("sgtest", "/some/sf_dir")
        assert not os.path.exists(dead)
        assert os.path.exists(alive_other)  # live process's dir kept
    finally:
        child.kill()
        child.wait()
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(c, ignore_errors=True)
    shutil.rmtree(alive_other, ignore_errors=True)


def test_orc_roundtrip_with_partition_pruning(spark, tmp_path):
    from big_data_processing_spark.sources.files import (
        read_orc,
        write_orc,
    )

    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, "y", 3.5), (3, "x", 4.5)],
        "id long, k string, v double",
    )
    path = os.path.join(str(tmp_path), "t.orc")
    write_orc(df, path, partition_by=["k"], target_partitions=1)
    back = read_orc(spark, path)
    assert sorted((r.id, r.k, r.v) for r in back.collect()) == [
        (1, "x", 2.5), (2, "y", 3.5), (3, "x", 4.5),
    ]
    # hive-layout partition pruning applies to ORC exactly as to
    # parquet: the k='x' filter must land in the scan's
    # PartitionFilters, not a post-scan Filter
    pruned = back.filter(back.k == "x")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "(k" in plan, plan
    assert pruned.count() == 2


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    from big_data_processing_spark.sources.files import (
        read_jsonl,
        write_jsonl,
    )

    df = spark.createDataFrame(
        [(1, "hello", [1.0, 2.0]), (2, "world", [3.0])],
        "id long, text string, vec array<double>",
    )
    path = os.path.join(str(tmp_path), "t.jsonl")
    write_jsonl(df, path, target_partitions=1)
    back = read_jsonl(spark, path, schema=df.schema)
    rows = {r.id: r for r in back.collect()}
    assert rows[1].text == "hello" and rows[1].vec == [1.0, 2.0]
    assert rows[2].vec == [3.0]


def test_read_jsonl_quarantine_isolates_corrupt_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from big_data_processing_spark.sources.files import (
        read_jsonl_quarantine,
    )

    path = os.path.join(str(tmp_path), "q.jsonl")
    lines = [
        '{"id": 1, "s": "ok"}',
        '{"id": 2, "s": "also ok"}',
        '{"id": 3, "s": ',          # malformed: truncated
        'not json at all',          # malformed: not JSON
        '{"id": "five", "s": "x"}',  # type mismatch -> quarantined too
    ]
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    out = read_jsonl_quarantine(spark, path, schema).localCheckpoint(
        eager=True
    )
    good = out.filter(out._corrupt.isNull())
    bad = out.filter(out._corrupt.isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert bad.count() == 3
    # the raw line is preserved verbatim for a quarantine sink
    assert "not json at all" in {r._corrupt for r in bad.collect()}
    # the caller's schema object is not mutated
    assert len(schema.fields) == 2


def test_read_csv_quarantine_isolates_corrupt_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from big_data_processing_spark.sources.files import (
        read_csv_quarantine,
    )

    path = os.path.join(str(tmp_path), "q.csv")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.csv"), "w") as fh:
        fh.write("id,v\n1,2.5\nnot_a_number,oops\n3,4.5\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    out = read_csv_quarantine(spark, path, schema).localCheckpoint(
        eager=True
    )
    good = out.filter(out._corrupt.isNull())
    bad = out.filter(out._corrupt.isNotNull())
    assert sorted((r.id, r.v) for r in good.collect()) == [
        (1, 2.5), (3, 4.5),
    ]
    assert [r._corrupt for r in bad.collect()] == ["not_a_number,oops"]
