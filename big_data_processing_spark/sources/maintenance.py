"""Dataset maintenance utilities: small-file compaction and
incremental dedup-append — the operational half of running a
training-data lake at scale.

Streaming ingestion and fine-grained partitioning both produce
small-file sprawl; readers then pay per-file open/footer costs and
schedulers per-split overhead. Compaction rewrites a dataset into
size-targeted files. Incremental append keeps a sink exactly-once
per key without rewriting history: only rows whose key is absent
from the sink are appended (idempotent re-runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _n_target_files(total_bytes: int, target_file_mb: int) -> int:
    """ceil(total_bytes / target), minimum 1."""
    target = target_file_mb * 1024 * 1024
    return max(1, -(-total_bytes // target))


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``src_path`` into ``dest_path`` with files sized
    toward ``target_file_mb``. Returns the file count written.

    File count = ceil(input_bytes / target). The repartition is a
    round-robin exchange (even output sizes); for sort-clustered
    reads use ``write_bucketed`` instead — compaction is about file
    geometry, not layout."""
    # driver-side listing via Hadoop FS — works for any scheme
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(conf)
    total = fs.getContentSummary(path).getLength()
    n_files = _n_target_files(total, target_file_mb)
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dest_path)
    return n_files


def append_new_by_key(
    df: DataFrame,
    sink_path: str,
    key_col: str,
) -> int:
    """Append only rows whose ``key_col`` is not already in the
    parquet sink (exactly-once per key; idempotent re-runs).

    The anti-join reads ONLY the key column of the sink (column
    pruning) — at 100 TB the existing-keys scan is a single narrow
    column, and for repeated loads a bloom filter or bucketed sink
    on the key removes even that. Returns the number of appended
    rows (an action — the count drives the write decision)."""
    spark = df.sparkSession
    # Check sink existence explicitly: treating an arbitrary read
    # error (corrupt footer, transient FS fault) as "first load"
    # would overwrite — and destroy — existing data. Real read
    # errors must propagate.
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(sink_path)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):  # first load — sink truly absent
        df.write.mode("overwrite").parquet(sink_path)
        return df.count()
    existing = spark.read.parquet(sink_path).select(key_col)
    # strategy left to Catalyst+AQE: a small sink's keys broadcast,
    # a huge sink's keys sort-merge — forcing broadcast here would
    # OOM the driver once the sink outgrows memory
    fresh = df.join(existing.distinct(), on=key_col, how="left_anti")
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(sink_path)
    return n


def scratch_dir(prefix: str, key: str) -> str:
    """Deterministic per-(prefix, key, process) scratch path, WIPED
    on every call. The parity queries and bucketed-join write
    sizeable intermediate copies (re-chunked events, streaming
    state); a fresh ``mkdtemp`` per invocation accumulated them
    across bench / driver runs (r6 ADVICE), while a world-shared
    fixed /tmp name let two concurrent sessions destroy each other's
    live intermediates and was a tmp-squatting hazard (r7 ADVICE).

    Layout now: ``$TMPDIR/bdps_scratch_u{uid}/`` (0700, ownership
    verified, symlinks rejected) holding
    ``{prefix}_{md5(key)[:8]}_p{pid}``. The pid suffix isolates
    concurrent same-user sessions; stale sibling dirs for the same
    (prefix, key) whose owning process is dead are reaped on each
    call, so repeated bench/driver runs still overwrite-in-place
    rather than accumulate. Within ONE process the path is
    deterministic, so the wipe-at-start contract (clear stale
    streaming checkpoints, keep produced frames readable after
    return) is unchanged."""
    import hashlib
    import os
    import re
    import shutil
    import stat
    import tempfile

    uid = os.getuid() if hasattr(os, "getuid") else 0
    parent = os.path.join(tempfile.gettempdir(), f"bdps_scratch_u{uid}")
    os.makedirs(parent, mode=0o700, exist_ok=True)
    st = os.lstat(parent)
    if stat.S_ISLNK(st.st_mode) or not stat.S_ISDIR(st.st_mode) or (
        hasattr(os, "getuid") and st.st_uid != uid
    ):
        raise RuntimeError(
            f"scratch parent {parent!r} exists but is not a directory "
            "owned by this user — refusing to reuse (tmp squatting)"
        )
    # makedirs(mode=0o700) does NOT re-apply the mode to a directory
    # that already existed (possibly created world-readable by an
    # earlier run or another tool) — enforce the documented 0700
    # posture on every call (r8 ADVICE).
    if stat.S_IMODE(st.st_mode) & 0o077:
        os.chmod(parent, 0o700)
    token = hashlib.md5(key.encode()).hexdigest()[:8]
    # reap siblings for the same (prefix, key) left by DEAD processes
    # only — a live concurrent session's dir is never touched
    pat = re.compile(re.escape(f"{prefix}_{token}_p") + r"(\d+)$")
    for name in os.listdir(parent):
        m = pat.match(name)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)  # 0-signal: liveness probe
        except ProcessLookupError:
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
        except PermissionError:
            # pid exists but belongs to another user — our process
            # with that pid is dead (pid recycled), dir is stale
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
    path = os.path.join(parent, f"{prefix}_{token}_p{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path
