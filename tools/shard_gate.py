"""Launch a differential gate as N parallel oracle-check shards.

The gate's wall-clock is dominated by the single-threaded repr-exact
value compare, not by Spark — so round-robin sharding the registry
across a few processes buys near-linear wall-clock (the r10 sf1 gate
procedure, now scripted instead of ad hoc). Each shard writes its own
driver-shaped JSON; merge with tools/merge_correctness.py (which
stamps per-row source provenance).

Usage:
  python tools/shard_gate.py SF_DIR OUT_PREFIX N_SHARDS \
      [--env K=V ...] [--exclude name ...] [--only name ...]

Launches N background processes writing OUT_PREFIX.shard{i}.json and
OUT_PREFIX.shard{i}.log; prints the PIDs and exits. Poll the logs /
JSON files, then:
  python tools/merge_correctness.py OUT.json OUT_PREFIX.shard*.json
"""

from __future__ import annotations

import os
import subprocess
import sys


def main() -> int:
    argv = list(sys.argv[1:])
    env = dict(os.environ)
    excl: set[str] = set()
    only: list[str] = []
    while "--env" in argv:
        i = argv.index("--env")
        k, _, v = argv[i + 1].partition("=")
        env[k] = v
        del argv[i : i + 2]
    if "--exclude" in argv:
        i = argv.index("--exclude")
        excl = set(argv[i + 1 :])
        argv = argv[:i]
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1 :]
        argv = argv[:i]
    sf_dir, prefix, n = argv[0], argv[1], int(argv[2])

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from big_data_processing_spark.plans.registry import SPECS, _load_all

    _load_all()
    names = [q for q in SPECS if q not in excl]
    if only:
        names = [q for q in names if q in set(only)]
    shards: list[list[str]] = [[] for _ in range(n)]
    for i, q in enumerate(names):
        shards[i % n].append(q)

    pids = []
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for i, qs in enumerate(shards):
        if not qs:
            continue
        log = open(f"{prefix}.shard{i}.log", "w")
        p = subprocess.Popen(
            [
                sys.executable,
                os.path.join(here, "tools", "oracle_check.py"),
                "--json",
                f"{prefix}.shard{i}.json",
                sf_dir,
                *qs,
            ],
            stdout=log,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=here,
        )
        pids.append(p.pid)
        print(f"shard{i}: pid {p.pid}, {len(qs)} queries")
    print("pids:", " ".join(map(str, pids)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
