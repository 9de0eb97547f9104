"""Stage-level profiler for registered queries (optimization-round
measurement harness, guide §1/§7.1).

Runs named queries with the noop sink in a UI-enabled session and
prints, per pass, the completed stages with executorRunTime vs
executorCpuTime, shuffle bytes, task counts — the attribution the
Spark UI would show, scraped from the REST API so it works headless.

Usage: python tools/profile_query.py q1 [q2 ...] [--passes N]
       [--explain] [--sf-dir DIR]
Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.

This is a measurement tool only — never on any query path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4057


def rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=14)
    args = ap.parse_args()

    from big_data_processing_spark import get_spark
    from big_data_processing_spark.plans.registry import SPECS
    from bench import force

    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    app_id = spark.sparkContext.applicationId
    sf_dir = args.sf_dir
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    import gc

    from big_data_processing_spark.operators.graph import (
        release_leaked_checkpoints,
    )
    from big_data_processing_spark.plans.doc_clusters import pinned_rdd_ids

    def hygiene() -> None:
        spark.catalog.clearCache()
        release_leaked_checkpoints(spark, pinned_rdd_ids())
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    for name in args.queries:
        spec = SPECS[name]
        if args.explain:
            df = spec.fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                with open(os.path.join(args.explain_dir,
                                       f"{name}.txt"), "w") as fh:
                    fh.write(txt)
                print(f"== {name}: plan written")
            else:
                print(txt)
            hygiene()
        for p in range(args.passes):
            before = {s["stageId"] for s in rest(
                f"applications/{app_id}/stages")}
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            t0 = time.perf_counter()
            force(spec.fn(spark, sf_dir))
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            stages = [
                s for s in rest(f"applications/{app_id}/stages")
                if s["stageId"] not in before
                and s["status"] in ("COMPLETE", "FAILED")
            ]
            stages.sort(key=lambda s: -s.get("executorRunTime", 0))
            tot_run = sum(s.get("executorRunTime", 0) for s in stages)
            tot_cpu = sum(s.get("executorCpuTime", 0) for s in stages)
            print(f"\n== {name} pass {p}: wall {wall:.2f}s, "
                  f"{len(stages)} stages, "
                  f"runMs {tot_run}, cpuMs {tot_cpu // 1000000}")
            for s in stages[: args.top]:
                nm = s.get("name", "")[:60]
                print(
                    f"  stage {s['stageId']:>4} tasks {s['numTasks']:>4} "
                    f"run {s.get('executorRunTime', 0):>7} "
                    f"cpu {s.get('executorCpuTime', 0) // 1000000:>7} "
                    f"in {s.get('inputBytes', 0) >> 20:>5}M "
                    f"sr {s.get('shuffleReadBytes', 0) >> 20:>4}M "
                    f"sw {s.get('shuffleWriteBytes', 0) >> 20:>4}M  {nm}"
                )
            hygiene()


if __name__ == "__main__":
    main()
