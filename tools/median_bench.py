"""Merge N bench detail sidecars into one median-of-N snapshot.

Usage: python tools/median_bench.py OUT.json RUN1.json RUN2.json ...

Each input is a ``BENCH_DETAIL.json``-shaped artifact (``queries``
name → seconds). The output keeps the same shape, with every
query's value the MEDIAN across the runs it appears in, ``value``
the sum of medians, and a ``runs`` field recording the per-run
totals so the committed snapshot carries its own spread evidence
(the r10 verdict's bench-trust ask: medians, not single passes).
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    out_path, *run_paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in run_paths]
    names: list[str] = []
    for r in runs:
        for q in r["queries"]:
            if q not in names:
                names.append(q)
    med = {
        q: round(
            statistics.median(
                [r["queries"][q] for r in runs if q in r["queries"]]
            ),
            3,
        )
        for q in names
    }
    snap = {
        "metric": "total_query_wall_time",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "queries": med,
        "sf": runs[0].get("sf"),
        "warmup": runs[0].get("warmup"),
        "median_of": len(runs),
        "runs": [
            {"total": round(sum(r["queries"].values()), 3), "n": len(r["queries"])}
            for r in runs
        ],
    }
    with open(out_path, "w") as fh:
        json.dump(snap, fh, indent=1)
    print(out_path, "value:", snap["value"], "runs:", snap["runs"])


if __name__ == "__main__":
    main()
