"""Merge per-phase differential reports into one driver-shaped JSON.

The sf1 gate runs in phases (a full-order pass, a parallel pass over
the remaining queries, and individual passes for the heavy tail +
re-runs of queries fixed mid-round). Later reports OVERRIDE earlier
ones per query name, so a re-run of a fixed query replaces its stale
failure row.

Usage: python tools/merge_correctness.py OUT.json IN1.json IN2.json ...
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    out, ins = sys.argv[1], sys.argv[2:]
    merged: dict[str, dict] = {}
    sf_dir = None
    for path in ins:
        with open(path) as fh:
            rep = json.load(fh)
        sf_dir = rep.get("sf_dir", sf_dir)
        # r9 verdict #2: stamp every row with the report it came
        # from, so a carried/merged row is visible in the artifact
        # itself (not only in the commit message). A row's source is
        # the LAST report that contributed it.
        src = os.path.basename(path)
        for name, row in rep["queries"].items():
            row = dict(row)
            row.setdefault("source", rep.get("source", src))
            merged[name] = row
    failures = [
        name
        for name, row in merged.items()
        if row.get("err") not in (None, "no_oracle")
        or row.get("rows_match") is False
        or row.get("schema_match") is False
        or row.get("hash_match") is False
    ]
    with open(out, "w") as fh:
        json.dump(
            {
                "sf_dir": sf_dir,
                "n_queries": len(merged),
                "n_failures": len(failures),
                "failures": sorted(failures),
                "queries": merged,
            },
            fh,
            indent=1,
            default=str,
        )
    print(f"{out}: {len(merged)} queries, {len(failures)} failures"
          + (f": {sorted(failures)}" if failures else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
