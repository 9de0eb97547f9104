"""Print the query-registry coverage table: one line per registered
query — name, check strength (oracle = value-hash vs rows-only),
and the one-line doc. The single source of truth for what the
engine claims (README's narrative map is generated FROM this view).

Usage: python tools/coverage_report.py [--markdown]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from big_data_processing_spark.plans.registry import SPECS

    md = "--markdown" in sys.argv
    oracle_n = sum(1 for s in SPECS.values() if s.oracle is not None)
    if md:
        print("| # | query | check | doc |")
        print("|---|---|---|---|")
    for i, (name, spec) in enumerate(SPECS.items(), 1):
        check = "value-hash" if spec.oracle is not None else "rows-only"
        doc = " ".join(spec.doc.split())
        if md:
            print(f"| {i} | `{name}` | {check} | {doc} |")
        else:
            print(f"{i:3d}  {name:34s} {check:10s} {doc}")
    print(
        f"\n{len(SPECS)} queries — {oracle_n} value-checked, "
        f"{len(SPECS) - oracle_n} rows-only"
    )


if __name__ == "__main__":
    main()
