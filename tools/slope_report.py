"""Scaling-slope report: compare two bench.py JSON outputs taken at
different scale factors and print the per-query time ratio vs the
data ratio.

A query that does work linear in the input should scale at ratio ≤
data_ratio (often much less at small SFs, where fixed per-query
overhead — job scheduling, plan analysis, codegen — dominates).
Ratios well above data_ratio flag superlinear behavior worth a plan
audit (or a shuffle that crossed a spill threshold).

Usage: python tools/slope_report.py small.json big.json [--markdown]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    md = "--markdown" in sys.argv
    data_ratio = (big.get("sf") or 1) / (small.get("sf") or 1)
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in qb:
        if name not in qs or qs[name] <= 0:
            continue
        rows.append((qb[name] / qs[name], name, qs[name], qb[name]))
    rows.sort(reverse=True)
    hdr = (
        f"data ratio {data_ratio:g}x | total "
        f"{small['value']:.1f}s -> {big['value']:.1f}s "
        f"({big['value'] / small['value']:.2f}x)"
    )
    if md:
        print(f"<!-- {hdr} -->")
        print("| query | small s | big s | ratio |")
        print("|---|---|---|---|")
        for r, name, a, b in rows:
            print(f"| `{name}` | {a:.2f} | {b:.2f} | {r:.1f}x |")
    else:
        print(hdr)
        for r, name, a, b in rows:
            flag = "  <-- superlinear" if r > data_ratio * 1.15 else ""
            print(f"{r:6.1f}x  {name:34s} {a:7.2f}s -> {b:7.2f}s{flag}")


if __name__ == "__main__":
    main()
