"""Summarize the sf0.1 bench-trust campaign (r10 verdict #1).

Inputs: .bench_runs/{r11_run1,r11_run2,r11_run3}.detail.json,
.bench_runs/control_r10.detail.json (exact round-10 code from the
.control worktree, same session window), and the committed round-10
snapshot. Per-query MEDIAN over the three runs: run1 (and a slice of
run3's early alphabet) overlapped interactive Spark work, which is
precisely what a per-query median-of-3 rejects; run2 ran on a quiet
box end-to-end. Registry grew mid-campaign (179 -> 180), so the last
additions carry medians over the runs that include them.

Outputs:
- BENCH_SF01_r11_snapshot.json — per-query MEDIAN of the clean runs
  (median-of-3, the r8-established snapshot policy);
- stdout: control-run delta vs the committed r10 snapshot (measures
  session/harness drift with code held constant) and an attribution
  table of r11-vs-r10 movers with the control delta alongside, so
  code effects and session effects separate, flagging any >1.5x
  mover not explained by the control run.

Usage: python tools/campaign_report.py [--write-snapshot]
"""

from __future__ import annotations

import json
import statistics
import sys

RUNS = ["r11_run1", "r11_run2", "r11_run3"]
DIR = ".bench_runs"


def load(name):
    try:
        with open(f"{DIR}/{name}.detail.json") as fh:
            return json.load(fh)["queries"]
    except FileNotFoundError:
        return None


def main() -> None:
    runs = {n: load(n) for n in RUNS}
    runs = {n: q for n, q in runs.items() if q}
    control = load("control_r10")
    run1 = load("r11_run1")
    with open("BENCH_SF01_r10_snapshot.json") as fh:
        r10 = json.load(fh)["queries"]

    if not runs:
        print("\n(no clean r11 runs available yet)")
        return
    names = sorted(set().union(*[set(q) for q in runs.values()]))
    med = {}
    for n in names:
        vals = [q[n] for q in runs.values() if n in q]
        med[n] = round(statistics.median(vals), 3)

    if control:
        common = sorted(set(control) & set(r10))
        tc = sum(control[n] for n in common)
        t10 = sum(r10[n] for n in common)
        print(
            f"CONTROL (r10 code, this session): {len(common)} common "
            f"entries, total {tc:.1f}s vs committed r10 {t10:.1f}s "
            f"-> delta {100 * (tc - t10) / t10:+.1f}%"
        )
        movers = [
            (n, r10[n], control[n])
            for n in common
            if max(r10[n], control[n]) > 0.5
            and max(r10[n], control[n]) / max(1e-9, min(r10[n],
                                                       control[n])) > 1.5
        ]
        print(f"  control movers >1.5x: {len(movers)}")
        for n, a, b in sorted(movers, key=lambda t: -abs(t[2] - t[1]))[:15]:
            print(f"    {n}: r10 {a:.2f}s -> control {b:.2f}s")

    common = sorted(set(med) & set(r10))
    t11 = sum(med[n] for n in common)
    t10c = sum(r10[n] for n in common)
    print(
        f"\nR11 MEDIAN vs committed r10: {len(common)} common entries, "
        f"{t10c:.1f}s -> {t11:.1f}s ({100 * (t11 - t10c) / t10c:+.1f}%)"
    )
    print(f"R11 full-suite median total: {sum(med.values()):.1f}s over "
          f"{len(med)} entries")
    unexplained = []
    for n in common:
        a, b = r10[n], med[n]
        if max(a, b) < 0.5:
            continue
        ratio = max(a, b) / max(1e-9, min(a, b))
        if ratio <= 1.5:
            continue
        c = control.get(n) if control else None
        # explained if the control run moved the same direction by
        # at least half the log-distance (session drift, not code)
        explained = False
        if c is not None and min(a, c) > 0:
            import math

            if abs(math.log(c / a)) >= 0.5 * abs(math.log(b / a)) and (
                (c > a) == (b > a)
            ):
                explained = True
        status = "session" if explained else "UNEXPLAINED"
        if not explained:
            unexplained.append(n)
        print(
            f"  {n}: r10 {a:.2f}s -> r11 {b:.2f}s "
            f"(control {c if c is None else round(c, 2)}) [{status}]"
        )
    print(f"\nunexplained >1.5x movers: {len(unexplained)} {unexplained}")
    # per-run spread for the record
    for n_run, q in runs.items():
        print(f"{n_run}: total {sum(q.values()):.1f}s over {len(q)}")

    if "--write-snapshot" in sys.argv:
        out = {
            "metric": "total_query_wall_time",
            "value": round(sum(med.values()), 3),
            "unit": "sec",
            "queries": med,
            "sf": 0.1,
            "method": f"per-query median of {sorted(runs)} "
            "(adaptive min-of-passes each); run1 and run3's early "
            "alphabet overlapped interactive work — the median "
            "rejects the inflated run per query",
        }
        with open("BENCH_SF01_r11_snapshot.json", "w") as fh:
            json.dump(out, fh, indent=1)
        print("\nwrote BENCH_SF01_r11_snapshot.json")


if __name__ == "__main__":
    main()
