"""Generate a scaled-up copy of a testdata dir for scaling-slope
experiments (VERDICT r1 item 3): replicate the sf0.1 corpus N× with
disjoint key ranges so every FK stays valid and every entity stays
unique.

This data is for PERFORMANCE slope measurement only — correctness
runs stay on the driver-provided /root/testdata dirs. Key domains
get per-copy offsets (orderkey+10M·i, custkey+1M·i, ...); dimension
tables region/nation are kept fixed (as TPC-H does — scaling facts,
stable dims). Document text gets a per-copy suffix so the near-dup
operators see 10 distinct-but-similar variants (pair growth stays
linear: each doc gains ≤N-1 sibling partners) instead of exact
clones. Embedding vectors are replicated unchanged (linear growth
under label blocking).

Usage: python tools/make_scale.py [copies] [src_dir] [dest_dir]
Defaults: 10 /root/testdata/sf0.1 /root/repo/.scale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSETS = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

# table -> list of (column, key domain); columns not listed copy as-is
SHIFTS = {
    "lineitem": [
        ("l_orderkey", "orderkey"),
        ("l_partkey", "partkey"),
        ("l_suppkey", "suppkey"),
    ],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "customer": [("c_custkey", "custkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "part": [("p_partkey", "partkey")],
    "events": [("event_id", "event_id"), ("user_id", "user_id")],
    "documents": [("doc_id", "doc_id")],
    "embeddings": [("vec_id", "vec_id")],
}
FIXED_DIMS = ["region", "nation"]


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dest = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scale/sf1"
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    con.execute(
        f"CREATE TABLE copies AS SELECT unnest(range({copies})) AS i"
    )

    for t in FIXED_DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dest}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied (fixed dim)")

    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        shifted = dict(shifts)
        exprs = []
        for c in cols:
            if c in shifted:
                exprs.append(f"(t.{c} + copies.i * {OFFSETS[shifted[c]]}) AS {c}")
            elif t == "documents" and c == "text":
                # distinct-but-similar per copy (see module docstring)
                exprs.append(
                    "CASE WHEN copies.i = 0 THEN t.text "
                    "ELSE t.text || ' c' || copies.i END AS text"
                )
            elif t == "documents" and c == "n_chars":
                exprs.append(
                    "CASE WHEN copies.i = 0 THEN t.n_chars "
                    "ELSE t.n_chars + 2 + len(CAST(copies.i AS VARCHAR)) "
                    "END AS n_chars"
                )
            else:
                exprs.append(f"t.{c}")
        sql = (
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM read_parquet('{src}/{t}.parquet') t CROSS JOIN copies "
            f"ORDER BY copies.i) "
            f"TO '{dest}/{t}.parquet' (FORMAT parquet)"
        )
        con.execute(sql)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
