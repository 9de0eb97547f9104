"""Close the sf1 ``oracle_pending`` rows for the pair/cluster family
(r6 verdict Next #1): ngram_jaccard_pairs, ngram_jaccard_capped,
near_dup_clusters, cluster_representatives.

Why the normal gate stalled: each registered oracle re-derives the
positioned-gram / pair CTEs from scratch, and the uncapped pair oracle
as written is block-quadratic WITH a full ``list_intersect`` per
candidate pair — at sf1 that is 118M pairs x ~144-gram lists
(multi-hour). This runner materializes the SHARED intermediates once
as DuckDB temp tables and re-expresses the intersections as exploded
equi-joins (set-identical, just join-shaped):

- ``g``/``ex``/``card``: per-doc distinct 3-gram lists, their exploded
  instances, and per-doc gram counts;
- uncapped intersections: ``ex`` self-join within (lang, len_bucket)
  grouped per pair — sum(df^2) = 11.4B streamed rows instead of 118M
  list_intersect calls;
- capped intersections: rare-gram (df<=200) candidate pairs, then a
  cand->ex probe join (sum over candidates of |A| rows);
- connected components: union-find over the materialized capped pair
  set (semantically identical to the registered recursive-CTE closure:
  cluster_id = min reachable id, singletons excluded).

``--selftest SF_DIR`` first proves the materialized recompute equals
the four REGISTERED oracle SQLs row-for-row at a small sf, so the sf1
verdicts below inherit the registered semantics, not a parallel
definition.

Usage:
  python tools/sf1_pair_oracle.py --selftest /root/testdata/sf0.01
  python tools/sf1_pair_oracle.py [--json OUT.json] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import normalize, value_repr  # noqa: E402

NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
MAX_DF = 200
THRESHOLD = 0.3

FAMILY = (
    "ngram_jaccard_pairs",
    "ngram_jaccard_capped",
    "near_dup_clusters",
    "cluster_representatives",
    # prefix-filter join: registered oracle is the same blocked
    # all-pairs SQL at threshold 0.6 — a filter of pairs_all, since
    # the stored jaccard is already round(..., 6)
    "ngram_jaccard_prefix",
)
PREFIX_THRESHOLD = 0.6


def build_shared(con: duckdb.DuckDBPyConnection, sf_dir: str,
                 uncapped: bool = True) -> dict[str, float]:
    """Materialize the shared intermediates; returns build timings."""
    t: dict[str, float] = {}

    def step(name: str, sql: str) -> None:
        t0 = time.time()
        con.execute(sql)
        t[name] = round(time.time() - t0, 1)
        print(f"  built {name} in {t[name]}s", flush=True)

    con.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    step("g", f"""
        CREATE OR REPLACE TEMP TABLE g AS
        SELECT doc_id, lang, n_chars // 100 AS len_bucket,
               list_distinct([substr(s, i, 3)
                              FOR i IN range(1, greatest(len(s) - 1, 1))])
                 AS grams
        FROM (SELECT doc_id, lang, n_chars, {NORM_SQL} AS s
              FROM documents)""")
    step("ex", """
        CREATE OR REPLACE TEMP TABLE ex AS
        SELECT doc_id, lang, len_bucket, unnest(grams) AS gr FROM g""")
    step("card", """
        CREATE OR REPLACE TEMP TABLE card AS
        SELECT doc_id, len(grams) AS n FROM g""")

    # --- capped family (shared by capped pairs / clusters / reps) ---
    step("cand_capped", f"""
        CREATE OR REPLACE TEMP TABLE cand_capped AS
        WITH rare AS (
          SELECT lang, len_bucket, gr FROM ex
          GROUP BY 1, 2, 3 HAVING count(*) <= {MAX_DF}
        ), rx AS (
          SELECT ex.doc_id, ex.lang, ex.len_bucket, ex.gr
          FROM ex JOIN rare USING (lang, len_bucket, gr)
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM rx a JOIN rx b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket
             AND a.gr = b.gr AND a.doc_id < b.doc_id""")
    step("pairs_capped", f"""
        CREATE OR REPLACE TEMP TABLE pairs_capped AS
        WITH inter AS (
          SELECT c.id_a, c.id_b, count(*) AS ints
          FROM cand_capped c
          JOIN ex ea ON ea.doc_id = c.id_a
          JOIN ex eb ON eb.doc_id = c.id_b AND eb.gr = ea.gr
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(CAST(ints AS DOUBLE) / (ca.n + cb.n - ints), 6)
                 AS jaccard
        FROM inter
        JOIN card ca ON ca.doc_id = id_a
        JOIN card cb ON cb.doc_id = id_b
        WHERE round(CAST(ints AS DOUBLE) / (ca.n + cb.n - ints), 6)
              >= {THRESHOLD}""")

    if uncapped:
        # sum(df^2) streamed rows; at sf1 this is the one heavy build
        step("pairs_all", f"""
            CREATE OR REPLACE TEMP TABLE pairs_all AS
            WITH inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS ints
              FROM ex a JOIN ex b
                ON a.lang = b.lang AND a.len_bucket = b.len_bucket
                   AND a.gr = b.gr AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(CAST(ints AS DOUBLE) / (ca.n + cb.n - ints), 6)
                     AS jaccard
            FROM inter
            JOIN card ca ON ca.doc_id = id_a
            JOIN card cb ON cb.doc_id = id_b
            WHERE round(CAST(ints AS DOUBLE) / (ca.n + cb.n - ints), 6)
                  >= {THRESHOLD}""")
    return t


def clusters_from_pairs(pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find transitive closure over the capped pair set —
    cluster_id = min id in component, members = docs in >=1 pair
    (identical to the registered recursive-CTE reach closure)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        a, b = int(a), int(b)
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the root IS the cluster id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    ids = sorted(parent)
    cl = [find(i) for i in ids]
    return pd.DataFrame(
        {
            "id": pd.Series(ids, dtype="int64"),
            "cluster_id": pd.Series(cl, dtype="int64"),
            "is_representative": pd.Series(
                [i == c for i, c in zip(ids, cl)], dtype="bool"
            ),
        }
    )


def family_oracles(
    con: duckdb.DuckDBPyConnection, uncapped: bool = True
) -> dict[str, pd.DataFrame]:
    out: dict[str, pd.DataFrame] = {}
    out["ngram_jaccard_capped"] = con.execute(
        "SELECT id_a, id_b, jaccard FROM pairs_capped ORDER BY id_a, id_b"
    ).fetchdf()
    if uncapped:
        out["ngram_jaccard_pairs"] = con.execute(
            "SELECT id_a, id_b, jaccard FROM pairs_all"
        ).fetchdf()
        out["ngram_jaccard_prefix"] = con.execute(
            f"SELECT id_a, id_b, jaccard FROM pairs_all "
            f"WHERE jaccard >= {PREFIX_THRESHOLD} ORDER BY id_a, id_b"
        ).fetchdf()
    clusters = clusters_from_pairs(out["ngram_jaccard_capped"])
    out["near_dup_clusters"] = clusters.sort_values("id").reset_index(
        drop=True
    )
    n_chars = con.execute(
        "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM documents"
    ).fetchdf()
    reps = clusters.merge(n_chars, left_on="id", right_on="doc_id")
    reps = reps.sort_values(
        ["cluster_id", "n_chars", "id"],
        ascending=[True, False, True],
    ).groupby("cluster_id", as_index=False).first()
    out["cluster_representatives"] = (
        reps[["id", "cluster_id", "n_chars"]]
        .astype({"id": "int64", "cluster_id": "int64", "n_chars": "int64"})
        .sort_values("id")
        .reset_index(drop=True)
    )
    return out


def selftest(sf_dir: str) -> int:
    """Prove the materialized recompute == the registered oracle SQLs."""
    from big_data_processing_spark.plans.registry import SPECS
    from big_data_processing_spark.sources.catalog import TABLES

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for tbl in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    build_shared(con, sf_dir)
    mats = family_oracles(con)
    bad = 0
    for name in FAMILY:
        reg = con.execute(SPECS[name].oracle).fetchdf()
        a, b = normalize(mats[name]), normalize(reg)
        if len(a) != len(b) or list(a.columns) != list(b.columns) or \
                value_repr(a) != value_repr(b):
            print(f"SELFTEST FAIL {name}: materialized {len(a)} rows vs "
                  f"registered {len(b)}")
            bad += 1
        else:
            print(f"selftest ok {name}: {len(a)} rows")
    return bad


def main() -> int:
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--selftest":
        return selftest(argv[1] if len(argv) > 1 else "/root/testdata/sf0.01")
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/repo/.scale/sf1"

    from big_data_processing_spark import get_spark
    from big_data_processing_spark.plans.registry import SPECS

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_spill'")
    timings = build_shared(con, sf_dir)
    oracles = family_oracles(con)

    spark = get_spark(app_name="sf1-pair-oracle")
    report: dict[str, dict] = {}
    failures = []
    for name in FAMILY:
        t0 = time.time()
        sdf = SPECS[name].fn(spark, sf_dir).toPandas()
        spark_s = round(time.time() - t0, 1)
        s, o = normalize(sdf), normalize(oracles[name])
        rows = len(s) == len(o)
        schema = rows and list(s.columns) == list(o.columns)
        values = schema and value_repr(s) == value_repr(o)
        report[name] = {
            "rows_match": rows, "schema_match": schema,
            "hash_match": values, "spark_rows": len(s),
            "oracle_rows": len(o), "err": None,
            "spark_sec": spark_s,
        }
        status = "ok  " if values else "FAIL"
        if not values:
            failures.append(name)
        print(f"{status} {name}: spark {len(s)} vs oracle {len(o)} rows "
              f"(spark {spark_s}s)", flush=True)

    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "oracle_build_sec": timings,
                 "n_failures": len(failures), "queries": report},
                fh, indent=1, default=str)
    print(f"\n{len(failures)} failures"
          + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
