"""Plan-quality regression tests: the physical plans the engine is
DESIGNED to produce (pushdown, pruning, broadcast, true top-k,
partial aggregation, whole-stage codegen) — so a refactor that
silently loses one of them fails loudly."""

from __future__ import annotations

import re

from big_data_processing_spark.plans.registry import SPECS
from tests.conftest import SF0001


def _plan(df, execute: bool = False) -> str:
    if execute:  # resolve AQE's runtime re-plan before reading it
        df.collect()
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _scan_count(plan: str) -> int:
    """Distinct scan NODES (formatted explain repeats nodes across
    the adaptive-final and initial plan sections)."""
    return len(set(re.findall(r"\((\d+)\) Scan parquet", plan)))


def test_range_filter_pushes_down_to_scan(spark):
    plan = _plan(SPECS["clean_range_filter"].fn(spark, SF0001))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    line = pushed[0]
    # every F1 range predicate reaches the parquet reader
    for frag in (
        "GreaterThan(l_extendedprice,0.0)",
        "LessThan(l_quantity,50.0)",
        "LessThanOrEqual(l_discount,0.08)",
    ):
        assert frag in line, line


def test_sink_projection_prunes_scan_columns(spark):
    plan = _plan(SPECS["sink_projection"].fn(spark, SF0001))
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # 6 projected source columns, nothing else (11-column table)
    assert read.count(":") - 1 == 6 or read.count(",") == 5, read
    assert "l_shipdate" not in read
    assert "l_partkey" not in read


def test_topk_uses_take_ordered_not_full_sort(spark):
    plan = _plan(SPECS["topk_orders"].fn(spark, SF0001))
    assert "TakeOrderedAndProject" in plan


def test_dim_join_broadcasts(spark):
    plan = _plan(SPECS["join_mktsegment_revenue"].fn(spark, SF0001))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_grouped_agg_is_partial_plus_final_codegen(spark):
    plan = _plan(SPECS["vendor_stats"].fn(spark, SF0001), execute=True)
    # map-side partial + final aggregate, inside whole-stage codegen
    assert plan.count("HashAggregate") >= 2
    assert "codegen id" in plan


def test_quality_metrics_single_scan(spark):
    plan = _plan(SPECS["quality_metrics"].fn(spark, SF0001))
    # one scan for all null/violation counts + one for the exact
    # distinct (duplicate detection) — NOT one job per column
    assert _scan_count(plan) == 2, plan


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling — the mechanism SCALE.md leans on for
    hot keys — demonstrated with thresholds lowered to test scale:
    the executed plan must mark the sort-merge join skew-handled."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "256KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        # skew detection reads COMPRESSED map-output sizes — the
        # payload must be incompressible (md5) or a hot key's 90k
        # near-identical rows LZ4 down to nothing and no skew registers
        skewed = spark.range(120_000).select(
            F.when(F.col("id") % 4 != 0, 0)  # 75% on key 0
            .otherwise(F.col("id") % 40)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        uniform = spark.range(40).select(
            F.col("id").alias("k"), F.lit(1.0).alias("w")
        )
        joined = skewed.hint("merge").join(uniform.hint("merge"), on="k")
        # collect() (not count()) — the skew split must appear in THIS
        # DataFrame's executed plan; count() builds its own
        assert len(joined.collect()) == 120_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def _unpartitioned_windows(plan: str) -> list[str]:
    """windowspecdefinition(...) occurrences whose FIRST argument is
    already an ordering expression (…ASC/DESC NULLS…) — i.e. windows
    with no partition columns, which execute as a single task."""
    bad = []
    for spec in re.findall(r"windowspecdefinition\(([^)]*)", plan):
        first = spec.split(", ")[0]
        if " ASC NULLS" in first or " DESC NULLS" in first:
            bad.append(spec)
    return bad


def test_series_windows_are_partitioned(spark):
    """The partitioned-by-series gap-fill and anomaly variants must
    never fall into a single-partition global WindowExec."""
    # sanity: the detector does flag the documented-bounded global
    # window of the single-series variant
    assert _unpartitioned_windows(
        _plan(SPECS["hourly_gap_fill"].fn(spark, SF0001))
    )
    for q in ("series_gap_fill", "series_event_anomalies"):
        plan = _plan(SPECS[q].fn(spark, SF0001))
        assert not _unpartitioned_windows(plan), (q, plan)


def test_partitioned_layout_prunes_at_read(spark, tmp_path):
    """Hive-partitioned layout → a date predicate becomes a
    PartitionFilter (directory pruning at planning time: at 100 TB a
    day-filter touches one day's files, not the table)."""
    from pyspark.sql import functions as F

    from big_data_processing_spark.sources.catalog import load_table
    from big_data_processing_spark.sources.files import write_parquet

    events = load_table(spark, SF0001, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    dest = str(tmp_path / "events_by_date")
    write_parquet(events, dest, partition_by=["event_date"])

    df = spark.read.parquet(dest).filter(
        F.col("event_date") == "2024-01-03"
    )
    plan = _plan(df)
    assert "PartitionFilters" in plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1)
    # the date predicate must NOT appear as a post-scan data filter
    assert df.count() == events.filter(
        F.to_date("ts") == "2024-01-03"
    ).count()


def test_funnel_and_scd2_share_one_exchange(spark):
    """The staged funnel windows and the SCD2 island chain each
    partition once on user_id; every window/aggregate after that
    must reuse the exchange (at 100 TB the second shuffle would
    dominate the query)."""
    for name in ("funnel_user_paths", "scd2_user_status"):
        df = SPECS[name].fn(spark, SF0001)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, (name, plan)


def test_ewma_is_single_shuffle_partition_kernel(spark):
    """ewma_per_key: one exchange on the key feeding one
    partition-wide Arrow kernel (mapInPandas over key-sorted
    partitions — r11: the grouped form paid per-KEY Python kernel
    invocations) — no extra sort-shuffles, no row-at-a-time UDF."""
    df = SPECS["user_value_ewma"].fn(spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan  # no per-key kernel calls
    assert "BatchEvalPython" not in plan  # no row-at-a-time UDF


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime row-level filtering: a selective dim-side predicate
    injects a bloom_filter_agg on the creation side and a
    might_contain probe on the fact scan side, so the shuffle join
    never materializes fact rows that cannot match. Thresholds are
    lowered to exercise the rule at test SF — at 100 TB the defaults
    (10 GB application-side scan) trigger it for real."""
    from pyspark.sql import functions as F

    keys = [
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        spark.conf.set(keys[0], "true")
        spark.conf.set(keys[1], "0")
        spark.conf.set(keys[2], "-1")
        li = spark.read.parquet(SF0001 + "/lineitem.parquet")
        orders = spark.read.parquet(SF0001 + "/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j)
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan.lower()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_weighted_sample_is_take_ordered(spark):
    plan = _plan(SPECS["weighted_sample_orders"].fn(spark, SF0001))
    assert "TakeOrderedAndProject" in plan


def test_heavy_hitters_single_python_stage_and_broadcast_recount(spark):
    plan = _plan(SPECS["token_heavy_hitters"].fn(spark, SF0001))
    # one Arrow-batched python stage (the per-partition MG sketch);
    # formatted explain repeats nodes in the detail section, so count
    # tree-form "MapInPandas (<id>" occurrences only
    assert plan.count("MapInPandas (") == 1
    # ...and the recount joins the candidate set broadcast, never
    # shuffling the exploded token stream by join key
    assert "BroadcastHashJoin" in plan


def test_local_supplier_volume_single_fact_shuffle_join(spark):
    plan = _plan(SPECS["local_supplier_volume"].fn(spark, SF0001))
    # dims ride broadcast joins; only lineitem⋈orders (and at larger
    # SF customer) may shuffle — no cartesian anywhere
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A dim-side filter on the fact's PARTITION column injects a
    dynamicpruning expression into the fact scan's PartitionFilters:
    only matching partition directories are listed and read. The
    hive-layout analog of the bloom-filter row test above — at 100 TB
    this is the difference between scanning one priority partition
    and all of them."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(SF0001 + "/orders.parquet")
    fact_path = str(tmp_path / "orders_by_prio")
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(
        fact_path
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("3-MEDIUM", 3)], "prio string, rank int"
    ).filter(F.col("rank") == 1)
    j = (
        fact.join(dim, fact.o_orderpriority == dim.prio)
        .groupBy("prio")
        .count()
    )
    plan = _plan(j)
    assert "dynamicpruningexpression" in plan.lower()


def test_bucketed_join_segments_no_exchange(spark):
    plan = _plan(SPECS["bucketed_join_segments"].fn(spark, SF0001))
    # co-located buckets on both sides: the merge-hinted join runs
    # with NO shuffle exchange before it (the aggregate after the
    # join may still exchange on its own group key)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan


def test_novelty_dedup_anti_join_ships_fingerprints_not_text(spark):
    """The incremental dedup must anti-join on 16-byte fingerprints
    with the text column pruned before any exchange — at 100 TB the
    join moves ~48 bytes/doc, never document bodies."""
    plan = _plan(SPECS["incremental_novelty_dedup"].fn(spark, SF0001))
    assert "LeftAnti" in plan, plan
    # the baseline side is reduced to a distinct fingerprint set
    # (partial HashAggregate before its exchange)
    assert "HashAggregate" in plan, plan
    # no exchange carries the raw text column: every Exchange node's
    # Input list mentions fingerprint/doc_id only
    for m in re.finditer(r"\(\d+\) (?:Broadcast)?Exchange\n(Input.*)", plan):
        assert "text#" not in m.group(1), m.group(0)


def test_md5_minhash_signatures_zero_shuffle(spark):
    """The per-row md5 signature build must stay an embarrassingly
    parallel map: the plan from scan to signature columns contains
    NO Exchange at all (the old vocab formulation shuffled every
    gram instance three times — distinct, join, groupBy)."""
    from big_data_processing_spark.functions.dedup import (
        md5_gram_sets,
        md5_minhash_signatures,
    )
    from big_data_processing_spark.sources.catalog import load_table

    docs = load_table(spark, SF0001, "documents")
    sig = md5_minhash_signatures(
        md5_gram_sets(docs, "text", "doc_id", shingle_n=5),
        "doc_id",
        num_perm=8,
    )
    plan = _plan(sig)
    # _spread's round-robin repartition is the ONLY permitted
    # exchange (it exists to unfreeze AQE-coalesced layouts, carries
    # (id, text) once, and disappears on a well-partitioned source)
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e == "RoundRobinPartitioning" for e in exchanges), plan
    assert "HashAggregate" not in plan, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_bloom_prefilter_filters_fact_before_broadcast_join(spark):
    """bloom_semi_join_revenue: the explicit Bloom membership test
    (getbit over the literal bitmap) must sit ON THE FACT SCAN SIDE
    as a plain Filter — fact rows die before the join — and the
    residual exact join must be broadcast, not shuffled."""
    plan = _plan(SPECS["bloom_semi_join_revenue"].fn(spark, SF0001))
    assert "getbit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the membership filter references the fact key, i.e. it was not
    # hoisted above the join
    filt = [l for l in plan.splitlines() if "getbit" in l]
    assert any("o_custkey" in l for l in filt), filt


def test_bloom_gate_declines_on_unselective_dim(spark):
    """The cost gate must measure, not assume: the SAME helper that
    injects the getbit filter into bloom_semi_join_revenue (selective
    dim, test above) must DECLINE on local_supplier_volume, whose
    customer dim is the full key domain — a bitmap there filters
    nothing and only taxes the scan."""
    from pyspark.sql import functions as F

    from big_data_processing_spark.functions.sketches import (
        bloom_scan_filter,
    )
    from big_data_processing_spark.sources.catalog import load_table

    plan = _plan(SPECS["local_supplier_volume"].fn(spark, SF0001))
    assert "getbit" not in plan, plan

    # and directly: same query shape, selective predicate -> inject
    orders = load_table(spark, SF0001, "orders")
    customer = load_table(spark, SF0001, "customer")
    sel = customer.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    filtered, injected = bloom_scan_filter(
        orders, "o_custkey", sel, "c_custkey",
        domain_count=customer.count(),
    )
    assert injected
    assert "getbit" in _plan(filtered)
    # exactness: bloom-filtered fact joined to dim == plain join
    plain = orders.join(sel, orders.o_custkey == sel.c_custkey)
    blm = filtered.join(sel, filtered.o_custkey == sel.c_custkey)
    assert blm.count() == plain.count()
    # unselective dim (the full domain) -> declined, fact unchanged
    _, injected = bloom_scan_filter(
        orders, "o_custkey", customer.select("c_custkey"), "c_custkey",
        domain_count=customer.count(),
    )
    assert not injected


def test_bm25_prunes_postings_at_the_generator(spark):
    """The query-term IN filter must sit on the exploded token
    stream (above Generate, below any exchange) on BOTH the tf and
    df branches — at corpus scale only query-term postings may
    reach a shuffle."""
    import re

    from big_data_processing_spark.plans.registry import QUERIES
    from tests.conftest import SF0001

    df = QUERIES["bm25_retrieval_topk"](spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [
        m.start()
        for m in re.finditer(r"Filter token#\d+ IN \(", plan)
    ]
    assert len(hits) >= 2, plan[:2000]
    # the top-k must run as WindowGroupLimit (rank pushdown), not a
    # full per-partition sort + post-filter
    assert "WindowGroupLimit" in plan


def test_promo_share_broadcasts_part_and_prunes_lineitem(spark):
    """Q14 shape: part must broadcast (no fact shuffle for the join)
    and the lineitem scan must read only the four needed columns."""
    plan = _plan(SPECS["promo_revenue_share"].fn(spark, SF0001))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    li_schemas = [
        l for l in plan.splitlines()
        if "ReadSchema" in l and "l_partkey" in l
    ]
    assert li_schemas, "lineitem scan schema not found"
    for l in li_schemas:
        assert "l_extendedprice" in l and "l_shipdate" in l
        assert "l_quantity" not in l and "l_returnflag" not in l


def test_tpch_q7_broadcasts_all_dims_single_agg_exchange(spark):
    """Q7's four dimension joins must all broadcast (nation twice,
    supplier, customer); the orders join and the final 6-group agg
    are the only legitimate exchanges, and the shipdate range must
    reach the fact scan."""
    plan = _plan(SPECS["volume_shipping_q7"].fn(spark, SF0001))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_shipdate" in l for l in pushed), plan


def test_tpch_q18_having_uses_take_ordered(spark):
    """Q18: the top-100 must plan as TakeOrderedAndProject (no
    global sort), and the customer dimension must broadcast."""
    plan = _plan(SPECS["large_volume_customers_q18"].fn(spark, SF0001))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q22_anti_join_and_scalar_broadcast(spark):
    """Q22: the NOT EXISTS plans as a broadcast/shuffled anti join
    and the scalar threshold attaches without a sort."""
    plan = _plan(SPECS["inactive_wealth_q22"].fn(spark, SF0001))
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_gif_queries_keep_media_bytes_off_the_shuffle(spark):
    """The GIF rows synthesize + decode media inside one mapInPandas
    chain: no exchange may carry the binary content column."""
    for name in ("image_features_gif", "gif_frame_features"):
        plan = _plan(SPECS[name].fn(spark, SF0001))
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "content" not in line, (name, line)
