"""TPC-H plan-shape family (round-11 continuation): seven classic
decision-support shapes the registry did not yet exercise —
two-sided dimension self-joins (Q7), CASE-share over an 8-way join
(Q8), left-join zero-preserving histograms (Q13), scalar-max
subqueries over a derived revenue view (Q15), correlated per-group
average thresholds (Q17), HAVING on a fact rollup re-joined to its
dimensions (Q18), and scalar-threshold + anti-join customer
triage (Q22).

The reference's SQL surface is flat single-table group-bys
(SURVEY.md §2.9) — these are north-star analytic extensions, each
adapted to the driver corpus's columns (no partsupp / l_commitdate /
c_phone in the testdata schema, so parameters use the columns that
exist; the PLAN SHAPE is the point, and each docstring names it).

Float parity: revenue sums use the integer-space ``dsum_round``
recipe; scalar thresholds are compared in integer space
(cents × count > sum-of-cents) so no oracle comparison ever rides
on the last ulp of a parallel double sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_processing_spark.operators.aggregates import (
    dsum_round,
    dsum_round_sql,
)
from big_data_processing_spark.plans.registry import register
from big_data_processing_spark.sources.catalog import load_table

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations
# ---------------------------------------------------------------------------


@register(
    "volume_shipping_q7",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {dsum_round_sql(_REV, 2)} AS revenue,
           count(*) AS n_lines
    FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
        OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
      AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bilateral shipping volume between two "
    "nations by year. The nation dimension joins TWICE under "
    "different roles (supplier side via supplier, customer side via "
    "orders→customer) with a disjunctive cross-role predicate that "
    "can only be applied after both joins. All four dimensions "
    "broadcast (nation 25 rows, supplier/customer pruned to two "
    "columns), so the only exchange is the final 6-group agg; the "
    "shipdate range prunes the fact scan (PushedFilters)",
)
def q_volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("supp_nk"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cust_nk"),
        F.col("n_name").alias("cust_nation"),
    )
    joined = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_20")
                & (F.col("cust_nation") == "NATION_11")
            )
            | (
                (F.col("supp_nation") == "NATION_11")
                & (F.col("cust_nation") == "NATION_20")
            )
        )
    )
    return (
        joined.withColumn("rev", _rev_col())
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum_round("rev", 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8: national market share inside a region
# ---------------------------------------------------------------------------


@register(
    "market_share_q8",
    f"""
    WITH all_nations AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           {dsum_round_sql(
               "CASE WHEN nation = 'NATION_3' THEN volume "
               "ELSE 0.0 END", 2)} AS nation_volume,
           {dsum_round_sql("volume", 2)} AS total_volume,
           round(({dsum_round_sql(
               "CASE WHEN nation = 'NATION_3' THEN volume "
               "ELSE 0.0 END", 2)})
             / ({dsum_round_sql("volume", 2)}), 6) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: one supplier nation's yearly share of a "
    "part-type's order volume inside one customer region — an "
    "8-way join (fact + 7 dimension hops, nation joined twice in "
    "different roles) reduced by CASE-conditional aggregation. "
    "Every dimension broadcasts after pruning; region/part-type "
    "predicates cut the join fan-in before any shuffle; the share "
    "divides two integer-space-rounded sums (round-before-divide, "
    "the promo_revenue_share recipe)",
)
def q_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    n1 = (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cust_nk"))
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("supp_nk"),
        F.col("n_name").alias("nation"),
    )
    joined = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nk"))
    )
    agg = (
        joined.withColumn("volume", _rev_col())
        .withColumn(
            "nat_volume",
            F.when(
                F.col("nation") == "NATION_3", F.col("volume")
            ).otherwise(F.lit(0.0)),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum_round("nat_volume", 2).alias("nation_volume"),
            dsum_round("volume", 2).alias("total_volume"),
        )
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(
            F.col("nation_volume") / F.col("total_volume"), 6
        ).alias("mkt_share"),
    ).orderBy("o_year")


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (zero-preserving)
# ---------------------------------------------------------------------------


@register(
    "customer_distribution_q13",
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: the distribution of per-customer order "
    "counts INCLUDING zero-order customers — the left join with a "
    "join-side-only predicate (priority filter applied to orders "
    "before the join, never to customers) feeds a count(o_orderkey) "
    "that counts only matched rows, then a second histogram agg "
    "over the counts. Two shuffles by construction (custkey, then "
    "c_count); the driver corpus joins orders' FK to every "
    "customer, so the zero bucket exercises the null-preserving "
    "count path",
)
def q_customer_distribution_q13(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue
# ---------------------------------------------------------------------------


@register(
    "top_supplier_q15",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {dsum_round_sql(_REV, 2)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: supplier(s) achieving the maximum "
    "quarterly revenue — a derived revenue view consumed TWICE "
    "(once joined to the supplier dimension, once reduced to a "
    "scalar max subquery). The equality predicate rides on "
    "integer-space-rounded revenue (dsum_round), so the max "
    "comparison is exact on both engines; the quarter predicate "
    "reaches the fact scan as PushedFilters",
)
def q_top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = (
        li.withColumn("rev", _rev_col())
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum_round("rev", 2).alias("total_revenue"))
    )
    max_rev = revenue.agg(
        F.max("total_revenue").alias("m")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(
            F.broadcast(supp),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated per-part threshold)
# ---------------------------------------------------------------------------


@register(
    "small_quantity_revenue_q17",
    f"""
    SELECT round(({dsum_round_sql("l.l_extendedprice", 2)}) / 7.0, 2)
             AS avg_yearly,
           count(*) AS n_small_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
    doc="TPC-H Q17 shape: revenue lost to small-quantity orders of "
    "one brand — the correlated scalar subquery (per-part average "
    "quantity threshold) decorrelates into a per-partkey aggregate "
    "re-joined to the fact. Quantities are integral doubles, so the "
    "per-part avg (exact integer sum / count) and the 0.2× "
    "threshold are bit-identical on both engines; the single-row "
    "result rides on dsum_round. The brand filter broadcasts a "
    "pruned part side; the threshold agg groups only that brand's "
    "partkeys (semantically equal to the full-corpus correlation "
    "because the outer join restricts to those parts)",
)
def q_small_quantity_revenue_q17(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    brand_lines = li.join(
        F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")
    )
    thresholds = (
        brand_lines.groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    small = brand_lines.join(
        F.broadcast(thresholds),
        F.col("l_partkey") == F.col("t_partkey"),
    ).filter(F.col("l_quantity") < F.col("qty_cut"))
    return small.agg(
        F.round(
            dsum_round("l_extendedprice", 2) / F.lit(7.0), 2
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small_lines"),
    )


# ---------------------------------------------------------------------------
# Q18: large-volume customers
# ---------------------------------------------------------------------------


@register(
    "large_volume_customers_q18",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(big.sum_qty AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300
    ) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: customers whose single orders exceed a "
    "quantity threshold — a fact self-rollup with HAVING feeds a "
    "semi-join back to its own dimensions, then a deterministic "
    "top-100 (totalprice desc, orderkey tiebreak → "
    "TakeOrderedAndProject, no global sort). Quantities are "
    "integral doubles (exact sums); the HAVING prunes ~99.9% of "
    "orders before any dimension join touches them",
)
def q_large_volume_customers_q18(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22: wealthy-but-recently-inactive customers per nation
# ---------------------------------------------------------------------------


@register(
    "inactive_wealth_q22",
    """
    WITH bal AS (
      SELECT c_custkey, c_nationkey, c_acctbal,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ), pos AS (
      SELECT sum(cents) AS sum_cents, count(*) AS n_pos
      FROM bal WHERE cents > 0
    )
    SELECT n.n_name, count(*) AS numcust,
           CAST(sum(b.cents) AS DOUBLE) / 100 AS totacctbal
    FROM bal b
      JOIN nation n ON b.c_nationkey = n.n_nationkey
      CROSS JOIN pos
    WHERE b.cents * pos.n_pos > pos.sum_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = b.c_custkey
          AND o.o_orderdate >= DATE '2000-01-01'
      )
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="TPC-H Q22 shape: customers above the average "
    "positive balance with no recent orders, rolled up per nation "
    "— a scalar aggregate subquery (the global average) gating the "
    "scan, composed with a NOT EXISTS anti-join against a filtered "
    "fact. The average comparison runs in integer space "
    "(cents × count > sum-of-cents — all BIGINT), so no oracle "
    "boundary ever rides on a parallel double sum; the 1-row "
    "scalar attaches via broadcast cross join and the anti-join "
    "shuffles only custkeys of the filtered order slice",
)
def q_inactive_wealth_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    pos = cust.filter(F.col("cents") > 0).agg(
        F.sum("cents").alias("sum_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    wealthy = (
        cust.join(F.broadcast(pos))
        .filter(
            F.col("cents") * F.col("n_pos") > F.col("sum_cents")
        )
        .join(
            recent,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
    )
    return (
        wealthy.join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("cents").cast("double") / 100).alias("totacctbal"),
        )
        .orderBy("n_name")
    )
