"""Classic warehouse join/agg shapes over the star schema (TPC-H-style).

The reference's join surface (SURVEY.md §2.3) is two-hop at most; a
100 TB analytics engine also needs the canonical 3-6 table star-join
shapes with selective per-table predicates, where the plan quality
question is join ORDER + which sides broadcast + whether predicates
reach the scans. These queries pin those shapes with full DuckDB
oracles:

- ``shipping_priority``  (Q3 shape): 3-way join, top-k by aggregate
- ``order_priority_checking`` (Q4 shape): correlated EXISTS with a
  non-equi residual -> one left-semi join
- ``local_supplier_volume`` (Q5 shape): 6-way star join with a
  cross-fact equality (customer and supplier in the same nation)
- ``volume_shipping``    (Q7 shape): same dimension joined twice under
  a disjunctive cross-nation pair predicate
- ``national_market_share`` (Q8 shape): fraction-of-total per year in
  one conditional-sum pass
- ``returned_items_report`` (Q10 shape): 4-way join, top-k customers
- ``promo_revenue``      (Q14 shape): conditional-fraction aggregate
- ``top_supplier``       (Q15 shape): aggregate -> global-max semi-join
- ``small_quantity_revenue`` (Q17 shape): correlated scalar AVG
  subquery, decorrelated to an aggregate + key join
- ``disjunctive_brand_revenue`` (Q19 shape): OR-of-AND predicate
  blocks; single-table implications pushed to both scans
- ``waiting_orders_suppliers`` (Q21 shape): EXISTS + NOT EXISTS over
  the same fact, decorrelated to one per-order aggregate
- ``customer_order_distribution`` (Q13), ``forecast_revenue`` (Q6),
  ``large_volume_customers`` (Q18), ``dormant_rich_customers`` (Q22)

All revenue terms are quantized to DECIMAL(18,6) BEFORE summation on
both sides: decimal addition is exact and order-independent, so the
partial-aggregation tree (Spark) and the sequential sum (DuckDB)
agree to the last cent, and the rounded value that drives every
ordering/limit decision is identical in both engines.

Plan notes (asserted in tests/test_plan_quality.py): fixed-size
dimensions (region, nation) are explicit broadcasts; data-scaled
tables (customer, orders, lineitem, part, supplier) are left to AQE,
which broadcasts them at test SF and shuffle-joins them at 100 TB —
a forced hint would OOM there (VERDICT r1/r2 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.quantize import quantized, quantized_sql
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _revenue():
    # DECIMAL(18,6) per-term quantization before summation: decimal
    # addition is exact and order-independent, so Spark's partial-agg
    # tree and DuckDB's sequential sum produce the SAME total — double
    # sums can differ in the last cent when a group lands on a .xx5
    # boundary (observed at sf0.001). The per-row double product is
    # deterministic in both engines; only the summation order differs.
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )


@register(
    "shipping_priority",
    """
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    headline=True,
    doc="TPC-H Q3 shape: customer segment x order date x ship date "
    "predicates each pushed below its own scan, 3-way join, top-10 "
    "orders by revenue with a deterministic (revenue_r, orderkey) "
    "tiebreak. Generalizes J10's two-hop follow with a top-k sink.",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "local_supplier_volume",
    """
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    ORDER BY n_name
    """,
    headline=True,
    doc="TPC-H Q5 shape: 6-table star join with the local-supplier "
    "cross-fact equality (supplier and customer share a nation). "
    "region/nation broadcast (fixed size at any SF); the fact joins "
    "stay AQE-sided. The region predicate prunes nations BEFORE any "
    "fact shuffles.",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    # nations of the chosen region: tiny at any scale -> broadcast; the
    # customer join then prunes most rows before the fact-fact hops
    local_nations = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    return (
        cust.join(local_nations, cust.c_nationkey == F.col("n_nationkey"))
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("n_name")
    )


@register(
    "promo_revenue",
    """
    SELECT CAST(ROUND(100 * SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                   ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS promo_revenue,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1998-07-01'
    """,
    doc="TPC-H Q14 shape: conditional-fraction aggregate over a "
    "fact x dimension join inside a date window. The promo/total "
    "split is one pass (two conditional sums), not two scans; the "
    "part join is AQE-sided (dimension scales with SF).",
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = _revenue()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(18,6)"))),
                2,
            ).cast("double").alias("promo_revenue"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate < TIMESTAMP '1998-07-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: per-supplier revenue aggregate, then a "
    "global-max semi-filter (scalar subquery, ties kept). Decimal "
    "summation makes the max identical in both engines, so they can "
    "never disagree about who is top. One shuffle for the agg; the "
    "max is a scalar broadcast, not a second scan of lineitem.",
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_revenue()), 2).cast("double").alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("m"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "returned_items_report",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate < TIMESTAMP '1998-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: who returned the most revenue last quarter — "
    "4-way join (nation broadcast, facts AQE-sided), grouped by "
    "customer, top-20 with deterministic (revenue_r, custkey) "
    "tiebreak. The returnflag predicate reaches the lineitem scan.",
)
def returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "forecast_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue_delta,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan + conjunctive predicates + "
    "ungrouped aggregate — the canonical predicate-pushdown probe. "
    "Every filter reaches the parquet scan (row-group min/max skipping "
    "at scale); no join, no shuffle beyond the scalar agg reduce; "
    "decimal-quantized sum as in the rest of the suite.",
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")),
            2,
        )
        .cast("double")
        .alias("revenue_delta"),
        F.count("*").alias("n_lines"),
    )


@register(
    "large_volume_customers",
    """
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 250
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: large-volume customers — a HAVING-filtered "
    "aggregate drives a semi-join back into the 3-way join. The 'big "
    "orders' set is the output of a full lineitem aggregate but "
    "SELECTIVE (quantity > threshold), so it semi-joins (left_semi; "
    "AQE broadcasts it when small) instead of re-aggregating inside "
    "the join; deterministic (qty, orderkey) top-20 tiebreak.",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "customer_order_distribution",
    """
    WITH per_cust AS (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        FROM customer LEFT JOIN orders
          ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
    doc="TPC-H Q13 shape: customer order-count distribution — a LEFT "
    "OUTER join (customers with zero matching orders survive with "
    "count 0; the join-level predicate filters orders WITHOUT turning "
    "the join inner, the classic outer-join-predicate trap) feeding a "
    "two-level aggregate: count per customer, then histogram of those "
    "counts. Two shuffles: custkey, then the ~dozens-of-groups "
    "n_orders rollup.",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@register(
    "dormant_rich_customers",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_balance
    FROM customer
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / COUNT(*)
        FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: customers with above-average balance and no "
    "URGENT orders — a scalar aggregate subquery (one number, broadcast as a "
    "literal-like filter) composed with a cross-table NOT EXISTS "
    "(left-anti join; the probe side never materializes matches). "
    "The threshold is engine-exact by construction: balances quantize "
    "to integer cents, the sum of cents is exact in any aggregation "
    "order, and both engines perform the identical single IEEE "
    "division double(sum)/count — so boundary membership can never "
    "flip with partial-aggregation order at any scale factor.",
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(cents).cast("double") / F.count("*")).alias("t")
    )
    rich = cust.join(F.broadcast(avg_bal), cents > F.col("t")).drop("t")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "order_priority_checking",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: per-priority count of orders with at least one "
    "line shipped after the order date — a correlated EXISTS with a "
    "NON-equi term (l_shipdate > o_orderdate) riding on the equi key. "
    "Spark plans it as ONE left-semi hash join on orderkey with the "
    "date comparison as a residual condition: no decorrelation rewrite "
    "needed, no second scan, and the semi-join stops probing an order "
    "at its first late line. Date window pruned at the orders scan.",
)
def order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS INT) AS l_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS rev
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
           OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume — 6-table star with the "
    "SAME dimension (nation) joined twice under a disjunctive cross-"
    "nation pair predicate. Both nation sides are explicit broadcasts "
    "(fixed-size at any SF); the pair filter collapses each broadcast "
    "to <=2 rows BEFORE the join, so the fact side streams once and "
    "the disjunction never becomes a join condition. Revenue "
    "decimal-quantized per term as suite convention.",
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    pair = ("NATION_18", "NATION_19")
    n1 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _revenue().alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "national_market_share",
    f"""
    SELECT o_year,
           {quantized_sql('CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE)', 6)}
               AS mkt_share_e6
    FROM (
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               SUM(CASE WHEN n_name = 'NATION_3'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS nation_rev,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                   AS total_rev
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type = 'ECONOMY'
        GROUP BY CAST(YEAR(o_orderdate) AS INT)
    )
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — fraction-of-total "
    "aggregate per order year over a 5-table star restricted to one "
    "part type. Both numerator and denominator are decimal-exact sums "
    "(order-independent), so the single double division and round are "
    "bit-identical across engines, and the share emits as a scaled "
    "BIGINT (e6, functions/quantize.py); it needs ONE pass (a "
    "conditional sum), not two queries. Nation broadcasts; part "
    "predicate pruned at its scan.",
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    zero = F.lit(0).cast("decimal(18,6)")
    agg = (
        joined.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _revenue().alias("rev"),
            F.when(F.col("n_name") == "NATION_3", _revenue())
            .otherwise(zero)
            .alias("nrev"),
        )
        .groupBy("o_year")
        .agg(F.sum("nrev").alias("nation_rev"), F.sum("rev").alias("total_rev"))
    )
    return agg.select(
        "o_year",
        quantized(
            F.col("nation_rev").cast("double") / F.col("total_rev").cast("double"),
            6,
        ).alias("mkt_share_e6"),
    ).orderBy("o_year")


@register(
    "small_quantity_revenue",
    """
    SELECT p_brand,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS small_lot_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="TPC-H Q17 shape: small-lot revenue — a correlated scalar AVG "
    "subquery per part. Spark decorrelates it into a per-partkey "
    "aggregate joined back on the key: one extra shuffle on l_partkey "
    "instead of a rescan per outer row. The threshold is engine-exact: "
    "quantities are integral, so the per-part sum is exact in double "
    "at any aggregation order, and 0.2*avg is one IEEE multiply of "
    "identical inputs — boundary rows cannot flip between engines.",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#13")
    )
    thresholds = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap"))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("small_lot_revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@register(
    "disjunctive_brand_revenue",
    """
    SELECT p_brand,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="TPC-H Q19 shape: disjunctive cross-table predicate blocks "
    "(brand x size x quantity brackets OR'd together). The plan "
    "question is whether the single-table implications of the "
    "disjunction are extracted and pushed: Catalyst derives "
    "p_brand IN (...) / p_size <= 35 for the part scan and "
    "l_quantity BETWEEN 1 AND 30 for the lineitem scan from the OR, "
    "so both scans prune before the join and only the residual "
    "disjunction runs on joined rows.",
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@register(
    "waiting_orders_suppliers",
    """
    WITH lo AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
        FROM lo GROUP BY l_orderkey
    ),
    eligible AS (
        SELECT l_orderkey FROM per_order WHERE n_supp >= 2 AND n_late_supp = 1
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lo
    JOIN eligible USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE late AND n_name = 'NATION_19'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape: suppliers who were the SOLE late shipper in a "
    "finished multi-supplier order. The textbook form is a correlated "
    "EXISTS plus NOT EXISTS over the same fact; both are decorrelated "
    "here into ONE per-order aggregate (distinct suppliers, distinct "
    "late suppliers) — one shuffle on orderkey replaces two correlated "
    "probes of a 100 TB lineitem, and the late flag is computed once "
    "in the shared subtree (oracle states the identical rewrite). "
    "'Late' = shipped >60 days after order date, on available columns.",
)
def waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    from ..operators.cache import bounded_persist

    lo = bounded_persist(lo)  # shared by the per-order aggregate and the probe
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    eligible = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select("l_orderkey")
    return (
        lo.filter(F.col("late"))
        .join(eligible, "l_orderkey")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
