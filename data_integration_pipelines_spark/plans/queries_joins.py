"""Join-shape coverage for SURVEY.md §2.3: part-of expansion (J9),
two-hop follow joins (J10), relationship/hasPart assignment (J4), and
cross-table NOT EXISTS as a left-anti join (P3's cross-table form).

Each query re-expresses a reference join over the star schema:
orders play 'collections'/'containers', lineitems their parts, and
customer/part the dimension lookups. Dimension joins are explicitly
broadcast — the reference's LRU point-lookup caches (SURVEY §4)
become broadcast hash joins here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "part_of_expansion",
    """
    WITH coll AS (
        SELECT o_orderkey AS id, list(l_partkey) AS has_part
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderkey
    ),
    expanded AS (
        SELECT coll.id, part_id
        FROM coll, LATERAL (SELECT unnest(has_part) AS part_id)
    )
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(DISTINCT id) AS BIGINT) AS n_collections
    FROM expanded JOIN part ON p_partkey = part_id
    WHERE p_size < 25
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="J9 part-of expansion: collection.hasPart[*] explode -> join "
    "members to their resources -> filter by member attribute "
    "(ref src/e_model/querying.py:118-135). The member join broadcasts "
    "the dimension; the explode itself is narrow (no shuffle).",
)
def part_of_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bucketing import fact_pair

    # fact_pair: Exchange-free on the o_orderkey hop when the
    # co-bucketed layout exists (the default path, VERDICT r2 item 9)
    orders, li, _ = fact_pair(spark, sf_dir)
    orders = orders.filter(F.col("o_orderstatus") == "F")
    part = _t(spark, sf_dir, "part")
    coll = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.collect_list("l_partkey").alias("has_part"))
        .select(F.col("o_orderkey").alias("id"), "has_part")
    )
    expanded = coll.select("id", F.explode("has_part").alias("part_id"))
    return (
        expanded.join(
            F.broadcast(part.filter(F.col("p_size") < 25)),
            expanded.part_id == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("id").alias("n_collections"),
        )
        .orderBy("p_brand")
    )


@register(
    "two_hop_follow",
    """
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'O'
    JOIN lineitem ON l_orderkey = o_orderkey AND l_returnflag = 'N'
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    headline=True,
    doc="J10 two-hop follow join: resource -> workflow -> workflow parts "
    "(ref src/e_model/expected_fields.py:95-165) as customer -> orders -> "
    "lineitem with per-hop predicates pushed below each join.",
)
def two_hop_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "N")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            ).cast("double").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "two_hop_follow_bucketed",
    """
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'O'
    JOIN lineitem ON l_orderkey = o_orderkey AND l_returnflag = 'N'
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    headline=True,
    doc="J10 two-hop follow on the CO-BUCKETED fact layout "
    "(sources/bucketing.ensure_cobucketed_facts): the orders-lineitem "
    "hop joins bucket-to-bucket with no Exchange — the default "
    "fact-fact path at scale (2.1x on the probe) — then the customer "
    "dimension broadcasts. Same oracle as two_hop_follow: layout must "
    "never change answers.",
)
def two_hop_follow_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bucketing import ensure_cobucketed_facts, read_table

    orders_t, lineitem_t = ensure_cobucketed_facts(spark, sf_dir)
    orders = read_table(spark, orders_t).filter(F.col("o_orderstatus") == "O")
    li = read_table(spark, lineitem_t).filter(F.col("l_returnflag") == "N")
    cust = _t(spark, sf_dir, "customer")
    # fact-fact first (bucket-aligned, Exchange-free), then the
    # broadcast dimension hop; inner joins commute so results match
    # two_hop_follow exactly
    facts = orders.join(li, "o_orderkey")
    return (
        facts.join(F.broadcast(cust), facts.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            ).cast("double").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "relationship_assign",
    """
    SELECT o_orderkey,
           CAST(COUNT(*) FILTER (WHERE l_returnflag = 'N') AS BIGINT) AS n_assignable,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(CASE WHEN l_returnflag = 'N' THEN l_linenumber END) AS INT) AS first_assignable
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderkey
    HAVING COUNT(*) FILTER (WHERE l_returnflag = 'N') > 0
    ORDER BY o_orderkey
    """,
    doc="J4 relationship join + hasPart assignment: containers joined to "
    "members via isPartOf, intersected with the assignable member set, "
    "containers with no assignable member dropped (the semi-join) — "
    "ref src/trace/fix/trace_web_data_container.py "
    "assign_trace_has_part_field.",
)
def relationship_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bucketing import fact_pair

    orders, li, _ = fact_pair(spark, sf_dir)
    orders = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    assignable = F.col("l_returnflag") == "N"
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.when(assignable, 1)).alias("n_assignable"),
            F.count("*").alias("n_members"),
            F.min(F.when(assignable, F.col("l_linenumber")))
            .cast("int")
            .alias("first_assignable"),
        )
        .filter(F.col("n_assignable") > 0)
        .orderBy("o_orderkey")
    )


@register(
    "anti_join_orphans",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_without_urgent
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Cross-table NOT EXISTS as a left-anti join (P3's cross-table "
    "form; the reference's not-in-ontology / missing-link checks, e.g. "
    "ref src/trace/validation/validation.py:147-166). Anti joins never "
    "materialize the match — only the probe side flows.",
)
def anti_join_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without_urgent"))
        .orderBy("c_mktsegment")
    )
