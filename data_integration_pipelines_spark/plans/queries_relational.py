"""Relational operator coverage (SURVEY.md §2.1-§2.7) over the
driver's TPC-H-ish tables.

Every query here maps one or more reference operators (cited per query)
onto idiomatic DataFrame plans:
- filters/projections stay declarative so Catalyst pushes them into the
  parquet scan;
- joins against small dimension tables are explicitly ``broadcast`` —
  at 100 TB the fact side never shuffles for those joins;
- aggregates are built-ins (JVM, whole-stage codegen, map-side partial
  aggregation) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.quantize import (
    e4,
    e4_sql,
    money_sum,
    money_sum_sql,
    quantized_sum,
    quantized_sum_sql,
)
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregations (§2.4)
# --------------------------------------------------------------------------


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {quantized_sum_sql('l_quantity', 2)}                                   AS sum_qty_e2,
           {quantized_sum_sql('l_extendedprice', 2)}                              AS sum_base_price_e2,
           {quantized_sum_sql('l_extendedprice * (1 - l_discount)', 4)}           AS sum_disc_price_e4,
           {quantized_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 4)} AS sum_charge_e4,
           {e4_sql(f"CAST({quantized_sum_sql('l_quantity', 2)} AS DOUBLE) / 100.0 / COUNT(*)")}      AS avg_qty_e4,
           {e4_sql(f"CAST({quantized_sum_sql('l_extendedprice', 2)} AS DOUBLE) / 100.0 / COUNT(*)")} AS avg_price_e4,
           CAST(COUNT(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="A5/A6 morphometric-stats battery shape (min/max/avg/sum per group); "
    "ref src/neuron_morphology/feature_annotations/morph_metrics_neurom.py:272-288. "
    "Money sums use the scaled-BIGINT convention (functions/quantize."
    "quantized_sum): each term quantized to 10^-d units by the identical "
    "IEEE expression on both engines, then summed in LONG arithmetic — "
    "order-independent (so Spark's partial-agg tree and DuckDB's "
    "sequential sum agree exactly) AND codegen-fast, where the "
    "DECIMAL(18,6) twin pays per-row BigDecimal conversion (measured "
    "4.6× wall on this scan-agg). Averages are one deterministic IEEE "
    "divide of the exact integer sum.",
    headline=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sum_qty = quantized_sum("l_quantity", 2)
    sum_price = quantized_sum("l_extendedprice", 2)
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.alias("sum_qty_e2"),
            sum_price.alias("sum_base_price_e2"),
            quantized_sum(disc_price, 4).alias("sum_disc_price_e4"),
            quantized_sum(disc_price * (1 + F.col("l_tax")), 4).alias("sum_charge_e4"),
            e4(sum_qty.cast("double") / F.lit(100.0) / n).alias("avg_qty_e4"),
            e4(sum_price.cast("double") / F.lit(100.0) / n).alias("avg_price_e4"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "type_census",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           STRING_AGG(DISTINCT source, ',' ORDER BY source) AS sources
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="A1 per-type count + GROUP_CONCAT(DISTINCT schema); "
    "ref src/schemas/getters.py:78-94",
)
def type_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        )
        .orderBy("lang")
    )


@register(
    "census_filtered",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="A2 filtered per-type census (unconstrained count); "
    "ref src/schemas/getters.py:96-112",
)
def census_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "cross_bucket_rollup",
    """
    WITH per_bucket AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS bal
        FROM customer GROUP BY c_mktsegment, c_nationkey
    )
    SELECT c_mktsegment,
           CAST(SUM(n) AS BIGINT) AS total_customers,
           CAST(ROUND(SUM(bal), 2) AS DOUBLE) AS total_balance,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM per_bucket
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="A3 two-level bucket->global rollup; ref src/schemas/getters.py:143-167. "
    "Both levels stay in exact DECIMAL until the final DOUBLE emission "
    "(the money_sum convention) so neither rollup depends on summation order.",
)
def cross_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    per_bucket = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2).alias("bal"),
    )
    return (
        per_bucket.groupBy("c_mktsegment")
        .agg(
            F.sum("n").alias("total_customers"),
            F.round(F.sum("bal"), 2).cast("double").alias("total_balance"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "bool_folds",
    """
    SELECT o_orderkey,
           BOOL_AND(l_discount < 0.08) AS all_low_discount,
           BOOL_OR(l_returnflag = 'R') AS any_returned,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey < 1000
    GROUP BY o_orderkey
    ORDER BY o_orderkey
    """,
    doc="A7 all/any boolean folds (curated = all(checks)); "
    "ref src/trace/validation/create_update_curation_annotation.py:47-60",
)
def bool_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.bool_and(F.col("l_discount") < 0.08).alias("all_low_discount"),
            F.bool_or(F.col("l_returnflag") == "R").alias("any_returned"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "error_grouping",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(event_id) AS BIGINT) AS first_event_id
    FROM events
    WHERE event_type IN ('error', 'purchase')
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="A8 error grouping per bucket; ref src/trace/validation/validation.py:424-441",
)
def error_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("error", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("first_event_id"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Joins (§2.3)
# --------------------------------------------------------------------------


@register(
    "join_enrich",
    """
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    doc="J1/J2 hash equi-join + broadcast lookup join; "
    "ref src/neuron_morphology/morphology_registration.py:51-76, "
    "src/neuron_morphology/validation/region_comparison.py:249-250. "
    "nation/region are broadcast: the customer side never shuffles for the join.",
    headline=True,
)
def join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            money_sum("c_acctbal").alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "exists_filter",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
    doc="P3 FILTER EXISTS / NOT EXISTS as left-semi + left-anti joins; "
    "ref src/trace/query/query_by_curation_and_e_type.py:24-39",
)
def exists_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    closed_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .join(closed_orders, cust.c_custkey == closed_orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "optional_bound",
    """
    SELECT n_name,
           COALESCE(r_name, 'UNKNOWN') AS region_name,
           CASE WHEN r_name IS NULL OR r_name = 'ASIA' THEN TRUE ELSE FALSE END AS exempt
    FROM nation LEFT JOIN region
      ON n_regionkey = r_regionkey AND r_name <> 'AFRICA'
    ORDER BY n_name
    """,
    doc="P10 OPTIONAL + bound filter -> left join + coalesce/when; "
    "ref src/search_index/the_issue.py:20-47",
)
def optional_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = nation.join(
        F.broadcast(region),
        (nation.n_regionkey == region.r_regionkey) & (region.r_name != "AFRICA"),
        "left",
    )
    return joined.select(
        "n_name",
        F.coalesce("r_name", F.lit("UNKNOWN")).alias("region_name"),
        (F.col("r_name").isNull() | (F.col("r_name") == "ASIA")).alias("exempt"),
    ).orderBy("n_name")


@register(
    "link_integrity",
    """
    WITH ids AS (
        SELECT 'l_partkey' AS col, l_partkey AS id FROM lineitem
        UNION ALL
        SELECT 'l_suppkey' AS col, l_suppkey AS id FROM lineitem
        UNION ALL
        SELECT 'l_orderkey' AS col, l_orderkey AS id FROM lineitem
    ),
    checked AS (
        SELECT i.col, i.id,
               CASE i.col
                    WHEN 'l_partkey' THEN EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = i.id)
                    WHEN 'l_suppkey' THEN EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = i.id)
                    ELSE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = i.id)
               END AS ok
        FROM ids i
    )
    SELECT col,
           CAST(COUNT(*) AS BIGINT) AS n_links,
           CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_broken
    FROM checked
    GROUP BY col
    ORDER BY col
    """,
    doc="J11 link-integrity melt + dereference join (every *.id column checked "
    "against its target table); ref src/neuron_morphology/validation/check_links.py:20-66. "
    "Implemented as unpivot -> per-target left-semi count; dimension sides broadcast.",
)
def link_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    targets = {
        "l_partkey": _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("tid")),
        "l_suppkey": _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("tid")),
        "l_orderkey": _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("tid")),
    }
    outs = []
    for colname, target in targets.items():
        ids = li.select(F.lit(colname).alias("col"), F.col(colname).alias("id"))
        joined = ids.join(F.broadcast(target), ids.id == target.tid, "left")
        outs.append(
            joined.groupBy("col").agg(
                F.count("*").alias("n_links"),
                F.sum(F.when(F.col("tid").isNull(), 1).otherwise(0)).alias("n_broken"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("col")


# --------------------------------------------------------------------------
# Windows / dedup / sorts (§2.5, §2.6)
# --------------------------------------------------------------------------


@register(
    "keep_latest",
    """
    SELECT user_id, event_id AS latest_event_id, event_type AS latest_event_type
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
    doc="W1/O4 keep-latest-per-key dedup (max _createdAt survivor); "
    "ref src/neuron_morphology/validation/quality_metric_resource.py:116-129",
    headline=True,
)
def keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_event_type"),
        )
        .orderBy("user_id")
    )


@register(
    "keep_latest_salted",
    """
    SELECT user_id, event_id AS latest_event_id, event_type AS latest_event_type
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
    doc="W1 keep-latest under key skew: the salted two-phase max-of-struct "
    "variant (operators/skew.keep_latest_salted) — per-(key, salt) partial "
    "max then per-key merge, so a Zipfian hot key (the reference's "
    "annotation targets) spreads over n_salts tasks instead of one window "
    "partition. Same oracle as keep_latest: salting must never change "
    "answers.",
)
def keep_latest_salted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import keep_latest_salted

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    latest = keep_latest_salted(ev, ["user_id"], "ts", ("event_id",))
    return latest.select(
        "user_id",
        F.col("event_id").alias("latest_event_id"),
        F.col("event_type").alias("latest_event_type"),
    ).orderBy("user_id")


@register(
    "top_k",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="O2/O3 report sort + limit; ref src/neuron_morphology/validation/"
    "region_comparison.py:485, src/arguments.py:38-40. Spark executes this as "
    "TakeOrderedAndProject (per-partition top-k, no full sort).",
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "paginated_scan",
    """
    SELECT rn AS row_id, event_id
    FROM (SELECT event_id, ROW_NUMBER() OVER (ORDER BY event_id) AS rn
          FROM events WHERE event_type = 'view')
    WHERE rn > 100 AND rn <= 200
    ORDER BY rn
    """,
    doc="BOUNDED-PAGE EMULATION — at scale use range partitioning + "
    "per-partition offsets (repartitionByRange(id) then a "
    "partition-local row_number plus cumulative per-partition counts; "
    "the zordered_df range-layout precedent): the global "
    "Window.orderBy(id) here funnels the whole filtered table through "
    "ONE partition — fine for a report page over a single pruned "
    "column, a straggler at 100 TB. W3/O1/S1 stable pagination "
    "ordering (ORDER BY id OFFSET/LIMIT loop collapsed into one "
    "ranked scan, which SURVEY itself calls usually unnecessary under "
    "Spark); ref src/trace/query/query.py:28-53",
)
def paginated_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    w = Window.orderBy("event_id")
    return (
        ev.select("event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 100) & (F.col("rn") <= 200))
        .select(F.col("rn").alias("row_id"), "event_id")
        .orderBy("row_id")
    )


# --------------------------------------------------------------------------
# Set operations (§2.7)
# --------------------------------------------------------------------------


@register(
    "set_discrepancy",
    """
    WITH with_orders AS (SELECT DISTINCT o_custkey AS id FROM orders),
         in_segment AS (SELECT c_custkey AS id FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT 'only_orders' AS side, id FROM (SELECT id FROM with_orders EXCEPT SELECT id FROM in_segment)
    UNION ALL
    SELECT 'only_segment' AS side, id FROM (SELECT id FROM in_segment EXCEPT SELECT id FROM with_orders)
    UNION ALL
    SELECT 'both' AS side, id FROM (SELECT id FROM with_orders INTERSECT SELECT id FROM in_segment)
    ORDER BY side, id
    """,
    doc="SO1/SO3 index-discrepancy compare (set difference both directions + "
    "intersection); ref src/search_index/search_index_discrepancy.py:161-239",
)
def set_discrepancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    with_orders = orders.select(F.col("o_custkey").alias("id")).distinct()
    in_segment = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("id")
    )
    only_orders = with_orders.exceptAll(in_segment).withColumn("side", F.lit("only_orders"))
    only_segment = in_segment.exceptAll(with_orders).withColumn("side", F.lit("only_segment"))
    both = with_orders.intersect(in_segment).withColumn("side", F.lit("both"))
    return (
        only_orders.unionByName(only_segment)
        .unionByName(both)
        .select("side", "id")
        .orderBy("side", "id")
    )


@register(
    "union_distinct",
    """
    SELECT id FROM (
        SELECT o_custkey AS id FROM orders WHERE o_orderstatus = 'P'
        UNION
        SELECT c_custkey AS id FROM customer WHERE c_acctbal < 0
    ) ORDER BY id
    """,
    doc="SO4/SO5 union of result lists + global distinct; "
    "ref src/e_model/querying.py:91, src/trace/fix/check_image_stimulus_match.py:165-167",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("id"))
    b = cust.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("id"))
    return a.union(b).distinct().orderBy("id")


@register(
    "census_rollup",
    """
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    doc="Native ROLLUP (region -> nation -> grand total) replacing the "
    "reference's hand-rolled two-level bucket->global census rollup "
    "(A3, ref src/schemas/getters.py:143-167). Subtotals come from ONE "
    "pass + partial aggregation instead of two client-side loops; both "
    "dimension joins broadcast.",
)
def census_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), nation.n_nationkey == cust.c_nationkey)
        .join(F.broadcast(region), region.r_regionkey == nation.n_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            money_sum("c_acctbal").alias("total_acctbal"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


@register(
    "approx_distinct_check",
    """
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           TRUE AS approx_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Scale-path sketch aggregate: approx_count_distinct (HLL++) next "
    "to the exact count, asserting <=5% relative error. At 100 TB the "
    "sketch replaces the exact distinct's full shuffle of the key "
    "column with fixed-size mergeable state (SURVEY §2.4 note).",
)
def approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact_custs"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        )
        .select(
            "o_orderpriority",
            "exact_custs",
            (
                F.abs(F.col("approx") - F.col("exact_custs"))
                <= 0.05 * F.col("exact_custs")
            ).alias("approx_within_5pct"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "salted_aggregation",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Two-phase salted aggregation for skewed/low-cardinality keys: "
    "aggregate (key, salt) to spread each hot key over n_salts tasks, "
    "then merge the partials per key (operators/skew.py). Algebraic "
    "re-association — results identical to the direct groupBy, which "
    "is what the oracle checks.",
)
def salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    # decimal per-term before the two-phase sum: partial-merge order is
    # then irrelevant (exact decimal addition), matching the oracle
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "l_quantity_dec", F.col("l_quantity").cast("decimal(18,6)")
    )
    return (
        salted_agg(
            li,
            ["l_returnflag"],
            {"n_rows": ("count", "*"), "total_qty_raw": ("sum", "l_quantity_dec")},
            n_salts=16,
        )
        .select(
            "l_returnflag",
            "n_rows",
            F.round("total_qty_raw", 2).cast("double").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )
