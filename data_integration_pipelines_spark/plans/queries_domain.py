"""Domain-operator coverage: filter-DSL over nested documents,
hierarchy closures, merge/upsert classification (SURVEY.md §2.1 S3/S17,
§2.2 P2/P3, §2.3 J6/J7/J8).

The nested-document queries first BUILD a resources-like nested table
from the flat star schema (struct + array-of-struct columns), then run
the operator under test on the nested shape — mirroring the
reference's JSON-LD documents while staying oracle-checkable (the
oracle expresses the same predicate relationally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.closure import (
    agreement_class,
    first_common_ancestor,
    siblings,
    transitive_closure,
)
from ..functions.quantize import quantized, quantized_sql
from ..operators.filter_dsl import Filter, search
from ..operators.merge import merge_classify
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _nested_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resources-like nested table: one row per order with a ``customer``
    struct and a ``lines`` array<struct> (JSON-LD document shape, §1.1)."""
    from ..sources.bucketing import fact_pair

    # bucketed layout (when present) kills BOTH exchanges here: the
    # lines groupBy and the orders-lines join share the key
    orders, li, _ = fact_pair(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer")
    lines = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("linenumber"),
                F.col("l_returnflag").alias("returnflag"),
                F.col("l_linestatus").alias("linestatus"),
                F.col("l_quantity").alias("quantity"),
            )
        ).alias("lines")
    )
    return (
        orders.join(
            F.broadcast(
                cust.select(
                    "c_custkey",
                    F.struct(
                        F.col("c_name").alias("name"),
                        F.col("c_mktsegment").alias("mktsegment"),
                        F.col("c_acctbal").alias("acctbal"),
                    ).alias("customer"),
                )
            ),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(lines, orders.o_orderkey == lines.l_orderkey, "left")
        .select("o_orderkey", "o_orderstatus", "customer", F.coalesce("lines", F.array()).alias("lines"))
    )


@register(
    "filter_dsl_search",
    """
    SELECT o.o_orderkey
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND c.c_acctbal >= 0
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
    ORDER BY o.o_orderkey
    """,
    doc="S3/P2/P3 filter-DSL scan compiled to nested-path exists()/not-exists() "
    "Columns; ref src/neuron_morphology/query_data.py:18-48 (Filter(EQUAL, "
    "path=[annotation,hasBody,label])), src/e_model/querying.py:102-110. "
    "Arrays quantify existentially; 'ne' = no element matches.",
)
def filter_dsl_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = _nested_orders(spark, sf_dir)
    out = search(
        nested,
        [
            Filter("eq", ["customer", "mktsegment"], "BUILDING"),
            Filter("ge", ["customer", "acctbal"], 0),
            Filter("eq", ["lines", "returnflag"], "R"),
            # negated quantifier: NO line with quantity > 49 ('ne'-family)
            Filter("ne", ["lines", "quantity"], 50),
        ],
    )
    out = out.filter(~F.exists(F.col("lines"), lambda x: x.getField("quantity") > 49))
    return out.select("o_orderkey").orderBy("o_orderkey")


@register(
    "hierarchy_closure",
    """
    WITH RECURSIVE edges AS (
        SELECT p_partkey AS child, CAST(FLOOR((p_partkey - 1) / 2) AS BIGINT) AS parent
        FROM part WHERE p_partkey > 0
    ),
    anc AS (
        SELECT child AS node, parent AS ancestor, 1 AS depth FROM edges
        UNION ALL
        SELECT a.node, e.parent, a.depth + 1
        FROM anc a JOIN edges e ON e.child = a.ancestor
    )
    SELECT node, ancestor, depth FROM anc
    WHERE node < 50
    ORDER BY node, depth
    """,
    doc="J7 transitive closure (rdfs:subClassOf+/hasPart*/RegionMap ascendants) "
    "via semi-naive iterative self-join to fixpoint; ref src/neuron_morphology/"
    "validation/region_comparison.py:108-131, src/trace/"
    "stimulus_type_ontology_querying.py:22-27. Tree derived from part keys "
    "(binary-heap parent pointers) so the oracle is WITH RECURSIVE.",
)
def hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    edges = part.filter(F.col("p_partkey") > 0).select(
        F.col("p_partkey").alias("child"),
        F.floor((F.col("p_partkey") - 1) / 2).alias("parent"),
    )
    closure = transitive_closure(edges)
    return (
        closure.filter(F.col("node") < 50)
        .select("node", "ancestor", "depth")
        .orderBy("node", "depth")
    )


@register(
    "closure_descendant_counts",
    """
    WITH RECURSIVE edges AS (
        SELECT p_partkey AS child, CAST(FLOOR((p_partkey - 1) / 2) AS BIGINT) AS parent
        FROM part WHERE p_partkey > 0
    ),
    anc AS (
        SELECT child AS node, parent AS ancestor, 1 AS depth FROM edges
        UNION ALL
        SELECT a.node, e.parent, a.depth + 1
        FROM anc a JOIN edges e ON e.child = a.ancestor
    )
    SELECT ancestor, CAST(COUNT(*) AS BIGINT) AS n_descendants,
           CAST(MAX(depth) AS INT) AS max_depth
    FROM anc
    WHERE ancestor < 10
    GROUP BY ancestor
    ORDER BY ancestor
    """,
    doc="J8 ontology-membership join over the closure (descendant counts per "
    "ancestor); ref src/trace/stimulus_type_ontology_querying.py:16-48",
)
def closure_descendant_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    edges = part.filter(F.col("p_partkey") > 0).select(
        F.col("p_partkey").alias("child"),
        F.floor((F.col("p_partkey") - 1) / 2).alias("parent"),
    )
    closure = transitive_closure(edges)
    return (
        closure.filter(F.col("ancestor") < 10)
        .groupBy("ancestor")
        .agg(
            F.count("*").alias("n_descendants"),
            F.max("depth").cast("int").alias("max_depth"),
        )
        .orderBy("ancestor")
    )


@register(
    "sibling_pairs",
    """
    SELECT r_name AS region_name, a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a
    JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
    JOIN region ON a.n_regionkey = r_regionkey
    ORDER BY region_name, nation_a, nation_b
    """,
    doc="J7 sibling rule (same isPartOf parent -> sibling pairs via self-join); "
    "ref src/neuron_morphology/validation/region_comparison.py:296-299",
)
def sibling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    edges = nation.select(F.col("n_name").alias("child"), F.col("n_regionkey").alias("parent"))
    pairs = siblings(edges)
    return (
        pairs.join(F.broadcast(region), pairs.parent == region.r_regionkey)
        .select(
            F.col("r_name").alias("region_name"),
            F.col("a").alias("nation_a"),
            F.col("b").alias("nation_b"),
        )
        .orderBy("region_name", "nation_a", "nation_b")
    )


@register(
    "region_agreement",
    """
    WITH RECURSIVE edges AS (
        SELECT p_partkey AS child, CAST(FLOOR((p_partkey - 1) / 2) AS BIGINT) AS parent
        FROM part WHERE p_partkey > 0
    ),
    anc AS (
        SELECT child AS node, parent AS ancestor, 1 AS depth FROM edges
        UNION ALL
        SELECT a.node, e.parent, a.depth + 1
        FROM anc a JOIN edges e ON e.child = a.ancestor
    ),
    nodes AS (
        SELECT child AS node FROM edges
        UNION
        SELECT parent FROM edges
    ),
    full_anc AS (
        SELECT node, ancestor, depth FROM anc
        UNION ALL
        SELECT node, node, 0 FROM nodes
    ),
    pairs AS (
        SELECT p_partkey AS observed,
               CASE p_partkey % 5
                   WHEN 0 THEN p_partkey
                   WHEN 1 THEN CAST(FLOOR((p_partkey - 1) / 2) AS BIGINT)
                   WHEN 2 THEN 2 * p_partkey + 1
                   WHEN 3 THEN CASE WHEN p_partkey % 2 = 1
                                    THEN p_partkey + 1 ELSE p_partkey - 1 END
                   ELSE (p_partkey * 13) % 200
               END AS declared
        FROM part WHERE p_partkey > 0 AND p_partkey < 100
    ),
    joined AS (
        SELECT p.observed, p.declared, la.ancestor AS fca,
               la.depth AS da, rb.depth AS db,
               ROW_NUMBER() OVER (PARTITION BY p.observed, p.declared
                                  ORDER BY la.depth, rb.depth, la.ancestor) AS rn
        FROM pairs p
        JOIN full_anc la ON la.node = p.observed
        JOIN full_anc rb ON rb.node = p.declared AND rb.ancestor = la.ancestor
    )
    SELECT observed, declared, fca,
           CAST(da AS INT) AS depth_obs, CAST(db AS INT) AS depth_decl,
           CASE WHEN da = 0 AND db = 0 THEN 'same'
                WHEN da = 0 THEN 'ancestor'
                WHEN db = 0 THEN 'descendant'
                WHEN da = 1 AND db = 1 THEN 'sibling'
                ELSE 'disjoint' END AS agreement
    FROM joined WHERE rn = 1
    ORDER BY observed, declared
    """,
    doc="J7 first-common-ancestor + region-agreement grading; ref src/"
    "neuron_morphology/validation/region_comparison.py:286-331 (check_"
    "agreement: same/ancestor/descendant/sibling, else FCA of the two "
    "ascendant lists) and :321-331 (common_ancestors[0] = lowest common "
    "ancestor since ascendant lists run self->root). Self counts as an "
    "ancestor at depth 0 (RegionMap with_ascendants=True includes the "
    "node), so the FCA depth pair encodes every agreement class. Tree = "
    "binary-heap parent pointers over part keys; observed-vs-declared "
    "pairs are a deterministic shuffle of the keys so all five classes "
    "occur. Scale: closure is ontology-sized and broadcast ONCE (one "
    "BroadcastExchange, reused by the second ancestor join — r12); the "
    "pair side streams with one hash aggregate on the pair key.",
)
def region_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    edges = part.filter(F.col("p_partkey") > 0).select(
        F.col("p_partkey").alias("child"),
        F.floor((F.col("p_partkey") - 1) / 2).alias("parent"),
    )
    closure = transitive_closure(edges)
    p = F.col("p_partkey")
    # deterministic declared-region mix so every agreement class occurs:
    # same / parent (-> descendant) / child (-> ancestor) / heap sibling /
    # scrambled (mostly disjoint, graded by the FCA)
    declared = (
        F.when(p % 5 == 0, p)
        .when(p % 5 == 1, F.floor((p - 1) / 2))
        .when(p % 5 == 2, 2 * p + 1)
        .when(p % 5 == 3, F.when(p % 2 == 1, p + 1).otherwise(p - 1))
        .otherwise((p * 13) % 200)
    )
    pairs = part.filter((p > 0) & (p < 100)).select(
        p.alias("observed"), declared.cast("long").alias("declared")
    )
    fca = first_common_ancestor(closure, pairs, "observed", "declared")
    return fca.select(
        "observed",
        "declared",
        "fca",
        F.col("depth_a").cast("int").alias("depth_obs"),
        F.col("depth_b").cast("int").alias("depth_decl"),
        agreement_class(F.col("depth_a"), F.col("depth_b")).alias("agreement"),
    ).orderBy("observed", "declared")


@register(
    "upsert_classify",
    f"""
    WITH existing AS (
        SELECT c_custkey AS key,
               {quantized_sql('c_acctbal', 2)} AS val
        FROM customer WHERE c_custkey < 1000
    ),
    computed AS (
        SELECT o_custkey AS key,
               {quantized_sql('CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)', 2)} AS val
        FROM orders WHERE o_custkey < 1200
        GROUP BY o_custkey
    )
    SELECT CASE WHEN e.key IS NULL THEN 'create'
                WHEN c.key IS NULL THEN 'deprecate'
                WHEN e.val IS DISTINCT FROM c.val THEN 'update'
                ELSE 'keep' END AS action,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM existing e FULL OUTER JOIN computed c ON e.key = c.key
    GROUP BY action
    ORDER BY action
    """,
    doc="S17/J6 upsert merge classification (register/update/deprecate split, "
    "full-outer merge on compartment); ref src/neuron_morphology/validation/"
    "quality_metric_resource.py:107-135, src/neuron_morphology/"
    "feature_annotations/create_update_annotations.py:110-142. "
    "Feeds Delta MERGE INTO on a lakehouse deployment. The compared value "
    "is cent-quantized to BIGINT on both sides (functions/quantize): the "
    "keep/update verdict is an EQUALITY on a computed aggregate, so it must "
    "never ride on a double whose summation order can differ per engine — "
    "the sum itself is exact DECIMAL(18,6) before the quantize.",
)
def upsert_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    existing = cust.filter(F.col("c_custkey") < 1000).select(
        F.col("c_custkey").alias("key"),
        quantized(F.col("c_acctbal"), 2).alias("val"),
    )
    computed = (
        orders.filter(F.col("o_custkey") < 1200)
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(
            quantized(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2
            ).alias("val")
        )
    )
    classified = merge_classify(existing, computed, key_cols=["key"], compare_cols=["val"])
    return classified.groupBy("action").agg(F.count("*").alias("n")).orderBy("action")


@register(
    "completeness_check",
    """
    WITH lines AS (
        SELECT l_orderkey, COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    ), checked AS (
        SELECT o.o_orderkey,
               (c.c_custkey IS NOT NULL) AS has_customer,
               (COALESCE(l.n_lines, 0) > 0) AS has_lines,
               (o.o_orderstatus IN ('O','F','P')) AS valid_status,
               (o.o_totalprice > 0) AS valid_price
        FROM orders o
        LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        LEFT JOIN lines l ON l.l_orderkey = o.o_orderkey
    )
    SELECT has_customer AND has_lines AND valid_status AND valid_price AS complete,
           CAST(COUNT(*) AS BIGINT) AS n_resources,
           CAST(COUNT(*) FILTER (WHERE NOT has_customer) AS BIGINT) AS missing_customer,
           CAST(COUNT(*) FILTER (WHERE NOT has_lines) AS BIGINT) AS missing_lines,
           CAST(COUNT(*) FILTER (WHERE NOT valid_status) AS BIGINT) AS bad_status,
           CAST(COUNT(*) FILTER (WHERE NOT valid_price) AS BIGINT) AS bad_price
    FROM checked
    GROUP BY 1 ORDER BY complete
    """,
    doc="Declarative per-type completeness rule set — the SHACL-observable "
    "subset (required links present, members non-empty, enum membership, "
    "value range) as Column predicates, rolled up into per-rule failure "
    "counts (ref MINDS completeness src/trace/validation/validation.py:90-91, "
    "create_update_curation_annotation.py:32-40; output shape of "
    "src/schemas/schema_validation.py:30-49).",
)
def completeness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bucketing import fact_pair

    orders, li, _ = fact_pair(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.lit(True).alias("_cust_ok")
    )
    lines = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    checked = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .join(lines, orders.o_orderkey == lines.l_orderkey, "left")
        .select(
            F.coalesce(F.col("_cust_ok"), F.lit(False)).alias("has_customer"),
            (F.coalesce(F.col("n_lines"), F.lit(0)) > 0).alias("has_lines"),
            F.col("o_orderstatus").isin("O", "F", "P").alias("valid_status"),
            (F.col("o_totalprice") > 0).alias("valid_price"),
        )
    )
    return (
        checked.groupBy(
            (
                F.col("has_customer")
                & F.col("has_lines")
                & F.col("valid_status")
                & F.col("valid_price")
            ).alias("complete")
        )
        .agg(
            F.count("*").alias("n_resources"),
            F.count(F.when(~F.col("has_customer"), 1)).alias("missing_customer"),
            F.count(F.when(~F.col("has_lines"), 1)).alias("missing_lines"),
            F.count(F.when(~F.col("valid_status"), 1)).alias("bad_status"),
            F.count(F.when(~F.col("valid_price"), 1)).alias("bad_price"),
        )
        .orderBy("complete")
    )


_TRADE_EDGES_SQL = """
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
"""


def _nation_pagerank_oracle() -> str:
    from ..operators.graph_rank import pagerank_oracle_sql

    inner = pagerank_oracle_sql(
        _TRADE_EDGES_SQL,
        iterations=5,
        nodes_sql="SELECT n_nationkey AS node FROM nation",
    )
    return f"""
    WITH ranked AS ({inner})
    SELECT n_name, rank_nano,
           CAST(ROW_NUMBER() OVER (ORDER BY rank_nano DESC, node) AS INT)
               AS position
    FROM ranked JOIN nation ON n_nationkey = node
    ORDER BY position
    """


@register(
    "nation_pagerank",
    _nation_pagerank_oracle(),
    doc="Link-importance ranking over the nation trade graph (customer "
    "nation -> supplier nation edges from the 4-table join): 5 "
    "integer-exact PageRank rounds (operators/graph_rank.py), ranks in "
    "bigint nano-units so Spark's partial-agg trees and the oracle's "
    "sequential sums are bit-identical — the iterative-algorithm "
    "pattern (join + agg per round, rank vector never driver-side) "
    "next to connected_components' converging variant.",
)
def nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph_rank import pagerank

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    edges = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
    )
    # node universe = the nation dimension: the pagerank seed count
    # scans 25 rows instead of executing the 4-table edge join, so
    # plan-only paths (explain, dump_plans) stay cheap; isolated
    # nations would surface with teleport-base rank (none exist here)
    ranked = pagerank(
        edges,
        iterations=5,
        checkpoint_every=1,
        node_universe=nation.select(F.col("n_nationkey").alias("node")),
    )
    from pyspark.sql.window import Window

    return (
        ranked.join(F.broadcast(nation), ranked.node == nation.n_nationkey)
        .select(
            "n_name",
            "rank_nano",
            F.row_number()
            .over(Window.orderBy(F.col("rank_nano").desc(), F.col("node").asc()))
            .cast("int")
            .alias("position"),
        )
        .orderBy("position")
    )


_TRADE_EDGES_W_SQL = """
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
    GROUP BY 1, 2
"""


def _nation_pagerank_weighted_oracle() -> str:
    from ..operators.graph_rank import pagerank_weighted_oracle_sql

    inner = pagerank_weighted_oracle_sql(
        _TRADE_EDGES_W_SQL,
        iterations=5,
        nodes_sql="SELECT n_nationkey AS node FROM nation",
    )
    return f"""
    WITH ranked AS ({inner})
    SELECT n_name, rank_nano,
           CAST(ROW_NUMBER() OVER (ORDER BY rank_nano DESC, node) AS INT)
               AS position
    FROM ranked JOIN nation ON n_nationkey = node
    ORDER BY position
    """


@register(
    "nation_pagerank_weighted",
    _nation_pagerank_weighted_oracle(),
    doc="Weighted PageRank over the nation trade graph: edge weight = "
    "lineitem count between the nation pair, so rank splits over "
    "out-edges in proportion to trade VOLUME, not just connectivity "
    "(operators/graph_rank.pagerank_weighted). Contribution = "
    "(rank * w) div total_out_w stays entirely in bigint — the same "
    "bit-identical-at-any-parallelism guarantee as the unweighted "
    "operator, proven by the same unrolled-SQL differential oracle.",
)
def nation_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph_rank import pagerank_weighted

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    edges = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    ranked = pagerank_weighted(
        edges,
        iterations=5,
        checkpoint_every=1,
        node_universe=nation.select(F.col("n_nationkey").alias("node")),
    )
    from pyspark.sql.window import Window

    return (
        ranked.join(F.broadcast(nation), ranked.node == nation.n_nationkey)
        .select(
            "n_name",
            "rank_nano",
            F.row_number()
            .over(Window.orderBy(F.col("rank_nano").desc(), F.col("node").asc()))
            .cast("int")
            .alias("position"),
        )
        .orderBy("position")
    )
