"""Scalar-function coverage (SURVEY.md §2.8 F1-F13, §2.2 P4/P5/P9).

All expressions are built-in Column functions — JVM-side, inside
whole-stage codegen; no Python UDFs. Each oracle reproduces the exact
same scalar semantics in DuckDB SQL (functions chosen to exist with
identical behavior in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.quantize import e4, e4_sql, quantized, quantized_sql
from .base import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "string_predicates",
    """
    SELECT p_partkey,
           p_name,
           SPLIT_PART(p_name, ' ', -1)       AS last_word,
           CONTAINS(p_name, 'red')           AS has_red,
           STARTS_WITH(p_type, 'ECON')       AS is_econ,
           SPLIT_PART(p_brand, '#', -1)      AS brand_num
    FROM part
    WHERE CONTAINS(p_name, 'red') OR ENDS_WITH(p_name, 'bolt')
    ORDER BY p_partkey
    """,
    doc="P4 string predicates (contains/strStarts/suffix) + F1 split-last-segment; "
    "ref src/trace/thumbnail.py:69-74, src/helpers.py:297, "
    "src/trace/validation/validation.py:104-109",
)
def string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").contains("red") | F.col("p_name").endswith("bolt"))
        .select(
            "p_partkey",
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("last_word"),
            F.col("p_name").contains("red").alias("has_red"),
            F.col("p_type").startswith("ECON").alias("is_econ"),
            F.element_at(F.split("p_brand", "#"), -1).alias("brand_num"),
        )
        .orderBy("p_partkey")
    )


@register(
    "in_list_filter",
    """
    SELECT n_nationkey, n_name
    FROM nation
    WHERE n_name IN ('FRANCE', 'GERMANY', 'JAPAN', 'KENYA')
       OR n_regionkey IN (3)
    ORDER BY n_nationkey
    """,
    doc="P5 VALUES/IN-list predicate (ES terms); "
    "ref src/search_index/search_index_discrepancy.py:67-70",
)
def in_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    return (
        nation.filter(
            F.col("n_name").isin("FRANCE", "GERMANY", "JAPAN", "KENYA")
            | F.col("n_regionkey").isin(3)
        )
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


@register(
    "regex_extract",
    """
    SELECT c_custkey,
           CAST(REGEXP_EXTRACT(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS name_num,
           REGEXP_REPLACE(c_name, '^Customer#0*', '')                   AS short_name
    FROM customer
    WHERE c_custkey < 100
    ORDER BY c_custkey
    """,
    doc="F2 regex extract/replace (month-year extraction, ANSI-escape strip); "
    "ref src/neuron_morphology/morphology_registration.py:149, "
    "src/neuron_morphology/feature_annotations/create_update_annotations.py:34-50",
)
def regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint").alias("name_num"),
        F.regexp_replace("c_name", r"^Customer#0*", "").alias("short_name"),
    ).orderBy("c_custkey")


@register(
    "case_convert",
    """
    SELECT DISTINCT p_type,
           UPPER(SUBSTR(LOWER(p_type), 1, 1)) || SUBSTR(LOWER(p_type), 2) AS title_type,
           LOWER(p_type)  AS lower_type,
           UPPER(p_type)  AS upper_type
    FROM part
    ORDER BY p_type
    """,
    doc="F3 case conversion (snake->camel/title u2c/u2l); "
    "ref src/neuron_morphology/feature_annotations/morph_metrics_neurom.py:131-137",
)
def case_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    low = F.lower(F.col("p_type"))
    return (
        part.select(
            "p_type",
            F.concat(F.upper(F.substring(low, 1, 1)), F.expr("substr(lower(p_type), 2)")).alias(
                "title_type"
            ),
            low.alias("lower_type"),
            F.upper("p_type").alias("upper_type"),
        )
        .distinct()
        .orderBy("p_type")
    )


@register(
    "date_functions",
    """
    SELECT STRFTIME(o_orderdate, '%Y-%m')                    AS order_month,
           CAST(QUARTER(o_orderdate) AS INT)                 AS order_quarter,
           CAST(COUNT(*) AS BIGINT)                          AS n_orders,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S')   AS first_order,
           STRFTIME(MAX(o_orderdate + INTERVAL 30 DAY), '%Y-%m-%d') AS max_due_date
    FROM orders
    GROUP BY order_month, order_quarter
    ORDER BY order_month
    """,
    doc="F5 date parse/format/arithmetic; ref src/common_metadata.py:73-81, "
    "src/neuron_morphology/morphology_registration.py:149-153",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("first_order"),
            F.date_format(F.max(F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")), "yyyy-MM-dd").alias(
                "max_due_date"
            ),
        )
        .orderBy("order_month")
    )


@register(
    "json_extract",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                            AS n_events,
           {e4_sql("AVG(CAST(props->>'k' AS INT))")}           AS avg_k_e4,
           CAST(MAX(CAST(props->>'k' AS INT)) AS INT)          AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="F9 JSON encode/decode of open payloads; ref src/helpers.py:88-99. "
    "Spark side uses get_json_object (codegen'd JSON path, no UDF).",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            e4(F.avg(k)).alias("avg_k_e4"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "sparse_bool_render",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN '' ELSE o_orderstatus END AS status_cell,
           CASE WHEN o_totalprice >= 1000 THEN '' ELSE 'LOW:' || CAST(ROUND(o_totalprice, 2) AS VARCHAR) END AS price_flag
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    doc="F7/S14 sparse boolean render (expected values as empty cells) for the "
    "TSV quality-report sink; ref src/helpers.py:228-229, "
    "src/neuron_morphology/validation/quality_metric.py:99-125",
)
def sparse_bool_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "").otherwise(F.col("o_orderstatus")).alias(
            "status_cell"
        ),
        F.when(F.col("o_totalprice") >= 1000, "")
        .otherwise(F.concat(F.lit("LOW:"), F.round("o_totalprice", 2).cast("string")))
        .alias("price_flag"),
    ).orderBy("o_orderkey")


@register(
    "substring_heuristics",
    f"""
    SELECT CASE WHEN CONTAINS(p_type, 'ECONOMY') THEN 'economy'
                WHEN CONTAINS(p_type, 'PROMO')   THEN 'promotional'
                WHEN CONTAINS(p_type, 'STANDARD') THEN 'standard'
                ELSE 'other' END AS type_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           {e4_sql('AVG(p_retailprice)')} AS avg_price_e4
    FROM part
    GROUP BY type_class
    ORDER BY type_class
    """,
    doc="F4 substring heuristics (unit inference from metric-name keywords); "
    "ref src/neuron_morphology/feature_annotations/morph_metrics_neurom.py:102-144",
)
def substring_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    type_class = (
        F.when(F.col("p_type").contains("ECONOMY"), "economy")
        .when(F.col("p_type").contains("PROMO"), "promotional")
        .when(F.col("p_type").contains("STANDARD"), "standard")
        .otherwise("other")
    )
    return (
        part.groupBy(type_class.alias("type_class"))
        .agg(
            F.count("*").alias("n_parts"),
            e4(F.avg("p_retailprice")).alias("avg_price_e4"),
        )
        .orderBy("type_class")
    )


@register(
    "numeric_functions",
    f"""
    SELECT p_partkey,
           {quantized_sql('p_retailprice', 1)}             AS price_r1_x10,
           CAST(FLOOR(p_retailprice) AS BIGINT)            AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT)             AS price_ceil,
           ABS(p_size - 25)                                AS size_dist,
           {e4_sql('SQRT(p_retailprice)')}                 AS price_sqrt_e4,
           CAST(p_size % 7 AS INT)                         AS size_mod
    FROM part
    WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
    doc="F6 numeric round/abs/norm arithmetic; "
    "ref src/neuron_morphology/validation/region_comparison.py:380-385, "
    "src/neuron_morphology/validation/custom_validation.py:41-59",
)
def numeric_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return part.select(
        "p_partkey",
        quantized(F.col("p_retailprice"), 1).alias("price_r1_x10"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        e4(F.sqrt("p_retailprice")).alias("price_sqrt_e4"),
        (F.col("p_size") % 7).alias("size_mod"),
    ).orderBy("p_partkey")


@register(
    "encode_normalize",
    r"""
    SELECT c_custkey,
           base64(c_name::BLOB) AS name_b64,
           replace(c_mktsegment, ' ', '+') AS segment_urlenc,
           CAST(regexp_extract(c_name, '#0*(\d+)$', 1) AS INT) AS name_num,
           'postnatal' AS age_period,
           'days' AS age_unit,
           CAST(regexp_extract('PN' || CAST(c_custkey % 30 AS VARCHAR), 'PN(\d+)', 1) AS INT) AS age_days,
           CASE c_mktsegment
                WHEN 'BUILDING' THEN 'seg:0001' WHEN 'AUTOMOBILE' THEN 'seg:0002'
                WHEN 'MACHINERY' THEN 'seg:0003' WHEN 'HOUSEHOLD' THEN 'seg:0004'
                ELSE 'seg:other' END AS segment_id
    FROM customer
    WHERE c_custkey < 300
    ORDER BY c_custkey
    """,
    doc="F10 base64 + url-encode, F12 label->id dictionary normalization "
    "and 'PN14'-style code parsing into typed fields (ref "
    "src/common_metadata.py:98-126, src/helpers.py:263-265). url_encode "
    "is Spark's builtin; the oracle can spell it as replace() because "
    "the fixture segment charset is [A-Z ].",
)
def encode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    age_code = F.concat(F.lit("PN"), (F.col("c_custkey") % 30).cast("string"))
    seg_map = (
        F.when(F.col("c_mktsegment") == "BUILDING", "seg:0001")
        .when(F.col("c_mktsegment") == "AUTOMOBILE", "seg:0002")
        .when(F.col("c_mktsegment") == "MACHINERY", "seg:0003")
        .when(F.col("c_mktsegment") == "HOUSEHOLD", "seg:0004")
        .otherwise("seg:other")
    )
    return cust.select(
        "c_custkey",
        F.base64(F.col("c_name").cast("binary")).alias("name_b64"),
        F.url_encode("c_mktsegment").alias("segment_urlenc"),
        F.regexp_extract("c_name", r"#0*(\d+)$", 1).cast("int").alias("name_num"),
        F.lit("postnatal").alias("age_period"),
        F.lit("days").alias("age_unit"),
        F.regexp_extract(age_code, r"PN(\d+)", 1).cast("int").alias("age_days"),
        seg_map.alias("segment_id"),
    ).orderBy("c_custkey")


@register(
    "jwt_decode",
    r"""
    WITH tok AS (
        SELECT c_custkey,
               replace(replace(rtrim(to_base64(('{"alg":"none","typ":"JWT"}')::BLOB), '='), '+', '-'), '/', '_')
               || '.' ||
               replace(replace(rtrim(to_base64(('{"preferred_username":"' || c_name || '"}')::BLOB), '='), '+', '-'), '/', '_')
               || '.fake-sig' AS token
        FROM customer WHERE c_custkey < 300
    )
    SELECT c_custkey,
           token,
           json_extract_string(
               decode(from_base64(
                   replace(replace(split_part(token, '.', 2), '-', '+'), '_', '/')
                   || repeat('=', (4 - length(split_part(token, '.', 2)) % 4) % 4)
               )),
               '$.preferred_username'
           ) AS username
    FROM tok
    ORDER BY c_custkey
    """,
    doc="F11 JWT payload decode (no signature verification — the "
    "reference reads preferred_username from its token the same way, "
    "ref src/neuron_morphology/creation_helpers.py:12-20): tokens are "
    "SYNTHESIZED from customer names (header.payload.sig, base64url), "
    "then the claim is extracted via functions/text.jwt_claim. The "
    "oracle builds and decodes the token independently in DuckDB, so "
    "BOTH the base64url encoder and the decode path are certified "
    "(token strings and claims must hash-match).",
)
def jwt_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import base64url_encode, jwt_claim

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    header = base64url_encode(F.lit('{"alg":"none","typ":"JWT"}'))
    payload = base64url_encode(
        F.concat(F.lit('{"preferred_username":"'), F.col("c_name"), F.lit('"}'))
    )
    token = F.concat(header, F.lit("."), payload, F.lit(".fake-sig"))
    return (
        cust.select("c_custkey", token.alias("token"))
        .select("c_custkey", "token", jwt_claim(F.col("token"), "preferred_username").alias("username"))
        .orderBy("c_custkey")
    )


@register(
    "incremental_agg",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mn,
           CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mx
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Incremental aggregate maintenance (operators/incremental.py): "
    "orders split into 3 disjoint batches, each folded into a running "
    "per-priority state of mergeable partials (count/sum/min/max over "
    "integer cents — exact, order-independent), finalized at read time. "
    "The oracle is the ONE-SHOT aggregate over the full table, so the "
    "differential check certifies fold-in == recompute for any split — "
    "the invariant that lets a 100 TB pipeline pay per-batch cost "
    "instead of per-corpus cost.",
)
def incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import merge_states, partial_state

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    keys = ["o_orderpriority"]
    state = None
    for i in range(3):
        batch = orders.filter(F.pmod(F.col("cents"), F.lit(3)) == F.lit(i))
        state = merge_states(state, partial_state(batch, keys, "cents"), keys)
    return state.select(
        "o_orderpriority",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("total").cast("bigint").alias("total_cents"),
        F.col("mn").cast("bigint").alias("mn"),
        F.col("mx").cast("bigint").alias("mx"),
    ).orderBy("o_orderpriority")


@register(
    "incremental_join",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey < 3000
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Incremental JOIN-view maintenance (operators/incremental.py "
    "delta_join): orders and lineitem arrive in 3 append batches each, "
    "split by DIFFERENT keys per side so matching rows land in "
    "different batches — the delta rule d(A join B) = dA join B + "
    "A join dB + dA join dB catches every combination exactly once, at "
    "per-batch cost (AQE broadcasts the delta side). The oracle is the "
    "ONE-SHOT join, so the differential check certifies fold == "
    "recompute; integer-cents sum keeps the aggregate order-exact.",
)
def incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import fold_join_batches

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000).select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000).select(
        F.col("l_orderkey").alias("k"), "l_returnflag"
    )
    # deliberately UNALIGNED batch splits: a matched (order, line) pair
    # can sit in any (i, j) batch combination
    a_batches = [orders.filter(F.pmod(F.col("k"), F.lit(3)) == i) for i in range(3)]
    # k*2 mod 3 permutes the residues (2 is invertible mod 3), so batch
    # i on the B side holds DIFFERENT keys than batch i on the A side
    b_batches = [
        li.filter(F.pmod(F.col("k") * 2, F.lit(3)) == i) for i in range(3)
    ]
    view = fold_join_batches(a_batches, b_batches, ["k"])
    return (
        view.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "incremental_join_retract",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey < 3000 AND o_orderkey % 7 <> 0
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Incremental join view under INSERTS AND DELETES "
    "(operators/incremental.py delta_join_mult, DBSP-style "
    "multiplicity deltas): batch 1-2 insert all orders, batch 3 "
    "RETRACTS the orderkey%7==0 ones (mult -1); the bilinear delta "
    "rule emits cancelling -1 join rows, and normalization nets them "
    "out. The oracle computes the join over the NET input directly — "
    "fold-with-deletions == recompute-over-survivors, the invariant "
    "that lets a 100 TB pipeline process GDPR deletions or corrections "
    "as per-batch deltas instead of full rebuilds.",
)
def incremental_join_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import fold_join_batches_mult, with_mult

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000).select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000).select(
        F.col("l_orderkey").alias("k"), "l_returnflag"
    )
    retract = orders.filter(F.pmod(F.col("k"), F.lit(7)) == 0)
    a_batches = [
        with_mult(orders.filter(F.pmod(F.col("k"), F.lit(2)) == 0)),
        with_mult(orders.filter(F.pmod(F.col("k"), F.lit(2)) == 1)),
        with_mult(retract, -1),
    ]
    empty_li = li.limit(0)
    b_batches = [with_mult(li), with_mult(empty_li), with_mult(empty_li)]
    view = fold_join_batches_mult(a_batches, b_batches, ["k"])
    # bag-correct aggregation: weight every row by its net multiplicity
    # (all 1 here — the base relations are duplicate-free — but the
    # weighted form stays right if they ever are not)
    return (
        view.groupBy("l_returnflag")
        .agg(
            F.sum("__mult").cast("bigint").alias("n_rows"),
            F.sum(F.col("cents") * F.col("__mult")).cast("bigint").alias("total_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "incremental_agg_retract",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    WHERE o_orderkey % 7 <> 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Retraction-aware aggregate maintenance (operators/incremental."
    "partial_state_mult): two insert batches then a batch RETRACTING "
    "the orderkey%7==0 rows (mult -1). Count and sum are group "
    "structures, so deletions fold as negative contributions at "
    "per-batch cost — no rescan; the oracle aggregates the net "
    "survivors directly. min/max deliberately excluded (monoid-only — "
    "retracting the extremum needs a rescan; the honest limitation "
    "every IVM system shares).",
)
def incremental_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import (
        merge_states_mult,
        partial_state_mult,
        with_mult,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    keys = ["o_orderpriority"]
    batches = [
        with_mult(orders.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0)),
        with_mult(orders.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1)),
        with_mult(orders.filter(F.pmod(F.col("o_orderkey"), F.lit(7)) == 0), -1),
    ]
    state = None
    for b in batches:
        state = merge_states_mult(state, partial_state_mult(b, keys, "cents"), keys)
    return state.select(
        "o_orderpriority",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("total").cast("bigint").alias("total_cents"),
    ).orderBy("o_orderpriority")


@register(
    "table_profile",
    """
    SELECT 'l_quantity' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           CAST(MIN(l_quantity) AS VARCHAR) AS min_val,
           CAST(MAX(l_quantity) AS VARCHAR) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
           MIN(l_returnflag), MAX(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT),
           CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
           STRFTIME(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'),
           STRFTIME(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S')
    FROM lineitem
    ORDER BY col
    """,
    doc="ANALYZE-style data profile: per-column row/null/distinct "
    "counts and min/max rendered as strings, for numeric, categorical "
    "and timestamp columns — the data-quality monitoring scan every "
    "warehouse runs after ingest. ONE pass over the table computes all "
    "columns' profiles (one aggregate, column-pruned scan); the "
    "UNION-ALL oracle formulation is three passes, which is exactly "
    "the recompute the single-pass plan avoids at 100 TB.",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")

    def fmt_ts(c):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")

    # One branch per profiled column, each a TWO-LEVEL hash
    # aggregation: groupBy(value) with map-side partial aggregation
    # shuffles only the column's DISTINCT values, then a 1-row fold
    # reads counts and min/max off the group keys. The previous
    # all-in-one agg with three COUNT(DISTINCT)s planned as an
    # Expand(x4) of every row into a SortAggregate — 4x the rows
    # through a per-partition sort, and 4x the shuffle bytes (r11,
    # guide §2.3/§2.4). Values are bit-identical: countDistinct ==
    # count of non-null group keys; min/max skip nulls on both routes
    # and are formatted AFTER aggregating, on the native type.
    def profile(col: str, fmt=None):
        mn, mx = F.min(col), F.max(col)
        if fmt is not None:
            mn, mx = fmt(mn), fmt(mx)
        return (
            li.groupBy(col)
            .agg(F.count("*").alias("__n"))
            .agg(
                F.coalesce(F.sum("__n"), F.lit(0)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col(col).isNull(), F.col("__n"))),
                    F.lit(0),
                ).alias("n_nulls"),
                F.count(col).alias("n_distinct"),
                mn.cast("string").alias("min_val"),
                mx.cast("string").alias("max_val"),
            )
            .select(
                F.lit(col).alias("col"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_val",
                "max_val",
            )
        )

    rows = (
        profile("l_quantity")
        .unionByName(profile("l_returnflag"))
        .unionByName(profile("l_shipdate", fmt=fmt_ts))
    )
    return rows.orderBy("col")
