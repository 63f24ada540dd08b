"""Window-function, statistics and time-bucket coverage
(SURVEY §2.4 A4/A5/A9/A10, §2.5 W2-analog frames, §2.10 extension).

The reference has no analytic frames (§2.5 note), but the engine
provides them as first-class: running accumulations, lag/lead deltas,
ranking, exact percentiles, event-time bucketing — the batch twins of
the Structured Streaming plans in ``streaming/events.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.quantize import e4, e4_sql
from ..functions.time import epoch_sec
from ..streaming.events import windowed_counts
from .base import REGISTRY, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "windowed_event_counts",
    """
    SELECT STRFTIME(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Event-time windowed aggregation — the batch twin of the Structured "
    "Streaming ingest (streaming/events.py, availableNow-drained, "
    "watermarked); stream/batch equivalence is pytest-verified.",
    headline=True,
)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return windowed_counts(ev, "1 hour").orderBy("window_start", "event_type")


@register(
    "running_total",
    """
    SELECT user_id,
           event_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_value,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq
    FROM events
    WHERE user_id < 10
    ORDER BY user_id, seq
    """,
    doc="W2 running accumulation (cumulative path-length analog) as a frame "
    "window; ref src/neuron_morphology/validation/custom_validation.py:11-29",
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(frame), 2)
            .cast("double")
            .alias("running_value"),
            F.row_number().over(w).alias("seq"),
        )
        .orderBy("user_id", "seq")
    )


@register(
    "lag_lead_deltas",
    """
    SELECT user_id, event_id,
           CAST(COALESCE(date_diff('second', LAG(ts) OVER w, ts), -1) AS BIGINT) AS secs_since_prev,
           ROUND(value - COALESCE(LAG(value) OVER w, 0), 2) AS value_delta,
           LEAD(event_type) OVER w AS next_event_type
    FROM events
    WHERE user_id < 5
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    doc="lag/lead analytic functions (sessionization building block).",
)
def lag_lead_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Truncate each timestamp to seconds before differencing (matches
    # DuckDB date_diff('second', ...) boundary-crossing semantics).
    sec = epoch_sec(ev, "ts")
    secs = sec - F.lag(sec).over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.coalesce(secs, F.lit(-1)).alias("secs_since_prev"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0)), 2).alias(
            "value_delta"
        ),
        F.lead("event_type").over(w).alias("next_event_type"),
    ).orderBy("user_id", "event_id")


@register(
    "rank_battery",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(RANK() OVER w AS INT) AS bal_rank,
           CAST(DENSE_RANK() OVER w AS INT) AS bal_dense_rank,
           CAST(NTILE(4) OVER w AS INT) AS bal_quartile
    FROM customer
    WHERE c_custkey < 300
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_custkey
    """,
    doc="rank/dense_rank/ntile ranking battery per group.",
)
def rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    ).orderBy("c_custkey")


@register(
    "stats_battery",
    f"""
    SELECT l_returnflag,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           {e4_sql('AVG(l_extendedprice)')} AS mean_price_e4,
           {e4_sql('STDDEV_SAMP(l_extendedprice)')} AS std_price_e4,
           {e4_sql('QUANTILE_CONT(l_extendedprice, 0.5)')} AS median_price_e4,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="A5 morphometric stats battery (min/max/mean/std/median per group); "
    "ref src/neuron_morphology/feature_annotations/morph_metrics_neurom.py:272-288. "
    "Median is the EXACT interpolated percentile (Spark percentile == DuckDB "
    "quantile_cont); approx_percentile is the knob for 100TB scale. "
    "Computed moments emit as basis-point BIGINTs (functions/quantize.py); "
    "min/max are raw input values (no ROUND — cross-engine round of a "
    "double is itself the exposure).",
)
def stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # The median rides percentile's FREQUENCY form off a (group, value)
    # pre-aggregate instead of sitting inside the main agg: the UDAF's
    # per-row buffer accumulation runs map-side partial-agg'd through
    # the codegen'd hash aggregate and the exchange carries one row per
    # distinct (group, value) — bit-identical interpolation (verified),
    # float moments untouched (their summation order is unchanged).
    # The join-back is a 3-row broadcast. (r11, guide §2.3 — the
    # with_quartile_bin frequency-form precedent.)
    main = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        e4(F.avg("l_extendedprice")).alias("mean_price_e4"),
        e4(F.stddev_samp("l_extendedprice")).alias("std_price_e4"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("sum_price"),
    )
    freq = (
        li.where(F.col("l_extendedprice").isNotNull())
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(F.count("*").alias("__n"))
    )
    med = freq.groupBy("l_returnflag").agg(
        e4(F.expr("percentile(l_extendedprice, 0.5, __n)")).alias(
            "median_price_e4"
        )
    )
    # LEFT join (ADVICE r11): a group whose l_extendedprice is entirely
    # NULL has no row in the non-null frequency pre-aggregate; an inner
    # join would silently drop the whole group, where the original
    # single-aggregate form emitted it with a NULL median. Left keeps
    # the original semantics (no-op on this non-null fixture column).
    return (
        main.join(F.broadcast(med), "l_returnflag", "left")
        .select(
            "l_returnflag",
            "min_price",
            "max_price",
            "mean_price_e4",
            "std_price_e4",
            "median_price_e4",
            "sum_price",
        )
        .orderBy("l_returnflag")
    )


@register(
    "value_histogram",
    """
    SELECT event_type,
           CAST(FLOOR(value / 5) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
    doc="A4 per-type histograms (region-point histogram shape); "
    "ref src/neuron_morphology/feature_annotations/morph_metrics_dke.py:84-105",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.floor(F.col("value") / 5).alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "bucket")
    )


@register(
    "drop_duplicates",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_distinct_users
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="A9 point-dedup before expensive downstream work (dropDuplicates); "
    "ref src/neuron_morphology/feature_annotations/morph_metrics_dke.py:183-200",
)
def drop_duplicates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_type")
        .dropDuplicates()
        .groupBy("event_type")
        .agg(F.count("*").alias("n_distinct_users"))
        .orderBy("event_type")
    )


@register(
    "count_compare",
    """
    WITH a AS (SELECT o_custkey AS id, CAST(COUNT(*) AS BIGINT) AS n
               FROM orders GROUP BY o_custkey),
         b AS (SELECT c_custkey AS id, CAST(COUNT(o_orderkey) AS BIGINT) AS n
               FROM customer JOIN orders ON o_custkey = c_custkey
               GROUP BY c_custkey)
    SELECT id, n FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    ORDER BY id
    """,
    doc="A10 differential count-compare across two formulations (must be "
    "empty); ref src/schemas/getters.py:226-252 — the reference's own "
    "cross-engine verification habit, kept as a first-class operator.",
)
def count_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    a = orders.groupBy(F.col("o_custkey").alias("id")).agg(F.count("*").alias("n"))
    b = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_custkey").alias("id"))
        .agg(F.count("o_orderkey").alias("n"))
    )
    return a.exceptAll(b).orderBy("id")


@register(
    "session_stats",
    """
    WITH seq AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    ), marked AS (
        SELECT user_id, event_id, us,
               CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS boundary
        FROM seq
    ), sess AS (
        SELECT user_id, us,
               SUM(boundary) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    ), per_sess AS (
        SELECT user_id, session_id, COUNT(*) AS n_events, MAX(us) - MIN(us) AS dwell_us
        FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           CAST(SUM(dwell_us) AS BIGINT) AS total_dwell_us
    FROM per_sess GROUP BY user_id ORDER BY user_id
    """,
    headline=True,
    doc="Batch sessionization (30-min gap) via analytic windows: lag -> "
    "boundary flag -> running-sum session id -> two-level rollup. Exact "
    "integer microsecond domain. One shuffle on user_id for the whole "
    "pipeline — the windows and both groupBys reuse the partitioning.",
)
def session_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.sessions import session_stats

    return session_stats(_t(spark, sf_dir, "events")).orderBy("user_id")


@register(
    "session_window_counts",
    """
    WITH seq AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    ), marked AS (
        SELECT user_id, event_id, us,
               CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS boundary
        FROM seq
    ), sess AS (
        SELECT user_id, us,
               SUM(boundary) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           CAST(MIN(us) AS BIGINT) AS session_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_start_us
    """,
    doc="Spark's built-in session_window gap-merge aggregation (the "
    "streaming-native sessionizer, run in batch mode); oracle rebuilds "
    "the same sessions analytically.",
)
def session_window_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.sessions import session_window_counts

    return session_window_counts(_t(spark, sf_dir, "events")).orderBy(
        "user_id", "session_start_us"
    )


@register(
    "asof_join_events",
    """
    WITH v AS (
        SELECT user_id, ts, MAX(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    p AS (
        SELECT user_id, ts, event_id, value FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id,
           ROUND(p.value, 2) AS purchase_value,
           ROUND(v.view_value, 2) AS last_view_value,
           CAST(COALESCE(date_diff('second', v.ts, p.ts), -1) AS BIGINT) AS secs_since_view
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
    ORDER BY p.user_id, p.event_id
    """,
    doc="Backward as-of join (point-in-time-correct feature lookup: each "
    "purchase sees the LATEST prior view, never a future one) via the "
    "union+window formulation in operators/temporal.py — one shuffle on "
    "the key, no join node, no inequality-join nested loop. Oracle is "
    "DuckDB's native ASOF LEFT JOIN.",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.time import epoch_us_expr, ts_dtype
    from ..operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(purchases, views, ["user_id"], "ts", ["view_value"])
    dtype = ts_dtype(ev, "ts")
    sec = F.floor(epoch_us_expr("ts", dtype) / 1_000_000)
    msec = F.floor(epoch_us_expr("__matched_ts", dtype) / 1_000_000)
    return joined.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("view_value", 2).alias("last_view_value"),
        F.coalesce(sec - msec, F.lit(-1)).cast("bigint").alias("secs_since_view"),
    ).orderBy("user_id", "event_id")


@register(
    "range_join_binned",
    """
    WITH bands(band, lo, hi) AS (VALUES
        ('q1_small', 0.0, 10.0),
        ('q2_mid', 10.0, 20.0),
        ('q3_large', 20.0, 35.0),
        ('q4_bulk', 35.0, 51.0)
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
    FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    ORDER BY band
    """,
    doc="Point-in-interval range join as a BINNED equi-join "
    "(operators/temporal.range_join_binned): intervals explode onto the "
    "integer bins they cover, points probe one bin, the exact predicate "
    "verifies post-join — a hash join where the naive inequality join "
    "plans a BroadcastNestedLoopJoin. Oracle is the plain inequality join.",
)
def range_join_binned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import range_join_binned

    li = _t(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    import pandas as pd

    # pandas+Arrow build: JVM-side scan, no per-partition Python
    # workers (see asc_morphology_battery)
    bands = spark.createDataFrame(
        pd.DataFrame(
            [
                ("q1_small", 0.0, 10.0),
                ("q2_mid", 10.0, 20.0),
                ("q3_large", 20.0, 35.0),
                ("q4_bulk", 35.0, 51.0),
            ],
            columns=["band", "lo", "hi"],
        )
    ).repartition(1)
    joined = range_join_binned(li, bands, "l_quantity", "lo", "hi", bin_width=5.0)
    return (
        joined.groupBy("band")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("band")
    )


@register(
    "grouped_topk",
    """
    SELECT user_id, event_id, ROUND(value, 2) AS value
    FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rn
        FROM events
    )
    WHERE rn <= 3
    ORDER BY user_id, value DESC, event_id
    """,
    doc="Skew-proof grouped top-k (operators/skew.grouped_topk_salted): "
    "per-(key, salt) partial rank keeps k rows per salt, then the "
    "per-key rank runs over <= n_salts*k survivors — a Zipfian hot key "
    "never sorts its whole row set on one task. Oracle is the plain "
    "per-key ROW_NUMBER; salting must never change answers.",
)
def grouped_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import grouped_topk_salted

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    top = grouped_topk_salted(
        ev, ["user_id"], [F.desc("value"), F.asc("event_id")], k=3
    )
    return top.select(
        "user_id", "event_id", F.round("value", 2).alias("value")
    ).orderBy("user_id", F.desc("value"), "event_id")


@register(
    "event_funnel",
    """
    WITH fv AS (
        SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
        FROM events GROUP BY user_id
    ),
    per_user AS (
        SELECT e.user_id,
               MAX(fv.first_view IS NOT NULL) AS viewed,
               MAX(fv.first_view IS NOT NULL AND e.event_type = 'purchase'
                   AND e.ts >= fv.first_view) AS purchased_after_view
        FROM events e JOIN fv ON e.user_id = fv.user_id
        GROUP BY e.user_id
    )
    SELECT stage, CAST(n_users AS BIGINT) AS n_users
    FROM (
        SELECT '0_any' AS stage, COUNT(*) AS n_users FROM per_user
        UNION ALL
        SELECT '1_viewed', COUNT(*) FILTER (WHERE viewed) FROM per_user
        UNION ALL
        SELECT '2_purchased_after_view', COUNT(*) FILTER (WHERE purchased_after_view)
        FROM per_user
    )
    ORDER BY stage
    """,
    doc="Ordered event-sequence funnel (view -> later purchase), the "
    "sequential-pattern rollup product analytics needs: first-view via a "
    "per-key analytic window (one shuffle on user_id, reused by the "
    "per-user flags), then a single conditional-aggregation stack — no "
    "self-join of the event log against itself.",
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    first_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    flags = (
        ev.withColumn("__fv", first_view)
        .groupBy("user_id")
        .agg(
            F.max(F.col("__fv").isNotNull()).alias("viewed"),
            F.max(
                F.col("__fv").isNotNull()
                & (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("__fv"))
            ).alias("purchased_after_view"),
        )
    )
    agg = flags.agg(
        F.count("*").alias("n0"),
        F.count(F.when(F.col("viewed"), 1)).alias("n1"),
        F.count(F.when(F.col("purchased_after_view"), 1)).alias("n2"),
    )
    return agg.selectExpr(
        "stack(3, '0_any', n0, '1_viewed', n1, '2_purchased_after_view', n2) "
        "AS (stage, n_users)"
    ).orderBy("stage")


@register(
    "pivot_event_matrix",
    """
    SELECT user_id % 10 AS user_bucket,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events
    GROUP BY user_bucket
    ORDER BY user_bucket
    """,
    doc="PIVOT (long->wide counts matrix) with the pivot values given "
    "EXPLICITLY — the two-pass 'discover values then pivot' form needs a "
    "collect of the distinct values to the driver; fixing the column set "
    "keeps the plan a single partial-agg'd groupBy, which is the shape "
    "to use at scale. Oracle is conditional aggregation.",
)
def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
        .orderBy("user_bucket")
    )


@register(
    "cube_census",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT)
               AS grouping_level
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY grouping_level, status, priority
    """,
    doc="CUBE census over (status, priority) with grouping_id — all four "
    "aggregation granularities in ONE pass (the expand operator emits one "
    "row per grouping set per input row, partial aggregation combines "
    "map-side), vs four separate scans. The A1-A3 census family's "
    "multi-granularity form.",
)
def cube_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.grouping_id().cast("int").alias("grouping_level"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "grouping_level",
        )
        .orderBy("grouping_level", "status", "priority")
    )


@register(
    "quantile_bins",
    """
    WITH q AS (
        SELECT QUANTILE_CONT(l_extendedprice, 0.25) AS q1,
               QUANTILE_CONT(l_extendedprice, 0.50) AS q2,
               QUANTILE_CONT(l_extendedprice, 0.75) AS q3
        FROM lineitem
    )
    SELECT CASE WHEN l_extendedprice IS NULL THEN 'null'
                WHEN l_extendedprice < q1 THEN 'p00_25'
                WHEN l_extendedprice < q2 THEN 'p25_50'
                WHEN l_extendedprice < q3 THEN 'p50_75'
                ELSE 'p75_100' END AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
    FROM lineitem, q
    GROUP BY bin
    ORDER BY bin
    """,
    doc="Equi-depth (quantile) binning through the AUTO-SWITCHING cut "
    "strategy (operators/quantiles.with_quartile_bin, r7): exact "
    "percentile below EXACT_QUANTILE_THRESHOLD rows (Spark percentile "
    "== DuckDB quantile_cont — the oracle-pinned regime, and where this "
    "fixture lands), approx_percentile (Greenwald-Khanna sketch, "
    "mergeable map-side, one pass) above it — one metadata-cheap count "
    "decides, the zordered_df auto-method precedent. The certified "
    "approx regime is its own query (quantile_bins_approx). Cuts fold "
    "in as a LATERAL scalar subquery, never a join node. The oracle "
    "carries the engine's 'null' bin branch (r9, ADVICE r8) — a no-op "
    "on this non-null column, but the definitions stay aligned if a "
    "future fixture grows NULLs.",
)
def quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import with_quartile_bin

    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_qb")
    binned = with_quartile_bin(spark, "lineitem_qb", "l_extendedprice", "auto")
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2
            )
            .cast("double")
            .alias("total"),
        )
        .orderBy("bin")
    )


@register(
    "quantile_bins_approx",
    """
    WITH b AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM lineitem
    )
    SELECT bin, n_total, TRUE AS mass_within_1pct_rank
    FROM b, UNNEST(['p00_25', 'p25_50', 'p50_75', 'p75_100']) AS t(bin)
    ORDER BY bin
    """,
    doc="The quantile_bins APPROX regime, certified: cuts forced onto "
    "approx_percentile (the 100 TB path — the exact percentile's "
    "per-call sort is the cost ceiling the auto-switch avoids) and "
    "each bin's mass checked within 1% RANK error of the ideal "
    "quarter with exact integer arithmetic (|100n - 25*total| <= "
    "total; operators/quantiles.quartile_mass_certificate — the "
    "approx_quantile_check pattern: certify the sketch's actual "
    "rank-error guarantee, don't hash sketch-dependent values). The "
    "oracle pins the bin domain, the exact row total and the "
    "certificate verdicts.",
)
def quantile_bins_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import quartile_mass_certificate, with_quartile_bin

    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_qba")
    binned = with_quartile_bin(
        spark, "lineitem_qba", "l_extendedprice", "approx"
    )
    return quartile_mass_certificate(binned).orderBy("bin")


# Chunked variant against the SAME ASOF oracle — the skew layout must
# never change answers (the keep_latest_salted pattern).
@register(
    "asof_join_events_chunked",
    REGISTRY["asof_join_events"].oracle,
    doc="Skew-robust as-of join (operators/temporal.asof_join_chunked): "
    "the per-key window splits into time-range chunks with a boundary-"
    "carry table, so a Zipfian hot user spreads over (key, chunk) "
    "tasks. Same DuckDB ASOF LEFT JOIN oracle as asof_join_events — "
    "chunking is a physical layout choice, never a semantic one. Chunk "
    "width 6h against the fixture's event-time span exercises many "
    "chunks per user including carry-only chunks.",
)
def asof_join_events_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.time import epoch_us_expr, ts_dtype
    from ..operators.temporal import asof_join_chunked

    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join_chunked(
        purchases, views, ["user_id"], "ts", ["view_value"],
        chunk_width_us=6 * 3_600_000_000,
    )
    dtype = ts_dtype(ev, "ts")
    sec = F.floor(epoch_us_expr("ts", dtype) / 1_000_000)
    msec = F.floor(epoch_us_expr("__matched_ts", dtype) / 1_000_000)
    return joined.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("view_value", 2).alias("last_view_value"),
        F.coalesce(sec - msec, F.lit(-1)).cast("bigint").alias("secs_since_view"),
    ).orderBy("user_id", "event_id")


@register(
    "windowed_counts_pruned",
    """
    SELECT STRFTIME(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Windowed counts over the TIME-PARTITIONED events layout "
    "(sources/bucketing.ensure_time_partitioned_events: Hive-partitioned "
    "by event date): the literal date predicate prunes partitions at "
    "planning time — PartitionFilters in the scan, 3 of 30 day "
    "directories opened; at a year of 100 TB telemetry that is the "
    "difference between scanning everything and scanning 1%. Same "
    "results as filtering the flat layout (the oracle does exactly "
    "that) — layout is physical, never semantic.",
)
def windowed_counts_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bucketing import ensure_time_partitioned_events

    path = ensure_time_partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(path)
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    pruned = ev.filter(
        F.col("event_date").between("2024-01-05", "2024-01-07")
    )
    return windowed_counts(pruned, "1 hour").orderBy("window_start", "event_type")


@register(
    "approx_quantile_check",
    f"""
    SELECT l_returnflag,
           {e4_sql('quantile_cont(l_quantity, 0.50)')} AS exact_p50_e4,
           {e4_sql('quantile_cont(l_quantity, 0.95)')} AS exact_p95_e4,
           TRUE AS p50_within_1pct_rank,
           TRUE AS p95_within_1pct_rank
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Scale-path quantile sketch next to the exact percentile: "
    "percentile_approx (Greenwald-Khanna epsilon-sketch, fixed-size "
    "mergeable state) must land within 1% RANK error of the exact "
    "interpolated percentile — certified by re-ranking the approx "
    "answer against the group's own CDF, which is the sketch's actual "
    "guarantee (rank error, not value error). At 100 TB the exact "
    "percentile's per-group sort is the cost ceiling; the sketch is "
    "one pass with map-side merge (companion to approx_distinct_check, "
    "SURVEY §2.4 note).",
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import bounded_persist

    li = _t(spark, sf_dir, "lineitem")
    # persist: appx feeds both the broadcast re-rank AND the final
    # join — unpersisted, the exact percentile's per-group sort (this
    # query's own stated cost ceiling) would execute twice
    appx = bounded_persist(li.groupBy("l_returnflag").agg(
        e4(F.expr("percentile(l_quantity, 0.50)")).alias("exact_p50_e4"),
        e4(F.expr("percentile(l_quantity, 0.95)")).alias("exact_p95_e4"),
        F.percentile_approx("l_quantity", 0.50, 1000).alias("ap50"),
        F.percentile_approx("l_quantity", 0.95, 1000).alias("ap95"),
        F.count("*").alias("n"),
    ))
    # Re-rank the approx answers against the group's own CDF with a
    # second aggregate pass over lineitem (broadcast join-back on the
    # tiny per-group sketch table) — NOT collect_list: materializing a
    # group's values in one row is the exact per-group-sort cost the
    # sketch exists to avoid.
    ranked = (
        li.join(
            F.broadcast(appx.select("l_returnflag", "ap50", "ap95")),
            "l_returnflag",
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum((F.col("l_quantity") < F.col("ap50")).cast("long")).alias("lo50"),
            F.sum((F.col("l_quantity") <= F.col("ap50")).cast("long")).alias("hi50"),
            F.sum((F.col("l_quantity") < F.col("ap95")).cast("long")).alias("lo95"),
            F.sum((F.col("l_quantity") <= F.col("ap95")).cast("long")).alias("hi95"),
        )
    )

    def within(lo: str, hi: str, p: float):
        # GK guarantee: the returned VALUE occupies the rank interval
        # [#rows < v, #rows <= v] (ties widen it — l_quantity is
        # discrete), and that interval must intersect
        # [p*n - eps*n, p*n + eps*n]; assert at 1% rank error, 10x
        # looser than the configured eps = 1/1000
        return (F.col(lo) <= (p + 0.01) * F.col("n")) & (
            F.col(hi) >= (p - 0.01) * F.col("n")
        )

    return (
        appx.join(ranked, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_p50_e4",
            "exact_p95_e4",
            within("lo50", "hi50", 0.50).alias("p50_within_1pct_rank"),
            within("lo95", "hi95", 0.95).alias("p95_within_1pct_rank"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "sequence_funnel",
    """
    WITH t1 AS (
        SELECT user_id, MIN(ts) AS view_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, MIN(e.ts) AS click_ts
        FROM events e JOIN t1 ON t1.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > t1.view_ts
        GROUP BY e.user_id
    ),
    t3 AS (
        SELECT e.user_id, MIN(e.ts) AS purchase_ts
        FROM events e JOIN t2 ON t2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > t2.click_ts
        GROUP BY e.user_id
    )
    SELECT t1.user_id,
           t2.user_id IS NOT NULL AS reached_click,
           t3.user_id IS NOT NULL AS completed,
           CAST(COALESCE(EPOCH_US(t3.purchase_ts) - EPOCH_US(t1.view_ts), -1)
                AS BIGINT) AS funnel_us
    FROM t1
    LEFT JOIN t2 ON t2.user_id = t1.user_id
    LEFT JOIN t3 ON t3.user_id = t1.user_id
    ORDER BY t1.user_id
    """,
    doc="Strictly-ordered 3-step sequence detection (view -> later "
    "click -> later purchase) — the MATCH_RECOGNIZE-lite sequential "
    "pattern Spark lacks as syntax, expressed as a chain of "
    "conditional-min windows over ONE user_id partition: t1 = first "
    "view, t2 = first click AFTER t1, t3 = first purchase AFTER t2. "
    "All three windows share the partitioning, so the plan pays one "
    "key shuffle regardless of pattern length; no per-step self-join "
    "of the event table. Generalizes event_funnel's 2-step form.",
)
def sequence_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    with_t1 = ev.withColumn("__t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("__t1")),
            F.col("ts"),
        )
    ).over(w)
    with_t2 = with_t1.withColumn("__t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("__t2")),
            F.col("ts"),
        )
    ).over(w)
    from ..functions.time import epoch_us_expr, ts_dtype

    dtype = ts_dtype(ev, "ts")
    dur = epoch_us_expr("__t3", dtype) - epoch_us_expr("__t1", dtype)
    return (
        with_t2.withColumn("__t3", t3)
        .filter(F.col("__t1").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max(F.col("__t2").isNotNull()).alias("reached_click"),
            F.max(F.col("__t3").isNotNull()).alias("completed"),
            F.coalesce(F.max(dur), F.lit(-1)).cast("bigint").alias("funnel_us"),
        )
        .orderBy("user_id")
    )


@register(
    "next_event_training_pairs",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type, 3) OVER w AS c1,
               LAG(event_type, 2) OVER w AS c2,
               LAG(event_type, 1) OVER w AS c3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT c1 || '>' || c2 || '>' || c3 AS context, event_type AS label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq
    WHERE c1 IS NOT NULL AND c2 IS NOT NULL AND c3 IS NOT NULL
    GROUP BY 1, 2
    ORDER BY n DESC, context, label
    """,
    doc="Sequence-dataset construction — turn event logs into "
    "(context, label) next-event training pairs: per user, the 3 "
    "preceding event types (deterministic (ts, event_id) order) form "
    "the context, the current one the label, aggregated to pair "
    "counts. ONE shuffle on user_id for the lag window, one for the "
    "pair count; the per-user sequence never leaves its partition. "
    "The shape every next-token/next-action dataset builder runs at "
    "corpus scale.",
)
def next_event_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 3).over(w).alias("c1"),
        F.lag("event_type", 2).over(w).alias("c2"),
        F.lag("event_type", 1).over(w).alias("c3"),
    )
    return (
        seq.filter(
            F.col("c1").isNotNull()
            & F.col("c2").isNotNull()
            & F.col("c3").isNotNull()
        )
        .select(
            F.concat_ws(">", "c1", "c2", "c3").alias("context"),
            F.col("event_type").alias("label"),
        )
        .groupBy("context", "label")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "context", "label")
    )
