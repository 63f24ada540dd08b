"""Bucketed layout: the join of two co-bucketed tables must plan
without a shuffle exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_pipelines_spark.catalog import load_table
from data_integration_pipelines_spark.sources.bucketing import (
    read_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 8
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_cobucketed_join_has_no_shuffle(spark, bucketed):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "orders_b").join(
            read_table(spark, "lineitem_b"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # result parity with the plain-parquet join
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_counts_match_source(spark, sf_small, bucketed):
    li = load_table(spark, sf_small, "lineitem")
    assert read_table(spark, "lineitem_b").count() == li.count()


def test_partition_pruning(spark, sf_small, tmp_path):
    from data_integration_pipelines_spark.sources.bucketing import (
        write_partitioned,
    )

    orders = load_table(spark, sf_small, "orders")
    out = str(tmp_path / "orders_part")
    write_partitioned(orders, out, ["o_orderstatus"])

    pruned = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must be IN the partition filters (pruned at
    # planning time), not a post-scan data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "o_orderstatus" in pf, plan
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == expected


def test_ensure_cobucketed_facts_join_shuffle_free(spark, sf_small):
    from data_integration_pipelines_spark.sources.bucketing import (
        ensure_cobucketed_facts,
        read_table,
    )

    ot, lt = ensure_cobucketed_facts(spark, sf_small, n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, ot).join(read_table(spark, lt), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # bucket alignment satisfies the join's distribution requirement:
        # no shuffle exchange anywhere between the two scans
        assert "Exchange hashpartitioning" not in plan, plan
        # idempotent: second call reuses the tables (same names returned)
        assert ensure_cobucketed_facts(spark, sf_small, n_buckets=8) == (ot, lt)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {lt}")


def test_fact_pair_defaults_to_bucketed_layout(spark, sf_small):
    """fact_pair must (a) fall back to plain parquet when no bucketed
    layout exists, (b) pick up the co-bucketed tables once they do, and
    (c) keep the Exchange-free fact-fact hop THROUGH the l_orderkey
    rename (alias-aware output partitioning) — so pipeline consumers
    (relationship_assign, completeness_check, part_of_expansion) get the
    shuffle-free plan by default, not as an opt-in variant."""
    from data_integration_pipelines_spark.plans import REGISTRY
    from data_integration_pipelines_spark.sources.bucketing import (
        ensure_cobucketed_facts,
        fact_pair,
    )

    orders, li, bucketed = fact_pair(spark, sf_small)
    if not bucketed:
        assert "l_orderkey" in li.columns
    before = {
        tuple(r) for r in REGISTRY["relationship_assign"].fn(spark, sf_small).collect()
    }

    ot, lt = ensure_cobucketed_facts(spark, sf_small, n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders, li, bucketed = fact_pair(spark, sf_small)
        assert bucketed and "l_orderkey" in li.columns
        joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # layout must never change answers
        after = {
            tuple(r)
            for r in REGISTRY["relationship_assign"].fn(spark, sf_small).collect()
        }
        assert after == before
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {lt}")


class TestZOrder:
    """sources/zorder.py — Morton-clustered layout for 2-D data skipping."""

    def test_z_value_interleaves(self, spark):
        from data_integration_pipelines_spark.sources.zorder import z_value
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], ["a", "b"]
        )
        got = {
            (r.a, r.b): r.z
            for r in df.select("a", "b", z_value(F.col("a"), F.col("b"), 4).alias("z")).collect()
        }
        # bit i of a -> 2i, of b -> 2i+1
        assert got[(0, 0)] == 0
        assert got[(1, 0)] == 1
        assert got[(0, 1)] == 2
        assert got[(1, 1)] == 3
        # a=3 (011) -> 0b010101 at even bits = 1+4; b=5 (101) -> odd bits = 2+32
        assert got[(3, 5)] == (1 | 4) | (2 | 32)

    def test_zorder_layout_prunes_both_dimensions(self, spark, tmp_path):
        """Every z-ordered file's footer min/max must span only a
        fraction of BOTH key ranges; a single-column sort spans ~all
        of the second key. This is the property a reader's row-group
        pruning consumes — asserted from the real parquet footers."""
        from data_integration_pipelines_spark.sources.zorder import (
            write_zordered,
            zorder_stats,
        )

        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        df = events.select("event_id", "user_id")

        zpath = str(tmp_path / "z")
        write_zordered(df, zpath, "event_id", "user_id", n_files=16, bits=8)
        z_stats = zorder_stats(zpath, "event_id", "user_id")
        assert len(z_stats) >= 8

        spath = str(tmp_path / "s")
        df.repartitionByRange(16, "event_id").sortWithinPartitions(
            "event_id"
        ).write.mode("overwrite").parquet(spath)
        s_stats = zorder_stats(spath, "event_id", "user_id")

        def mean(stats, key):
            vals = [r[key] for r in stats]
            return sum(vals) / len(vals)

        # single-column sort: second dimension unpruned (~full range)
        assert mean(s_stats, "user_id_frac") > 0.8
        # z-order: BOTH dimensions bounded well below the full range
        assert mean(z_stats, "event_id_frac") < 0.6
        assert mean(z_stats, "user_id_frac") < 0.6
        # and the first dimension is not catastrophically worse than
        # the dedicated sort's second-dimension tradeoff
        assert mean(z_stats, "event_id_frac") + mean(z_stats, "user_id_frac") < \
            mean(s_stats, "event_id_frac") + mean(s_stats, "user_id_frac")


    def test_quantile_method_prunes_without_global_window(self, spark, tmp_path):
        """The approx-quantile path (the petabyte layout, round-5
        verdict task 3) must deliver the same layout CONTRACT — every
        file bounded on both keys — with NO window operator in the
        plan: an unpartitioned ntile funnels all rows through one task
        per key, which is exactly what the scale path exists to avoid.
        Bounds come from one sketch pass; rows bucket via JVM-side
        binary search."""
        from data_integration_pipelines_spark.sources.zorder import (
            write_zordered,
            zordered_df,
            zorder_stats,
        )

        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        df = events.select("event_id", "user_id")

        # plan gate: no Window node on the quantile path; the ntile
        # path (the exact small-table layout) does have one
        qplan = zordered_df(
            df, "event_id", "user_id", n_files=16, bits=8, method="quantile"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in qplan
        nplan = zordered_df(
            df, "event_id", "user_id", n_files=16, bits=8, method="ntile"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Window" in nplan

        zpath = str(tmp_path / "zq")
        write_zordered(
            df, zpath, "event_id", "user_id", n_files=16, bits=8, method="quantile"
        )
        z_stats = zorder_stats(zpath, "event_id", "user_id")
        assert len(z_stats) >= 8

        def mean(stats, key):
            vals = [r[key] for r in stats]
            return sum(vals) / len(vals)

        # same layout contract as the ntile path: both dimensions
        # bounded well below the full range
        assert mean(z_stats, "event_id_frac") < 0.6
        assert mean(z_stats, "user_id_frac") < 0.6

        # no rows lost or duplicated by the bucketing rewrite
        assert spark.read.parquet(zpath).count() == df.count()

        # deterministic: an identical re-run reproduces the exact
        # per-file fractions (equal values share a bucket by
        # construction — no tie-break needed on this path)
        zpath2 = str(tmp_path / "zq2")
        write_zordered(
            df, zpath2, "event_id", "user_id", n_files=16, bits=8, method="quantile"
        )
        frac = lambda st: sorted(
            (round(r["event_id_frac"], 9), round(r["user_id_frac"], 9)) for r in st
        )
        assert frac(zorder_stats(zpath2, "event_id", "user_id")) == frac(z_stats)


class TestCompaction:
    def test_compact_reduces_file_count_preserves_rows(self, spark, tmp_path):
        from data_integration_pipelines_spark.sources.zorder import (
            compact,
            file_stats,
        )
        from data_integration_pipelines_spark.catalog import load_table

        # fragment the table into 40 tiny files
        src = str(tmp_path / "frag.parquet")
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        docs.repartition(40).write.parquet(src)
        assert len(file_stats(src)) >= 40

        out = str(tmp_path / "compacted.parquet")
        report = compact(spark, src, out, target_file_bytes=64 * 1024 * 1024)
        assert report["files_after"] < report["files_before"]
        assert report["files_after"] <= 2
        # data equality, not just counts
        a = sorted(map(tuple, spark.read.parquet(src).collect()))
        b = sorted(map(tuple, spark.read.parquet(out).collect()))
        assert a == b

    def test_compact_with_sort_restores_clustering(self, spark, tmp_path):
        from data_integration_pipelines_spark.sources.zorder import compact

        src = str(tmp_path / "frag.parquet")
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        docs.repartition(16).write.parquet(src)
        out = str(tmp_path / "sorted.parquet")
        compact(
            spark, src, out,
            target_file_bytes=32 * 1024, sort_cols=["doc_id"],
        )
        import pyarrow.parquet as pq
        import pyarrow.dataset as ds

        ranges = []
        for frag in ds.dataset(out, format="parquet").get_fragments():
            md = pq.ParquetFile(frag.path).metadata
            c = md.row_group(0).column(0)
            # doc_id is the first column; min/max from footer
            stats = [
                (md.row_group(g).column(i).path_in_schema,
                 md.row_group(g).column(i).statistics)
                for g in range(md.num_row_groups)
                for i in range(md.row_group(g).num_columns)
            ]
            mins = [s.min for n, s in stats if n == "doc_id" and s]
            maxs = [s.max for n, s in stats if n == "doc_id" and s]
            ranges.append((min(mins), max(maxs)))
        ranges.sort()
        # range-partitioned files must not overlap on the sort key
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2


class TestZorder3D:
    def test_three_column_curve_bounds_all_dimensions(self, spark, tmp_path):
        """D=3 Morton layout: every output file's footer spans a
        bounded fraction of EACH key's global range — the property a
        single-column sort only gives on its own key."""
        from data_integration_pipelines_spark.catalog import load_table
        from data_integration_pipelines_spark.sources.zorder import (
            write_zordered,
            zorder_stats,
        )

        ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
            "event_id", "user_id", "value"
        )
        zpath = str(tmp_path / "z3.parquet")
        write_zordered(ev, zpath, "event_id", "user_id", "value", n_files=8, bits=6)
        stats = zorder_stats(zpath, "event_id", "user_id", "value")
        assert len(stats) >= 8

        # baseline: single-column sort — perfect on its own key, ~full
        # range on the other two
        spath = str(tmp_path / "sorted.parquet")
        (ev.repartitionByRange(8, "event_id").sortWithinPartitions("event_id")
           .write.parquet(spath))
        base = zorder_stats(spath, "event_id", "user_id", "value")

        def mean_frac(rows, col):
            return sum(r[f"{col}_frac"] for r in rows) / len(rows)

        # the curve must bound every dimension below the sorted
        # baseline's non-sort spans (~1.0), and no dimension collapses
        # to full range
        for col in ("user_id", "value"):
            assert mean_frac(stats, col) < mean_frac(base, col) * 0.85, col
        for col in ("event_id", "user_id", "value"):
            assert mean_frac(stats, col) < 0.9, (col, mean_frac(stats, col))

    def test_z_value_n_rejects_overflow_and_too_few(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F
        from data_integration_pipelines_spark.sources.zorder import (
            write_zordered,
            z_value_n,
        )

        with _pytest.raises(ValueError, match="z-bits"):
            z_value_n([F.lit(1)] * 4, bits=16)
        with _pytest.raises(ValueError, match="at least 2"):
            write_zordered(spark.range(1), "/tmp/never", "id")
