"""Unit/property tests for the distributed k-means + SemDeDup layer
(operators/clustering.py). The cross-engine value checks live in
test_queries_oracle; these pin the operator-level contracts:
determinism under partitioning, tie-break order, the removal policy,
and the bounded-collect guard."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_integration_pipelines_spark.catalog import load_table
from data_integration_pipelines_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
    quantize_vec,
    semdedup_pairs,
    semdedup_survivors,
)


@pytest.fixture(scope="module")
def embeddings(spark, sf_small):
    return load_table(spark, sf_small, "embeddings")


def _assignment(df, **kw):
    assigned, cents = kmeans_fit(df, **kw)
    rows = {r["id"]: r["cluster"] for r in assigned.select("id", "cluster").collect()}
    return rows, cents


def test_kmeans_partitioning_invariant(embeddings):
    # the fixed point must be a pure function of the DATA — row order,
    # partition count and layout must not leak into assignments
    a1, c1 = _assignment(embeddings.repartition(7), k=4, iters=2)
    a2, c2 = _assignment(embeddings.repartition(3, "label"), k=4, iters=2)
    assert a1 == a2
    assert c1 == c2


def test_kmeans_inertia_improves_on_fixture(embeddings):
    one, _ = kmeans_fit(embeddings, k=4, iters=1)
    three, _ = kmeans_fit(embeddings, k=4, iters=3)
    i1 = one.agg(F.sum("dist")).first()[0]
    i3 = three.agg(F.sum("dist")).first()[0]
    assert i3 <= i1


def test_assign_tie_breaks_to_lowest_cid(spark):
    # a point exactly between two centroids must take the lower cid —
    # the oracle's ROW_NUMBER (ORDER BY dist, cid) order
    qdf = spark.createDataFrame([Row(id=0, qvec=[0, 0])])
    cents = [(10, [-500, 0]), (20, [500, 0])]
    out = assign_clusters(qdf, cents).collect()[0]
    assert out["cluster"] == 10
    assert out["dist"] == 500 * 500


def test_assign_arrow_kernel_matches_expression_twin(spark, embeddings):
    """The r12 vectorized Arrow assignment (NumPy int64 kernel) must be
    bit-identical to the JVM expression twin on real fixture vectors —
    same cluster, same exact integer distance — and its plan must carry
    the ArrowEvalPython stage that replaced the interpreted HOF chain."""
    from data_integration_pipelines_spark.operators.clustering import (
        C_SCALE,
        assign_clusters_exprs,
    )

    qdf = embeddings.select(
        F.col("vec_id").alias("id"),
        quantize_vec(F.col("embedding")).alias("qvec"),
    )
    seed = qdf.orderBy("id").limit(5).collect()
    cents = [(int(r["id"]), [int(v) * C_SCALE for v in r["qvec"]]) for r in seed]
    got_df = assign_clusters(qdf, cents)
    got = {r["id"]: (r["cluster"], r["dist"]) for r in got_df.collect()}
    want = {
        r["id"]: (r["cluster"], r["dist"])
        for r in assign_clusters_exprs(qdf, cents).collect()
    }
    assert got == want and len(got) == embeddings.count()
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan[:2000]


def test_assign_arrow_kernel_tie_breaks_on_duplicate_centroids(spark):
    """Exact-distance ties (duplicate centroid components under
    different cids) must break to the LOWEST cid in the Arrow kernel —
    np.argmin's first-min over the cid-ascending matrix, the same rule
    as the expression twin and the oracle's ROW_NUMBER order."""
    from data_integration_pipelines_spark.operators.clustering import (
        assign_clusters_exprs,
    )

    qdf = spark.createDataFrame(
        [Row(id=i, qvec=[i * 7 % 13, -i * 3 % 11]) for i in range(50)]
    )
    cents = [(3, [100, 0]), (7, [100, 0]), (9, [0, 100])]  # 3 & 7 identical
    got = {r["id"]: (r["cluster"], r["dist"]) for r in assign_clusters(qdf, cents).collect()}
    want = {
        r["id"]: (r["cluster"], r["dist"])
        for r in assign_clusters_exprs(qdf, cents).collect()
    }
    assert got == want
    assert all(c != 7 for c, _ in got.values())  # ties never pick the larger cid


def test_quantize_vec_rounds_half_away(spark):
    df = spark.createDataFrame([Row(v=[0.00005, -0.00005, 0.12344])])
    got = df.select(quantize_vec(F.col("v")).alias("q")).first()["q"]
    # 0.00005*1e4 = 0.5 -> 1 away from zero; -0.5 -> -1
    assert got == [1, -1, 1234]


def test_semdedup_survivor_accounting(embeddings):
    assigned, _ = kmeans_fit(embeddings, k=4, iters=2)
    surv = semdedup_survivors(assigned, 0.35).collect()
    assert all(r["n_removed"] + r["n_kept"] == r["n_members"] for r in surv)
    # every removed id must have a smaller similar clustermate; every
    # pair's id_b must be removed
    pairs = semdedup_pairs(assigned, 0.35).collect()
    removed_expected = {(r["cluster"], r["id_b"]) for r in pairs}
    n_removed = sum(r["n_removed"] for r in surv)
    assert n_removed == len({key for key in removed_expected})


def test_kmeans_table_path_equals_driver_loop(embeddings):
    """The checkpointed centroid-table path must reach the EXACT fixed
    point of the driver-loop path: same assignment, same distances,
    same centroid values — the large-k*D regime changes the plan, not
    the algorithm."""
    from data_integration_pipelines_spark.operators.clustering import (
        kmeans_fit_table,
    )

    assigned_d, cents_d = kmeans_fit(embeddings, k=4, iters=2)
    assigned_t, cent_tbl = kmeans_fit_table(embeddings, k=4, iters=2)
    want = {
        r["id"]: (r["cluster"], r["dist"])
        for r in assigned_d.select("id", "cluster", "dist").collect()
    }
    got = {
        r["id"]: (r["cluster"], r["dist"])
        for r in assigned_t.select("id", "cluster", "dist").collect()
    }
    assert got == want
    want_cells = {
        (cid, pos, val)
        for cid, comps in cents_d
        for pos, val in enumerate(comps)
    }
    got_cells = {
        (r["cluster"], r["pos"], r["cval"]) for r in cent_tbl.collect()
    }
    assert got_cells == want_cells


def test_kmeans_auto_switches_above_cell_cap(embeddings, monkeypatch):
    """Above MAX_CENTROID_CELLS kmeans_fit must NOT raise: it delegates
    to the centroid-table path (the guard message's promised escape
    hatch) and still reaches the driver-loop fixed point."""
    from data_integration_pipelines_spark.operators import clustering

    want, _ = kmeans_fit(embeddings, k=4, iters=2)
    want = {r["id"]: r["cluster"] for r in want.select("id", "cluster").collect()}
    monkeypatch.setattr(clustering, "MAX_CENTROID_CELLS", 8)
    assigned, cents = clustering.kmeans_fit(embeddings, k=4, iters=2)
    from pyspark.sql import DataFrame

    assert isinstance(cents, DataFrame)  # table mode engaged
    got = {r["id"]: r["cluster"] for r in assigned.select("id", "cluster").collect()}
    assert got == want


def test_kmeans_table_reseeds_empty_cluster(spark):
    """A centroid no point chooses re-seeds from the farthest assigned
    point instead of silently dropping out: duplicate seed vectors make
    cluster 1 empty on the first assignment (ties break to cid 0)."""
    from data_integration_pipelines_spark.operators.clustering import (
        kmeans_fit_table,
    )

    rows = [
        Row(vec_id=0, embedding=[0.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 0.0]),  # duplicate of seed 0
        Row(vec_id=2, embedding=[10.0, 10.0]),
        Row(vec_id=3, embedding=[10.2, 10.2]),
    ]
    df = spark.createDataFrame(rows)
    assigned, cent = kmeans_fit_table(df, k=3, iters=1, reseed_empty=True)
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    # cluster 1 re-seeded at the farthest point (id 3), which then
    # claims it at distance 0
    assert got[3] == 1
    assert {r[0] for r in cent.select("cluster").distinct().collect()} == {0, 1, 2}

    dropped, cent_nr = kmeans_fit_table(df, k=3, iters=1, reseed_empty=False)
    assert {r[0] for r in cent_nr.select("cluster").distinct().collect()} == {0, 2}
    assert {r["cluster"] for r in dropped.collect()} == {0, 2}


def test_blocked_semdedup_equals_unblocked(embeddings):
    """The memory-bounded block-pair kernel must emit the EXACT pair
    set of the single-group kernel, at any block size — blocking caps
    task memory, never coverage or scores."""
    from data_integration_pipelines_spark.operators.clustering import (
        semdedup_pairs_blocked,
    )

    assigned, _ = kmeans_fit(embeddings, k=4, iters=2)
    want = {
        (r.cluster, r.id_a, r.id_b, r.cosine_e4)
        for r in semdedup_pairs(assigned, 0.35).collect()
    }
    for max_block in (7, 30, 100000):
        got = {
            (r.cluster, r.id_a, r.id_b, r.cosine_e4)
            for r in semdedup_pairs_blocked(assigned, 0.35, max_block).collect()
        }
        assert got == want, max_block
    assert len(want) > 0


def test_semdedup_auto_switches_to_blocked_kernel(embeddings):
    """``semdedup_pairs`` must route clusters larger than ``max_block``
    through the blocked kernel INSIDE the same plan (skew safety at
    scale: one duplicate-heavy cluster can't OOM a task), with the pair
    set identical to the unblocked kernel."""
    assigned, _ = kmeans_fit(embeddings, k=4, iters=2)
    sizes = {
        r.cluster: r.n
        for r in assigned.groupBy("cluster").count().withColumnRenamed("count", "n").collect()
    }
    # pick a max_block that splits the clusters into both regimes so
    # the union-of-kernels path (not just one branch) is exercised
    cut = sorted(sizes.values())[len(sizes) // 2]
    assert any(n > cut for n in sizes.values())
    assert any(n <= cut for n in sizes.values())
    want = {
        (r.cluster, r.id_a, r.id_b, r.cosine_e4)
        for r in semdedup_pairs(assigned, 0.35, max_block=None).collect()
    }
    got_df = semdedup_pairs(assigned, 0.35, max_block=cut)
    got = {(r.cluster, r.id_a, r.id_b, r.cosine_e4) for r in got_df.collect()}
    assert got == want and len(want) > 0
    # both kernels really participate: the plan unions TWO grouped-
    # pandas kernels (unblocked small-cluster side + blocked big side)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") >= 2, plan


def test_auto_k_resolution():
    """auto_k pins: the sf0.01 fixture (N=500) MUST resolve to the
    oracle's k=8 (semdedup_survivors_auto_k shares the unrolled k=8
    CTE oracle at the driver's comparison SF), and k must grow
    linearly with N (the SemDeDup bounded-cluster contract)."""
    from data_integration_pipelines_spark.operators.clustering import (
        SEMDEDUP_TARGET_CLUSTER,
        auto_k,
    )

    assert SEMDEDUP_TARGET_CLUSTER == 64
    assert auto_k(500) == 8  # the driver-gate fixture regime
    assert auto_k(1) == 2 and auto_k(100) == 2  # floor
    assert auto_k(500 * 30) == 235  # 30x probe: k grows with N
    # bounded clusters: N / auto_k(N) <= target for all regimes
    for n in (1, 500, 10_000, 10**9):
        assert n / auto_k(n) <= 64


class TestPivotedAssignment:
    """IVF-style centroid assignment (assign_clusters_pivoted, r7)."""

    def test_exact_when_all_buckets_probed(self, embeddings):
        """nprobe >= n_super (every super-bucket probed) must reproduce
        the flat exact assignment bit-for-bit — the approximation is
        ONLY the probe restriction."""
        from data_integration_pipelines_spark.operators.clustering import (
            assign_clusters_pivoted,
            kmeans_fit_table,
        )

        exact, cent = kmeans_fit_table(embeddings, k=8, iters=2, reseed_empty=False)
        want = {(r.id, r.cluster, r.dist) for r in exact.collect()}
        got = {
            (r.id, r.cluster, r.dist)
            for r in assign_clusters_pivoted(
                embeddings, cent, n_super=4, nprobe=4
            ).collect()
        }
        assert got == want

    def test_exact_when_every_centroid_is_a_super(self, embeddings):
        from data_integration_pipelines_spark.operators.clustering import (
            assign_clusters_pivoted,
            kmeans_fit_table,
        )

        exact, cent = kmeans_fit_table(embeddings, k=8, iters=2, reseed_empty=False)
        want = {(r.id, r.cluster, r.dist) for r in exact.collect()}
        got = {
            (r.id, r.cluster, r.dist)
            for r in assign_clusters_pivoted(
                embeddings, cent, n_super=8, nprobe=1
            ).collect()
        }
        assert got == want

    def test_probe_restriction_properties(self, embeddings):
        """The approximate regime must (a) assign EVERY vector, (b) only
        ever assign a vector to a centroid of a probed bucket, and (c)
        report the exact distance for whatever centroid it picked
        (approximation narrows the candidate set, never corrupts the
        scores)."""
        from data_integration_pipelines_spark.operators.clustering import (
            assign_clusters_pivoted,
            kmeans_fit_table,
        )

        exact, cent = kmeans_fit_table(embeddings, k=8, iters=2, reseed_empty=False)
        approx = assign_clusters_pivoted(embeddings, cent, n_super=2, nprobe=1)
        got = {r.id: (r.cluster, r.dist) for r in approx.collect()}
        want = {r.id: (r.cluster, r.dist) for r in exact.collect()}
        assert set(got) == set(want)  # every vector assigned
        # exact-score property: where the pick agrees, the dist agrees
        agree = [i for i in got if got[i][0] == want[i][0]]
        assert all(got[i][1] == want[i][1] for i in agree)
        # approximate dist is never better than the true minimum
        assert all(got[i][1] >= want[i][1] for i in got)
        # and the restriction bites without destroying quality on the
        # fixture: most vectors still get their true nearest centroid
        assert len(agree) >= int(0.5 * len(got))


class TestSemdedupFrontDoor:
    """The r8 auto-routing front door (VERDICT r7 task 2): below the
    N*k*D cell cap the EXACT flat fit, above it the sample-fit +
    pivoted-probing composition — callers can no longer take the flat
    quadratic assignment to scale by default."""

    def test_flat_route_equals_exact_fit(self, embeddings):
        from data_integration_pipelines_spark.operators.clustering import (
            auto_k,
            semdedup_assign,
        )

        n = embeddings.count()
        assert auto_k(n) == 8  # the oracle-pinned fixture resolution
        got = {
            (r.id, r.cluster)
            for r in semdedup_assign(embeddings, k="auto").collect()
        }
        exact, _ = kmeans_fit(embeddings, k=8, iters=3)
        want = {(r.id, r.cluster) for r in exact.collect()}
        assert got == want

    def test_scale_route_fires_above_cap_and_loses_no_rows(self, embeddings):
        """With the cap forced below the fixture's N*k*D, the front
        door must take the pivoted route (approximate assignment) and
        still emit exactly one row per vector."""
        from data_integration_pipelines_spark.operators.clustering import (
            semdedup_assign,
        )

        n = embeddings.count()
        out = semdedup_assign(embeddings, k="auto", flat_cells=1)
        rows = out.collect()
        assert len(rows) == n
        assert len({r.id for r in rows}) == n

    def test_semdedup_pipeline_accounting_on_both_routes(self, embeddings):
        """n_members sums to N and n_kept + n_removed == n_members on
        the flat AND the pivoted route."""
        from data_integration_pipelines_spark.operators.clustering import (
            semdedup,
        )

        n = embeddings.count()
        for cells in (64_000_000, 1):
            surv = semdedup(embeddings, 0.35, k="auto", flat_cells=cells)
            rows = surv.collect()
            assert sum(r.n_members for r in rows) == n
            assert all(r.n_kept + r.n_removed == r.n_members for r in rows)


def test_pivoted_assignment_survives_duplicate_super_centroids(spark):
    """ADVICE r7: two identical super centroids tie at distance 0 and
    pre-r8 the larger-scid super's bucket ended up EMPTY (even its own
    centroid broke the tie to the smaller scid) — any vector probing
    that bucket was silently dropped. The c2s self-pin guarantees every
    bucket holds >= 1 centroid, so every vector gets exactly one row."""
    from data_integration_pipelines_spark.operators.clustering import (
        assign_clusters_pivoted,
    )

    # centroid table with clusters 0 and 1 IDENTICAL (the degenerate
    # duplicate-super fit) and cluster 2 distinct; D=2
    cent = spark.createDataFrame(
        [
            (0, 0, 10_000_000), (0, 1, 0),
            (1, 0, 10_000_000), (1, 1, 0),
            (2, 0, -10_000_000), (2, 1, 0),
        ],
        "cluster bigint, pos int, cval bigint",
    )
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) / 10, float(i % 3) / 10])
         for i, x in enumerate([9, -9, 8, -8, 7, -7, 5, -5])],
    )
    out = assign_clusters_pivoted(emb, cent, n_super=2, nprobe=1)
    rows = out.collect()
    assert len(rows) == emb.count(), "row loss on duplicate supers"
    assert len({r.id for r in rows}) == emb.count()


def test_semdedup_keep_list_matches_survivor_accounting(embeddings):
    """The keep LIST (semdedup_keep, r8) and the per-cluster funnel
    (semdedup_survivors) are two views of ONE decision: per cluster,
    len(keep ids) == n_kept, and no kept id appears as a removed
    id_b. Also pins the keep-one policy directly: the smallest id of
    every cluster always survives."""
    from data_integration_pipelines_spark.operators.clustering import (
        semdedup_keep,
        semdedup_survivors,
    )

    assigned, _ = kmeans_fit(embeddings, k=8, iters=3)
    kept = semdedup_keep(assigned, 0.35).collect()
    funnel = {r.cluster: r for r in semdedup_survivors(assigned, 0.35).collect()}
    by_cluster: dict[int, list[int]] = {}
    for r in kept:
        by_cluster.setdefault(r.cluster, []).append(r.id)
    assert {c: len(ids) for c, ids in by_cluster.items()} == {
        c: r.n_kept for c, r in funnel.items() if r.n_kept > 0
    }
    mins = {
        r.cluster: r.id
        for r in assigned.groupBy("cluster")
        .agg(F.min("id").alias("id"))
        .collect()
    }
    for c, lo in mins.items():
        assert lo in by_cluster.get(c, []), f"cluster {c} min id removed"


def test_semdedup_decisions_single_kernel_pass(embeddings, monkeypatch):
    """semdedup_decisions (r9) must run the applyInPandas gram kernel
    ONCE for both outputs — keep list and funnel — and those outputs
    must equal the independently computed ones (VERDICT r8 note: the
    separate calls each recomputed semdedup_pairs)."""
    import data_integration_pipelines_spark.operators.clustering as cl

    assigned, _ = kmeans_fit(embeddings, k=8, iters=3)
    want_keep = {
        (r.id, r.cluster) for r in cl.semdedup_keep(assigned, 0.35).collect()
    }
    want_funnel = {
        (r.cluster, r.n_members, r.n_removed, r.n_kept)
        for r in cl.semdedup_survivors(assigned, 0.35).collect()
    }

    calls = {"n": 0}
    real_pairs = cl.semdedup_pairs

    def counting_pairs(*a, **kw):
        calls["n"] += 1
        return real_pairs(*a, **kw)

    monkeypatch.setattr(cl, "semdedup_pairs", counting_pairs)
    keep, funnel = cl.semdedup_decisions(assigned, 0.35)
    assert calls["n"] == 1, "gram kernel built more than once"
    assert {(r.id, r.cluster) for r in keep.collect()} == want_keep
    assert {
        (r.cluster, r.n_members, r.n_removed, r.n_kept)
        for r in funnel.collect()
    } == want_funnel


def test_semdedup_assign_scale_route_survives_structured_ids(spark):
    """ADVICE r8: the scale-route sample filter used pmod(id, step)==0,
    which returns an EMPTY sample when ids are structured (here: all
    odd, step even) — the hash-based filter (xxhash64 first) must
    sample regardless of the id distribution and assign every row."""
    from data_integration_pipelines_spark.operators.clustering import (
        semdedup_assign,
    )

    n = 8192
    emb = spark.range(n).select(
        (F.col("id") * 2 + 1).alias("vec_id"),  # every id odd
        F.array(
            (F.col("id") % 17).cast("float"),
            (F.col("id") % 5).cast("float"),
            ((F.col("id") * 3) % 7).cast("float"),
            F.lit(1.0).cast("float"),
        ).alias("embedding"),
    )
    out = semdedup_assign(emb, k=4, iters=1, flat_cells=1)
    rows = out.select("id").collect()
    assert len(rows) == n
    assert len({r.id for r in rows}) == n
