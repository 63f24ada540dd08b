"""Distributed k-means (Lloyd's) and SemDeDup-style cluster-then-dedup
over the ``embeddings`` table — the clustering layer of a training-data
curation pipeline (semantic dedup, corpus bucketing for inspection /
stratified sampling, IVF-style coarse quantizers).

Spark-first shape (the textbook distributed Lloyd's):

- **Assignment is a map-only stage**: the k centroids (k x D numbers)
  are collected to the driver and inlined as literal arrays, so each
  iteration's argmin is a pure whole-stage-codegen expression tree
  (``zip_with`` + ``aggregate`` folds) — no join, no shuffle, no
  Python. At 1000 executors this scales embarrassingly: every task
  scores its rows against the same tiny centroid table.
- **The update step is ONE partial-aggregated shuffle per iteration**
  (``posexplode`` -> groupBy (cluster, pos) -> SUM/COUNT), producing
  exactly ``k*D`` rows — the only thing that ever returns to the
  driver. That is the bounded-collect contract (same as PQ training's
  sample, similarity.py): guarded loudly, never corpus-sized.

Engine-exact arithmetic (the property every oracle in this repo is
built on): components are quantized to integers at load
(``round(val * 10000)``), so distances are EXACT integer sums —
order-independent, overflow-checked — and centroid updates divide two
exact integers in double precision (one correctly-rounded IEEE op,
identical in Spark, DuckDB and Python). No floating-point summation
order anywhere; the fixture's assignment boundaries cannot flip
between engines.

SemDeDup (Abbas et al. 2023: cluster the corpus, then near-dedup
*within* clusters) composes on top: the final assignment keys an
equi-self-join per cluster, so candidate pairs are ~N*avg_cluster_size
instead of N^2; at 100 TB you grow k with N to hold cluster sizes
bounded (k ~ N/5000), exactly how the paper runs on LAION-scale data.

Reference parity: the reference has no clustering (its pipelines stop
at per-row validation; cf. SURVEY §2.9) — this extends the curation
surface the way dedup.py extends its exact-match checks.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scale for quantizing embedding components to integers
Q_SCALE = 10_000
#: extra fixed-point scale for centroid components (centroids carry
#: two more decimal digits than the quantized inputs)
C_SCALE = 100

#: loud ceiling on the k*D numbers collected per iteration — the
#: update collect must stay driver-trivial at any corpus size
MAX_CENTROID_CELLS = 1_000_000


def quantize_vec(vec_col: Column, scale: int = Q_SCALE) -> Column:
    """array<float> -> array<long> with components ``round(x * scale)``
    (half-away-from-zero, matching DuckDB/Spark ROUND). All downstream
    distance math is exact integer arithmetic on this array."""
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") * scale, 0).cast("long")
    )


def _round_half_away(x: float) -> int:
    """Python mirror of SQL ROUND(double): half away from zero
    (Python's round() is banker's and would drift from both engines)."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _dist_expr(qcol: Column, centroid: list[int]) -> Column:
    """Exact squared L2 between a quantized vector (scale Q) and a
    centroid literal (scale Q*C): fold of (qv*C - cq)^2 as longs.
    Stays inside whole-stage codegen — no UDF, no join."""
    cq = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    sq = F.zip_with(
        qcol, cq, lambda x, y: (x * F.lit(C_SCALE) - y) * (x * F.lit(C_SCALE) - y)
    )
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v)


def assign_clusters(
    qdf: DataFrame, centroids: list[tuple[int, list[int]]], qvec_col: str = "qvec"
) -> DataFrame:
    """Append (cluster, dist) for the nearest centroid. ``centroids``
    is a cid-ascending list of (cid, components); ties on exact integer
    distance break to the LOWEST cid (``array_position`` returns the
    first index of the min), mirroring the oracle's
    ``ROW_NUMBER() OVER (ORDER BY dist, cid)``."""
    dists = F.array(*[_dist_expr(F.col(qvec_col), c) for _, c in centroids])
    cids = F.array(*[F.lit(int(cid)).cast("long") for cid, _ in centroids])
    idx = F.array_position(dists, F.array_min(dists))
    return qdf.withColumn("cluster", F.element_at(cids, idx.cast("int"))).withColumn(
        "dist", F.array_min(dists)
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Fixed-iteration distributed Lloyd's with deterministic init:
    centroid ``c`` starts at the vector whose id is the c-th smallest
    (no RNG — reproducible across runs, engines and partitionings; the
    same convention as ``fixture_codebooks``). Returns the FINAL
    assignment DataFrame (id, qvec, cluster, dist) and the centroid
    list that produced it.

    A cluster that loses all members simply drops out (inner-join
    update semantics — well-defined and identically expressible in
    SQL); with data-point init and small k this does not occur on the
    fixtures, and at scale empty clusters are a signal k is too large.
    """
    dim = len(df.select(vec_col).first()[0])
    if k * dim > MAX_CENTROID_CELLS:
        raise ValueError(
            f"k*D = {k * dim} centroid cells exceeds {MAX_CENTROID_CELLS}; "
            "the per-iteration driver collect must stay trivial — shrink k "
            "or switch the update step to a checkpointed centroid table"
        )
    qdf = df.select(
        F.col(id_col).alias("id"), quantize_vec(F.col(vec_col)).alias("qvec")
    )
    # deterministic init: the k smallest ids, centroid scale = Q*C
    seed_rows = qdf.orderBy("id").limit(k).collect()
    centroids = [
        (int(r["id"]), [int(v) * C_SCALE for v in r["qvec"]]) for r in seed_rows
    ]

    qdf = qdf.persist()
    try:
        for _ in range(iters):
            assigned = assign_clusters(qdf, centroids)
            # ONE shuffle: partial-agg'd SUM/COUNT per (cluster, pos);
            # k*D rows back to the driver (bounded by the guard above)
            sums = (
                assigned.select("cluster", F.posexplode("qvec").alias("pos", "qv"))
                .groupBy("cluster", "pos")
                .agg(F.sum("qv").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            by_cid: dict[int, list[int]] = {}
            for r in sums:
                comp = by_cid.setdefault(int(r["cluster"]), [0] * dim)
                # exact ints in, one IEEE division, half-away round —
                # bit-identical to the oracle's CAST(ROUND(...) AS BIGINT)
                comp[int(r["pos"])] = _round_half_away(
                    float(r["s"]) * C_SCALE / int(r["n"])
                )
            centroids = sorted(by_cid.items())
        return assign_clusters(qdf, centroids), centroids
    finally:
        qdf.unpersist()


def semdedup_pairs(
    assigned: DataFrame,
    threshold: float,
    qvec_col: str = "qvec",
) -> DataFrame:
    """Within-cluster cosine near-duplicate pairs over the quantized
    vectors: equi-self-join on the cluster id (candidates are
    ~N*cluster_size, never N^2), exact integer dot product, norms via
    one correctly-rounded sqrt each — the cosine is bit-identical
    across engines, so the threshold compare cannot flip. Returns
    (cluster, id_a, id_b, cosine-rounded-4)."""
    dot_q = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(qvec_col), lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double")
    )
    sides = assigned.select("cluster", "id", F.col(qvec_col).alias("v"), norm.alias("nrm"))
    a = sides.select(
        "cluster",
        F.col("id").alias("id_a"),
        F.col("v").alias("qa"),
        F.col("nrm").alias("na"),
    )
    b = sides.select(
        "cluster",
        F.col("id").alias("id_b"),
        F.col("v").alias("qb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_raw", dot_q.cast("double") / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine_raw") >= F.lit(threshold))
        .select(
            "cluster", "id_a", "id_b", F.round("cosine_raw", 4).alias("cosine")
        )
    )


def semdedup_survivors(assigned: DataFrame, threshold: float) -> DataFrame:
    """SemDeDup keep-one policy: within each cluster, a vector is
    REMOVED iff some smaller-id vector in the same cluster clears the
    similarity threshold with it (the deterministic analogue of the
    paper's keep-one-per-duplicate-group). Returns per-cluster
    (cluster, n_members, n_removed, n_kept)."""
    removed = semdedup_pairs(assigned, threshold).select(
        "cluster", F.col("id_b").alias("id")
    ).distinct()
    flagged = assigned.select("cluster", "id").join(
        removed.withColumn("rm", F.lit(1)), ["cluster", "id"], "left"
    )
    return (
        flagged.groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(F.when(F.col("rm").isNotNull(), 1).otherwise(0)).alias("n_removed"),
        )
        .withColumn("n_kept", F.col("n_members") - F.col("n_removed"))
    )
