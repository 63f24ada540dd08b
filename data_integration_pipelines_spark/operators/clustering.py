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

from .cache import bounded_persist

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
    """Python mirror of SQL ROUND(double): half away from zero on the
    double's TRUE value (DuckDB's std::round). Python's round() is
    banker's, and the folk floor(x + 0.5) is subtly wrong at
    representation edges: for x just below m + 0.5, x + 0.5 can round
    UP to exactly m + 1.0 and floor then overshoots by 1. Computing
    the fraction as x - floor(x) is exact for |x| < 2^52, so the
    half-comparison sees the true value."""
    if x >= 0:
        f = math.floor(x)
        return int(f) + (1 if x - f >= 0.5 else 0)
    c = math.ceil(x)
    return int(c) - (1 if c - x >= 0.5 else 0)


def assign_clusters(
    qdf: DataFrame, centroids: list[tuple[int, list[int]]], qvec_col: str = "qvec"
) -> DataFrame:
    """Append (cluster, dist) for the nearest centroid. ``centroids``
    is a cid-ascending list of (cid, components); ties on exact integer
    distance break to the LOWEST cid (``array_position`` returns the
    first index of the min), mirroring the oracle's
    ``ROW_NUMBER() OVER (ORDER BY dist, cid)``.

    The k distances come from ONE ``transform`` lambda over a nested
    array<array<long>> centroid literal — a single compiled loop body
    instead of k unrolled folds, so the generated code (and its JIT
    cost, re-paid every iteration because the literals change) is
    O(k*D) data but O(D) code. The literal itself is built as one SQL
    string (one parser call) — k*D individual ``F.lit`` columns cost
    ~1s of driver round-trips per iteration before any job runs."""
    cents_sql = ",".join(
        "array(" + ",".join(str(int(v)) for v in c) + ")" for _, c in centroids
    )
    cents = F.expr(f"CAST(array({cents_sql}) AS ARRAY<ARRAY<BIGINT>>)")
    cids_sql = ",".join(str(int(cid)) for cid, _ in centroids)
    cids = F.expr(f"CAST(array({cids_sql}) AS ARRAY<BIGINT>)")

    def dist_to(c: Column) -> Column:
        sq = F.zip_with(
            F.col(qvec_col),
            c,
            lambda x, y: (x * F.lit(C_SCALE) - y) * (x * F.lit(C_SCALE) - y),
        )
        return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v)

    with_d = qdf.withColumn("_dists", F.transform(cents, dist_to))
    idx = F.array_position(F.col("_dists"), F.array_min("_dists")).cast("int")
    return with_d.select(
        "*",
        F.element_at(cids, idx).alias("cluster"),
        F.array_min("_dists").alias("dist"),
    ).drop("_dists")


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
    def _cell_guard(dim_: int) -> None:
        if k * dim_ > MAX_CENTROID_CELLS:
            raise ValueError(
                f"k*D = {k * dim_} centroid cells exceeds {MAX_CENTROID_CELLS}; "
                "the per-iteration driver collect must stay trivial — shrink k "
                "or switch the update step to a checkpointed centroid table"
            )

    # the guard must fire BEFORE the k-row seed collect (which pulls
    # exactly the k*D cells it bounds) — and the bound needs the TRUE
    # dim: a modest k with huge-D vectors blows the cap just as surely
    # as a huge k. One 1-row probe job is the price of never collecting
    # an unbounded seed.
    probe = df.select(vec_col).first()
    if probe is None:
        raise ValueError("kmeans_fit on an empty DataFrame")
    _cell_guard(len(probe[0]))

    qdf = bounded_persist(
        df.select(
            F.col(id_col).alias("id"), quantize_vec(F.col(vec_col)).alias("qvec")
        )
    )
    # deterministic init: the k smallest ids, centroid scale = Q*C.
    # ONE bounded job (TakeOrderedAndProject): the global sort scans
    # everything, so it doubles as the cache-materialization pass and
    # dim falls out of the seed rows for free.
    seed_rows = qdf.orderBy("id").limit(k).collect()
    if not seed_rows:
        raise ValueError("kmeans_fit on an empty DataFrame")
    dim = len(seed_rows[0]["qvec"])
    _cell_guard(dim)
    centroids = [
        (int(r["id"]), [int(v) * C_SCALE for v in r["qvec"]]) for r in seed_rows
    ]

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
    # the returned plan still reads qdf — the pooled cache serves the
    # caller's job(s) and is evicted FIFO by later operators
    return assign_clusters(qdf, centroids), centroids


_PAIR_SCHEMA = "cluster bigint, id_a bigint, id_b bigint, cosine_e4 bigint"

#: clusters above this row count route through the blocked kernel
#: (``semdedup_pairs_blocked``) so one skewed/duplicate-heavy cluster
#: can never materialize an unbounded gram matrix in a single task.
DEFAULT_MAX_BLOCK = 4096


def _pairs_unblocked(
    assigned: DataFrame,
    threshold: float,
    qvec_col: str = "qvec",
) -> DataFrame:
    """One applyInPandas group per cluster, one gram matrix per group —
    the fast path for clusters that fit the per-task memory budget."""
    import numpy as np
    import pandas as pd

    def pairs_of(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.array(pdf[qvec_col].tolist(), dtype=np.float64)[order]
        gram = X @ X.T  # exact: integer-valued entries < 2^53
        nrm = np.sqrt((X * X).sum(axis=1))
        cos = gram / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(len(ids), k=1)
        vals = cos[iu, ju]
        m = vals >= threshold
        from ..functions.quantize import np_e4

        return pd.DataFrame(
            {
                "cluster": np.full(int(m.sum()), int(pdf["cluster"].iloc[0])),
                "id_a": ids[iu[m]],
                "id_b": ids[ju[m]],
                "cosine_e4": np_e4(vals[m]),
            }
        )

    return (
        assigned.select("cluster", "id", qvec_col)
        .groupBy("cluster")
        .applyInPandas(pairs_of, _PAIR_SCHEMA)
    )


def semdedup_pairs(
    assigned: DataFrame,
    threshold: float,
    qvec_col: str = "qvec",
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Within-cluster cosine near-duplicate pairs over the quantized
    vectors: ONE shuffle groups each cluster onto an executor, then a
    vectorized numpy gram matrix scores all intra-cluster pairs (the
    SemDeDup paper's kernel — candidates are ~N*cluster_size, never
    N^2; at 100 TB k grows with N so each group stays matmul-sized).

    Engine-exact despite numpy: quantized components are integers, so
    every product (<= 4e7) and every partial sum (<= 3e9) is an
    integer far below 2^53 — dgemm order and FMA cannot perturb an
    exact integer result. Norms are one IEEE sqrt each, the cosine one
    multiply + one divide — bit-identical to the SQL engines, so the
    threshold compare cannot flip. Returns (cluster, id_a, id_b,
    cosine_e4) — the cosine as basis-point BIGINT (hash-proof output
    contract, functions/quantize.py).

    Skew safety is automatic: clusters larger than ``max_block`` rows
    are routed through :func:`semdedup_pairs_blocked` (identical pairs
    by construction, per-task memory hard-bounded at max_block^2 gram
    cells) inside the SAME plan — a one-small-agg broadcast join tags
    each row with its cluster size, the two row sets take their
    kernels, and the union is the result. A duplicate-heavy corpus
    that concentrates 10^6 vectors in one cluster therefore cannot OOM
    an executor; ``max_block=None`` disables the split (plain kernel
    for every cluster).

    A JVM-only formulation (zip_with/aggregate folds per pair) gives
    the same bits but ~3x the time at fixture scale: higher-order
    array functions are interpreted per pair, while this kernel is one
    BLAS call per cluster."""
    if max_block is None:
        return _pairs_unblocked(assigned, threshold, qvec_col)
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("__csz"))
    # k rows — always broadcast-sized, never a data-scaled shuffle
    tagged = assigned.join(F.broadcast(sizes), "cluster")
    small = tagged.filter(F.col("__csz") <= max_block).drop("__csz")
    big = tagged.filter(F.col("__csz") > max_block).drop("__csz")
    return _pairs_unblocked(small, threshold, qvec_col).unionByName(
        semdedup_pairs_blocked(big, threshold, max_block, qvec_col)
    )


def semdedup_pairs_blocked(
    assigned: DataFrame,
    threshold: float,
    max_block: int,
    qvec_col: str = "qvec",
) -> DataFrame:
    """EXACTLY ``semdedup_pairs``, with per-task memory bounded for
    skewed clusters: a duplicate-heavy corpus can concentrate far more
    than N/k vectors in one cluster, and the single-group gram matrix
    is O(cluster^2) memory. Here each cluster's rows split into RANK
    blocks (row_number over id, divided by ``max_block``) and every
    BLOCK PAIR (i <= j) becomes its own applyInPandas group scoring
    only i x j. Rank blocks hold exactly <= max_block rows BY
    CONSTRUCTION — a hard per-task memory bound of max_block^2 gram
    cells, where a hash-modulo split would only bound the expectation
    (a tail-heavy hash block could still OOM an executor sized to the
    cap). All-pairs coverage is exact (pair (a, b) appears in exactly
    the group of its two blocks), so the output — and the oracle — are
    identical to the unblocked kernel; compute stays inherently
    quadratic in cluster size (that is SemDeDup's semantics), only
    MEMORY is capped. Replication factor per row = its cluster's block
    count (ceil(n/max_block))."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.window import Window

    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("__n"))
    nb = F.greatest(F.ceil(F.col("__n") / max_block), F.lit(1)).cast("int")
    rows = assigned.select("cluster", "id", qvec_col).join(
        sizes.select("cluster", nb.alias("__nb")), "cluster"
    )
    rank = F.row_number().over(Window.partitionBy("cluster").orderBy("id")) - 1
    blk = F.floor(rank / max_block).cast("int")
    block_pairs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.col("__nb") - 1),
            lambda x: F.struct(
                F.least(F.col("__blk"), x).alias("i"),
                F.greatest(F.col("__blk"), x).alias("j"),
            ),
        )
    )
    rep = (
        rows.withColumn("__blk", blk)
        .withColumn("__bp", F.explode(block_pairs))
        .select(
            "cluster",
            F.col("__bp.i").alias("bi"),
            F.col("__bp.j").alias("bj"),
            "__blk",
            "id",
            qvec_col,
        )
    )

    def block_kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from ..functions.quantize import np_e4

        cluster = int(pdf["cluster"].iloc[0])
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])

        def side(mask):
            part = pdf[mask]
            ids = part["id"].to_numpy()
            order = np.argsort(ids)
            X = np.array(part[qvec_col].tolist(), dtype=np.float64)
            if len(ids) == 0:
                X = X.reshape(0, 0)
            return ids[order], X[order] if len(ids) else X

        if bi == bj:
            ids, X = side(pdf["__blk"] == bi)
            if len(ids) < 2:
                return pd.DataFrame(
                    {"cluster": [], "id_a": [], "id_b": [], "cosine_e4": []}
                ).astype(
                    {
                        "cluster": "int64",
                        "id_a": "int64",
                        "id_b": "int64",
                        "cosine_e4": "int64",
                    }
                )
            gram = X @ X.T
            nrm = np.sqrt((X * X).sum(axis=1))
            cos = gram / np.outer(nrm, nrm)
            iu, ju = np.triu_indices(len(ids), k=1)
            pair_vals = cos[iu, ju]
            m = pair_vals >= threshold
            vals = pair_vals[m]
            ia, ib = ids[iu[m]], ids[ju[m]]
        else:
            ids_a, A = side(pdf["__blk"] == bi)
            ids_b, B = side(pdf["__blk"] == bj)
            if len(ids_a) == 0 or len(ids_b) == 0:
                return pd.DataFrame(
                    {"cluster": [], "id_a": [], "id_b": [], "cosine_e4": []}
                ).astype(
                    {
                        "cluster": "int64",
                        "id_a": "int64",
                        "id_b": "int64",
                        "cosine_e4": "int64",
                    }
                )
            gram = A @ B.T
            cos = gram / np.outer(
                np.sqrt((A * A).sum(axis=1)), np.sqrt((B * B).sum(axis=1))
            )
            ii, jj = np.nonzero(cos >= threshold)
            vals = cos[ii, jj]
            # orient every cross pair as (smaller id, larger id)
            la, lb = ids_a[ii], ids_b[jj]
            ia, ib = np.minimum(la, lb), np.maximum(la, lb)
        return pd.DataFrame(
            {
                "cluster": np.full(len(ia), cluster),
                "id_a": ia,
                "id_b": ib,
                "cosine_e4": np_e4(vals),
            }
        )

    return rep.groupBy("cluster", "bi", "bj").applyInPandas(
        block_kernel, _PAIR_SCHEMA
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
            # count() skips nulls — exactly the oracle's COUNT(r.id)
            F.count("rm").alias("n_removed"),
        )
        .withColumn("n_kept", F.col("n_members") - F.col("n_removed"))
    )
