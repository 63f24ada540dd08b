"""Similarity search over embedding columns (array<float>).

Two implementations with identical semantics:

1. **Relational formulation** (`brute_force_topk`): posexplode both
   sides to (id, pos, val) and join on pos — fully declarative, oracle-
   checkable, and Catalyst-optimized. Good for correctness and small
   query sets.
2. **Vectorized scale path** (`topk_pandas`): Arrow-batched
   ``mapInPandas`` doing a numpy matrix multiply per batch against a
   broadcast query matrix. This is the 100 TB path: the corpus streams
   through executors (one matmul per Arrow batch, no shuffle), only
   per-partition top-k rows (k * n_queries per partition) return to be
   reduced globally. IVF (`ivf_topk`) cuts the scanned fraction by
   restricting the search to the query's coarse-quantizer bucket.

Embeddings in the fixture are unit-normalized, so cosine == dot.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.quantize import e4, np_e6, quantized
from .cache import bounded_persist

# topk_pandas collects the query set to the driver (the bounded-Q
# scale contract: queries are a probe set, the CORPUS is the big
# side). Guarded so a caller passing a corpus as query_df fails loudly
# instead of OOMing the driver.
MAX_COLLECTED_QUERIES = 100_000

# shared output shape of every top-k variant (and of the empty result
# the collected-query paths short-circuit to when the query set is empty)
_TOPK_SCHEMA = "query_id long, neighbor_id long, cosine_e4 long, rank int"


def explode_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, pos, val double) long form of an embedding column."""
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(vec_col).alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))


def dot_products(queries_long: DataFrame, corpus_long: DataFrame) -> DataFrame:
    """(query_id, corpus_id, dot) for every query x corpus pair via a
    position join + sum — map-side combine keeps the shuffle small."""
    q = queries_long.select(
        F.col("id").alias("query_id"), "pos", F.col("val").alias("qval")
    )
    c = corpus_long.select(
        F.col("id").alias("corpus_id"), "pos", F.col("val").alias("cval")
    )
    return (
        q.join(c, "pos")
        .groupBy("query_id", "corpus_id")
        .agg(F.sum(F.col("qval") * F.col("cval")).alias("dot"))
    )


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors (excluding self) per query vector.
    Returns (query_id, neighbor_id, cosine, rank)."""
    dots = dot_products(
        explode_vectors(query_df, id_col, vec_col),
        explode_vectors(df, id_col, vec_col),
    ).filter(F.col("query_id") != F.col("corpus_id")).withColumn(
        "cos_e4", e4(F.col("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_e4"), F.asc("corpus_id"))
    return (
        dots.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("corpus_id").alias("neighbor_id"),
            F.col("cos_e4").alias("cosine_e4"),
            "rank",
        )
    )


def topk_pandas(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    max_queries: int = MAX_COLLECTED_QUERIES,
) -> DataFrame:
    """Vectorized top-k: numpy matmul per Arrow batch against the
    (small, collected) query matrix; per-partition top-k then a global
    window reduce. Semantics identical to ``brute_force_topk``: the
    per-batch selection uses the SAME total order as the global reduce
    (4-decimal-rounded dot desc, corpus_id asc), so a candidate tied at
    the rounded value at a batch's k-boundary is kept or dropped exactly
    as the global tiebreak would decide.

    The query set is collected to the driver (bounded-Q contract);
    ``max_queries`` fails loudly before the collect when violated —
    use ``brute_force_topk`` / ``ivf_topk`` for corpus-vs-corpus."""
    import numpy as np

    n_queries = query_df.count()
    if n_queries > max_queries:
        raise ValueError(
            f"topk_pandas collects the query set to the driver: got "
            f"{n_queries} queries > max_queries={max_queries}; use "
            f"brute_force_topk/ivf_topk for large query sets"
        )
    queries = query_df.select(id_col, vec_col).collect()
    if not queries:
        # np.array of zero rows is shape (0,), not (0, D) — the
        # executor-side matmul would die with an opaque dim mismatch;
        # an empty query set just means an empty result
        return df.sparkSession.createDataFrame([], _TOPK_SCHEMA)
    q_ids = np.array([r[0] for r in queries])
    q_mat = np.array([r[1] for r in queries], dtype=np.float64)  # (Q, D)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy()
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)  # (B, D)
            sims = q_mat @ c_mat.T  # (Q, B)
            out = []
            for qi, qid in enumerate(q_ids):
                row = sims[qi]
                mask = c_ids != qid
                ids, vals = c_ids[mask], row[mask]
                take = min(k, len(ids))
                if take == 0:
                    continue
                # Global-order-consistent selection: sort by rounded
                # dot desc then id asc (np.lexsort: last key primary),
                # matching the window's (cos_r desc, corpus_id asc).
                # Round HALF_UP (away from zero) like Spark's F.round —
                # np.round is half-to-even, which could rank a value
                # landing exactly on a .xxxx5 boundary differently at a
                # batch's k-boundary than the global tiebreak would.
                vals_r = np.sign(vals) * np.floor(np.abs(vals) * 1e4 + 0.5) / 1e4
                order = np.lexsort((ids, -vals_r))[:take]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "corpus_id": ids[order], "dot": vals[order]}
                    )
                )
            if out:
                yield pd.concat(out)

    partial = df.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, corpus_id long, dot double"
    ).withColumn("cos_e4", e4(F.col("dot")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_e4"), F.asc("corpus_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("corpus_id").alias("neighbor_id"),
            F.col("cos_e4").alias("cosine_e4"),
            "rank",
        )
    )


def assign_buckets(
    df: DataFrame,
    pivots: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its ``nprobe``
    nearest pivots (max dot; ties -> lowest pivot id). Returns
    (id, bucket), one row per (vector, probed bucket)."""
    dots = dot_products(
        explode_vectors(df, id_col, vec_col).withColumnRenamed("id", "id"),
        explode_vectors(pivots, id_col, vec_col),
    ).withColumnRenamed("query_id", "id").withColumnRenamed("corpus_id", "pivot_id")
    # quantize to integer 1e-6 units before argmax: the identical IEEE
    # expression on both engines (functions/quantize.py), ties -> pivot id
    w = Window.partitionBy("id").orderBy(
        F.desc(quantized(F.col("dot"), 6)), F.asc("pivot_id")
    )
    return (
        dots.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("id", F.col("pivot_id").alias("bucket"))
    )


def _zip_dot(a, b):
    """JVM-side dot product of two float arrays (no explode, no join)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _score_rank_candidates(
    cand: DataFrame, qvec: str, cvec: str, k: int
) -> DataFrame:
    """Shared IVF scoring tail: rounded zip_with dot per candidate,
    distinct (multi-probe can reach a vector via two buckets), global
    (desc cosine, asc corpus_id) rank, top-k. ivf_topk and
    ivf_index_query MUST stay bit-identical — one implementation."""
    scored = cand.select(
        "query_id",
        "corpus_id",
        e4(_zip_dot(F.col(qvec), F.col(cvec))).alias("cosine_e4"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_e4"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("corpus_id").alias("neighbor_id"), "cosine_e4", "rank")
    )


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    pivots: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 1,
    broadcast_queries: bool = True,
) -> DataFrame:
    """ANN: search only the query's ``nprobe`` nearest coarse buckets.
    Returns (query_id, neighbor_id, cosine, rank).

    The candidate join is keyed ON THE BUCKET — the corpus never meets
    queries outside their probed cells, so scanned pairs shrink by
    ~n_pivots/nprobe vs brute force (this is what makes IVF the scale
    path, not just a post-filter). Dots are computed with
    ``zip_with``/``aggregate`` on the carried arrays: one codegen'd
    expression per candidate, no position explode, no per-pair
    aggregation shuffle. Multi-probe (nprobe > 1) buys recall for a
    proportional candidate increase (same trade as IVF nprobe in Faiss
    or multi-probe LSH, Lv et al. VLDB'07).

    ``broadcast_queries``: True (default — serving-sized query sets)
    hints the query side broadcast so the corpus never shuffles for the
    candidate join; False (batch-inference-sized query sets, see
    :func:`topk_join`) leaves both sides unhinted — the candidate join
    becomes a plain bucket-keyed shuffle hash join and AQE sides it,
    so a query set far beyond broadcast limits still never collects or
    OOMs an executor. Results are identical either way (hints are
    physical)."""
    maybe_b = F.broadcast if broadcast_queries else (lambda d: d)
    cb = assign_buckets(df, pivots, id_col, vec_col).select(
        F.col("id").alias("corpus_id"), "bucket"
    )
    qb = assign_buckets(query_df, pivots, id_col, vec_col, nprobe=nprobe).select(
        F.col("id").alias("query_id"), "bucket"
    )
    corpus = df.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("__cvec")
    ).join(cb, "corpus_id")
    queries = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    ).join(maybe_b(qb), "query_id")
    cand = corpus.join(maybe_b(queries), "bucket").filter(
        F.col("query_id") != F.col("corpus_id")
    )
    return _score_rank_candidates(cand, "__qvec", "__cvec", k)


def topk_join(
    df: DataFrame,
    query_df: DataFrame,
    pivots: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """Bulk ANN for batch-inference-sized query sets — the collect-free
    twin of the serving paths (``topk_pandas``/``pq_topk``/
    ``ivf_pq_topk`` collect the query set under the bounded-Q
    contract; this path has NO such bound because nothing query-sized
    ever reaches the driver). The query set stays a DataFrame
    end-to-end: queries and corpus meet through the IVF bucket key
    (``ivf_topk``'s join shape) as an unhinted shuffle hash join, so a
    10^8-row query table is just another fact side. Use this to
    nearest-neighbor a whole corpus against a whole corpus (kNN graph
    construction, full-dataset retrieval augmentation); use the
    collect paths for online serving batches.

    Identical results to ``ivf_topk`` with the same (pivots, nprobe) —
    pinned by test and by the shared oracle row; with
    nprobe = n_pivots it degrades to exact brute force (every cell
    probed). For exact bulk scoring without a pivot table, use
    ``brute_force_topk`` (position-join formulation — also
    collect-free)."""
    return ivf_topk(
        df, query_df, pivots, id_col, vec_col, k, nprobe,
        broadcast_queries=False,
    )


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subvectors: int = 8,
    k_centroids: int = 16,
    seed: int = 7,
    sample_limit: int = 65_536,
    iters: int = 15,
):
    """Train product-quantization codebooks: split the D-dim space into
    ``m_subvectors`` contiguous subspaces and k-means each on a BOUNDED
    sample (the FAISS convention — codebooks need ~k*100 examples, not
    the corpus; a corpus-sized fit would be thousands of tiny jobs for
    no recall gain). Deterministic: seeded kmeans++ init + Lloyd's on
    the driver over at most ``sample_limit`` vectors. Returns a numpy
    array (m, k, D/m) of centroids — tiny, broadcast by closure.

    PQ is the billion-vector scale path: vectors compress to m bytes
    (k<=256) instead of 4D, so the scan that scores candidates reads
    ~D*4/m x less data; recall is recovered by exact re-ranking of the
    ADC top-C (``pq_topk``).

    Bounded-collect contract with auto-switch (the ``kmeans_fit``
    convention): when the sample this path would collect exceeds
    ``MAX_CENTROID_CELLS`` numbers (``sample_limit * dim``, or
    ``sample_limit=None`` = train on the full corpus), training routes
    through :func:`pq_train_distributed` — per-subspace distributed
    Lloyd's over ``clustering.kmeans_fit``/``kmeans_fit_table`` — and
    only the finished m*k*(D/m) codebook ever reaches the driver."""
    import numpy as np

    from .clustering import MAX_CENTROID_CELLS

    # regime probe BEFORE the sample collect (kmeans_fit convention):
    # a big sample_limit — or None, meaning the whole corpus — must
    # never reach the driver
    probe = df.select(vec_col).first()
    if probe is None:
        raise ValueError("pq_train on an empty DataFrame")
    dim = len(probe[0])
    if sample_limit is None or sample_limit * dim > MAX_CENTROID_CELLS:
        return pq_train_distributed(
            df,
            id_col,
            vec_col,
            m_subvectors=m_subvectors,
            k_centroids=k_centroids,
            iters=iters,
            sample_limit=sample_limit,
        )

    # Deterministic sample: Spark's bare limit() takes whatever rows
    # arrive first (scan/partition order), but kmeans++ seeding indexes
    # into the sample by position — sort by id so the trained codebooks
    # are identical across runs/layouts. The sort is bounded by
    # sample_limit via the limit pushdown (TakeOrderedAndProject).
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(sample_limit).collect()
    X_all = np.array([r[1] for r in rows], dtype=np.float64)
    dim = X_all.shape[1]
    if dim % m_subvectors != 0:
        raise ValueError(f"dim {dim} not divisible by m={m_subvectors}")
    sub = dim // m_subvectors
    rng = np.random.RandomState(seed)

    def kmeans(X: "np.ndarray") -> "np.ndarray":
        # kmeans++ seeding
        centers = [X[rng.randint(len(X))]]
        for _ in range(k_centroids - 1):
            d2 = np.min(
                ((X[:, None, :] - np.array(centers)[None, :, :]) ** 2).sum(-1), axis=1
            )
            probs = d2 / d2.sum() if d2.sum() > 0 else None
            centers.append(X[rng.choice(len(X), p=probs)])
        C = np.array(centers)
        for _ in range(iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(k_centroids):
                pts = X[assign == j]
                C[j] = pts.mean(0) if len(pts) else X[rng.randint(len(X))]
        return C

    return np.stack(
        [kmeans(X_all[:, j * sub : (j + 1) * sub]) for j in range(m_subvectors)]
    )


def pq_train_distributed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subvectors: int = 8,
    k_centroids: int = 16,
    iters: int = 15,
    sample_limit: int | None = None,
    checkpoint_dir: str | None = None,
    use_table: bool | None = None,
):
    """Distributed PQ codebook training — the large-sample / large-m*k
    regime :func:`pq_train`'s driver collect refuses. Each subspace j
    is a ``slice(vec)`` projection fed to the repo's certified
    distributed Lloyd's (``clustering.kmeans_fit``): deterministic
    data-point seeding (centroid c = subvector of the c-th smallest
    id — the ``fixture_codebooks`` convention), exact integer distance
    on Q_SCALE-quantized components, identical per-iteration arithmetic
    whichever backend runs it. Nothing sample-sized reaches the driver;
    only the finished k x D/m centroid block per subspace (k*D cells
    total — the codebook itself, which must exist driver-side to
    broadcast into ``pq_encode``) is collected.

    ``use_table``: None = let ``kmeans_fit`` auto-switch on the
    k*D cell cap (the default); True = force the checkpointed
    centroid-TABLE backend (``kmeans_fit_table``); False = force the
    driver-loop backend. Both backends share a pinned fixed point, so
    the trained codebooks are identical either way (tested).

    Codebook values are the quantized-integer centroids mapped back to
    floats (``cval / (C_SCALE * Q_SCALE)``) — bit-identical across
    backends because the integers are.

    vs ``pq_train``'s kmeans++ sample path: seeding is data-point
    deterministic rather than D^2-weighted, which costs a little
    codebook quality at equal k but removes every RNG and every
    sample-sized collect; the exact re-rank in ``pq_topk`` recovers
    ranking quality (recall pinned by test)."""
    import numpy as np

    from .clustering import C_SCALE, Q_SCALE, kmeans_fit, kmeans_fit_table

    probe = df.select(vec_col).first()
    if probe is None:
        raise ValueError("pq_train_distributed on an empty DataFrame")
    dim = len(probe[0])
    if dim % m_subvectors != 0:
        raise ValueError(f"dim {dim} not divisible by m={m_subvectors}")
    sub = dim // m_subvectors

    src = df.select(F.col(id_col).alias("__pid"), F.col(vec_col).alias("__pvec"))
    if sample_limit is not None:
        # deterministic sample as a DATAFRAME (no collect): global
        # top-k by id via TakeOrderedAndProject, same rows the driver
        # path would train on
        src = src.orderBy("__pid").limit(sample_limit)

    denom = float(C_SCALE * Q_SCALE)
    books = []
    for j in range(m_subvectors):
        sub_df = src.select(
            "__pid", F.slice("__pvec", j * sub + 1, sub).alias("__pvec")
        )
        if use_table is True:
            _, cent = kmeans_fit_table(
                sub_df, "__pid", "__pvec", k_centroids, iters,
                checkpoint_dir=checkpoint_dir, reseed_empty=False,
            )
            cent_rows = [
                (int(r["cluster"]), int(r["pos"]), int(r["cval"]))
                for r in cent.collect()
            ]
        else:
            _, cents = kmeans_fit(
                sub_df, "__pid", "__pvec", k_centroids, iters,
                checkpoint_dir=checkpoint_dir,
            )
            if isinstance(cents, DataFrame):  # auto-switched to table
                cent_rows = [
                    (int(r["cluster"]), int(r["pos"]), int(r["cval"]))
                    for r in cents.collect()
                ]
            else:
                cent_rows = [
                    (int(cid), p, int(v))
                    for cid, comps in cents
                    for p, v in enumerate(comps)
                ]
        cids = sorted({c for c, _, _ in cent_rows})
        if len(cids) != k_centroids:
            raise ValueError(
                f"subspace {j}: {len(cids)} surviving centroids != "
                f"k={k_centroids} (empty-cluster drop-out); lower k or "
                "train via kmeans_fit_table(reseed_empty=True)"
            )
        block = np.zeros((k_centroids, sub), dtype=np.float64)
        cidx = {c: i for i, c in enumerate(cids)}
        for c, p, v in cent_rows:
            block[cidx[c], p] = v / denom
        books.append(block)
    return np.stack(books)


def fixture_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subvectors: int = 8,
    k_centroids: int = 16,
):
    """Deterministic, cross-engine-reproducible PQ codebooks: centroid
    ``c`` of subspace ``j`` is the j-th subvector of the vector with
    ``id == c`` (the first ``k_centroids`` vectors by id). No training
    randomness and trivially re-derivable in SQL, so a PQ pipeline
    built on these codebooks can be differentially verified against a
    relational oracle. Quality is below k-means codebooks — use
    ``pq_train`` in production and these for verification harnesses
    (the exact re-rank in ``pq_topk`` recovers ranking quality either
    way)."""
    import numpy as np

    rows = (
        df.select(id_col, vec_col)
        .filter(F.col(id_col) < k_centroids)
        .orderBy(id_col)
        .collect()
    )
    if len(rows) != k_centroids:
        raise ValueError(
            f"fixture_codebooks needs ids 0..{k_centroids - 1} present; got {len(rows)}"
        )
    X = np.array([r[1] for r in rows], dtype=np.float64)  # (k, D)
    dim = X.shape[1]
    if dim % m_subvectors != 0:
        raise ValueError(f"dim {dim} not divisible by m={m_subvectors}")
    sub = dim // m_subvectors
    return np.stack([X[:, j * sub : (j + 1) * sub] for j in range(m_subvectors)])


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_dist: bool = False,
) -> DataFrame:
    """(id, codes array<int>) — each vector quantized to its nearest
    centroid per subspace. Arrow-batched numpy argmin per batch; the
    codebooks ride to executors as a closure broadcast (m*k*sub floats).

    ``exact_dist=True`` computes squared distances directly as
    sum((x-c)^2) quantized to integer 1e-6 units before the argmin (ties -> lowest
    centroid id). That is bit-stable against a SQL oracle computing the
    same sum; the default expanded form (|x|^2 - 2x.c + |c|^2, one
    matmul per subspace) is faster at scale but can differ by an ulp
    near argmin boundaries."""
    import numpy as np

    m, k, sub = codebooks.shape
    cb = codebooks.astype(np.float64)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = np.array(list(pdf[vec_col]), dtype=np.float64)  # (B, D)
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for j in range(m):
                block = vecs[:, j * sub : (j + 1) * sub]  # (B, sub)
                if exact_dist:
                    # (B, k, sub) -> (B, k); argmin takes the FIRST
                    # minimum = lowest centroid id on rounded ties
                    d2 = ((block[:, None, :] - cb[j][None, :, :]) ** 2).sum(-1)
                    d2 = np_e6(d2)
                else:
                    # squared L2 to each centroid: (B, k)
                    d2 = (
                        (block**2).sum(1, keepdims=True)
                        - 2 * block @ cb[j].T
                        + (cb[j] ** 2).sum(1)
                    )
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame({"id": pdf[id_col], "codes": list(codes)})

    from .dedup import spread

    return spread(df.select(id_col, vec_col)).mapInPandas(
        encode, schema="id long, codes array<int>"
    )


def pq_topk(
    df: DataFrame,
    query_df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    rerank: int = 50,
    exact_dist: bool = False,
    max_queries: int = MAX_COLLECTED_QUERIES,
) -> DataFrame:
    """PQ ANN with exact re-rank: asymmetric-distance (ADC) scan over
    the compressed code table picks each query's top-``rerank``
    candidates (per-subspace lookup table of query-to-centroid dots,
    summed by code — one numpy gather per batch), then the exact dot
    on the fetched candidate vectors ranks the final top-k with the
    same (rounded desc, id asc) order as ``brute_force_topk``.

    The candidate set is the EXACT global ADC top-``rerank`` under the
    total order (integer-1e-6-quantized approx desc, corpus_id asc): each
    batch prunes to its local top-``rerank`` (a superset of the global
    winners it holds), and one global window applies the same order —
    deterministic across partitionings and reproducible by a SQL
    oracle ranking the same quantized ADC scores.

    Scale shape: the scan reads m bytes/vector instead of 4D; only
    rerank x Q (approx-scored) candidates leave the scan; the exact
    re-rank joins vectors for candidates only. The query set is
    collected to the driver (bounded-Q contract, same as
    ``topk_pandas``); ``max_queries`` fails loudly before the collect."""
    codes = pq_encode(df, codebooks, id_col, vec_col, exact_dist=exact_dist)
    return _pq_adc_topk(
        df, query_df, codes, codebooks, id_col, vec_col, k, rerank,
        probes=None, max_queries=max_queries, caller="pq_topk",
    )


def _pq_adc_topk(
    df: DataFrame,
    query_df: DataFrame,
    codes: DataFrame,
    codebooks,
    id_col: str,
    vec_col: str,
    k: int,
    rerank: int,
    probes: dict[int, set] | None,
    max_queries: int,
    caller: str,
) -> DataFrame:
    """Shared ADC machinery behind ``pq_topk`` (probes=None: every
    query scores every code row) and ``ivf_pq_topk`` (probes: a
    query's scores are restricted to code rows whose ``bucket`` column
    is in its probed set). One implementation — the guard, the LUT
    build, the scan's local prune order, the global candidate window
    and the exact re-rank MUST stay bit-identical between the two
    entry points."""
    import numpy as np

    m, kc, sub = codebooks.shape
    cb = codebooks.astype(np.float64)
    n_queries = query_df.count()
    if n_queries > max_queries:
        raise ValueError(
            f"{caller} collects the query set (and a Q x m x k ADC LUT "
            f"tensor) to the driver: got {n_queries} queries > "
            f"max_queries={max_queries}; shard the query set instead"
        )
    queries = query_df.select(id_col, vec_col).collect()
    if not queries:
        return df.sparkSession.createDataFrame([], _TOPK_SCHEMA)
    q_ids = np.array([r[0] for r in queries])
    q_mat = np.array([r[1] for r in queries], dtype=np.float64)  # (Q, D)
    # per-query ADC lookup tables: dot(query_sub, centroid) (Q, m, kc)
    luts = np.stack(
        [q_mat[:, j * sub : (j + 1) * sub] @ cb[j].T for j in range(m)], axis=1
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["id"].to_numpy()
            c_buckets = pdf["bucket"].to_numpy() if probes is not None else None
            code_mat = np.array(list(pdf["codes"]), dtype=np.int64)  # (B, m)
            # approx dot = sum_j lut[q, j, code[b, j]] -> (Q, B)
            approx = np.zeros((len(q_ids), len(c_ids)))
            for j in range(m):
                approx += luts[:, j, :][:, code_mat[:, j]]
            out = []
            for qi, qid in enumerate(q_ids):
                mask = c_ids != qid
                if probes is not None:
                    probe = probes.get(int(qid), set())
                    mask &= np.isin(c_buckets, list(probe))
                if not mask.any():
                    continue
                ids, vals = c_ids[mask], np_e6(approx[qi][mask])
                take = min(rerank, len(ids))
                # local prune under the SAME total order the global
                # window applies below (quantized approx desc, id asc)
                order = np.lexsort((ids, -vals))[:take]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "corpus_id": ids[order],
                            "approx": vals[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    partial = codes.mapInPandas(
        scan, schema="query_id long, corpus_id long, approx long"
    )
    # exact global ADC top-`rerank` (batches are disjoint, no dedup
    # needed): the union of local top-`rerank` contains every global
    # winner, and the window applies the identical order
    w_cand = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("corpus_id")
    )
    cand = (
        partial.withColumn("__rn", F.row_number().over(w_cand))
        .filter(F.col("__rn") <= rerank)
        .select("query_id", "corpus_id")
    )
    # exact re-rank: fetch candidate vectors, exact dot vs the query
    vecs = df.select(
        F.col(id_col).alias("corpus_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__cvec"),
    )
    qdf = query_df.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__qvec"),
    )
    scored = (
        cand.join(vecs, "corpus_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn("cosine_e4", e4(_zip_dot(F.col("__qvec"), F.col("__cvec"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_e4"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("corpus_id").alias("neighbor_id"), "cosine_e4", "rank")
    )


def ivf_pq_topk(
    df: DataFrame,
    query_df: DataFrame,
    pivots: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank: int = 50,
    nprobe: int = 1,
    exact_dist: bool = False,
    max_queries: int = MAX_COLLECTED_QUERIES,
) -> DataFrame:
    """IVF + PQ composite ANN (the FAISS IVFPQ layout — the canonical
    billion-vector architecture): the coarse quantizer restricts each
    query to its ``nprobe`` nearest cells, and WITHIN those cells the
    scan reads m-byte PQ codes instead of 4D-byte vectors, so cost
    shrinks multiplicatively — ~nprobe/n_pivots of the corpus touched,
    at D*4/m times less data per touched row. Exact re-rank of the
    per-query ADC top-``rerank`` recovers ranking quality, identical
    tail to ``pq_topk``/``brute_force_topk`` ((cosine_e4 desc, id asc)
    under the engine-shared quantized order).

    Plan shape: one bucket assignment pass over the corpus (reusable —
    ``ivf_index_build`` persists the same thing), one PQ encode pass,
    then a per-batch numpy gather restricted to queries probing that
    row's bucket; only rerank*Q approx-scored candidate ids leave the
    scan. The query set (and its Q x m x k LUT tensor) is collected to
    the driver — bounded-Q contract with the usual loud guard.

    One implementation with ``pq_topk``: everything except the probe
    prologue lives in ``_pq_adc_topk`` (probe restriction = a bucket
    mask inside the shared scan), so the two paths cannot drift."""
    # Guard BEFORE any query-scaled collect: the probe-set collect below
    # is Q*nprobe rows, so an oversized query set must fail here, not
    # after _pq_adc_topk's own check (which would run post-collect).
    n_queries = query_df.count()
    if n_queries > max_queries:
        raise ValueError(
            f"ivf_pq_topk collects the query set (probe sets + a Q x m x k "
            f"ADC LUT tensor) to the driver: got {n_queries} queries > "
            f"max_queries={max_queries}; shard the query set instead"
        )
    # probe sets: query -> nprobe buckets (Q*nprobe rows, now bounded)
    qb_rows = assign_buckets(query_df, pivots, id_col, vec_col, nprobe=nprobe).collect()
    probes: dict[int, set] = {}
    for r in qb_rows:
        probes.setdefault(int(r["id"]), set()).add(int(r["bucket"]))

    cbuckets = assign_buckets(df, pivots, id_col, vec_col).select(
        F.col("id").alias("id"), "bucket"
    )
    codes = pq_encode(df, codebooks, id_col, vec_col, exact_dist=exact_dist).join(
        cbuckets, "id"
    )
    return _pq_adc_topk(
        df, query_df, codes, codebooks, id_col, vec_col, k, rerank,
        probes=probes, max_queries=max_queries, caller="ivf_pq_topk",
    )


def recommended_n_planes(n_vectors: int, target_bucket: int = 256) -> int:
    """Planes for hyperplane-LSH candidate generation, sized to keep
    per-bucket self-join work flat as the corpus grows: bucket count is
    2^planes with planes = ceil(log2(N / target_bucket)) + 8, i.e. the
    mean bucket population is deliberately OVERSHARDED to roughly
    ``target_bucket / 256``. The 8 extra planes trade single-bucket
    recall for bounded worst-case bucket joins; callers recover recall
    with multi-probe (``signature_probes``) rather than bigger buckets.
    Floored at 8 planes for small corpora.

    PURE-INTEGER arithmetic (r7): ceil(log2(n/t)) computed as
    bit_length(ceil(n/t) - 1) — since r7 the DuckDB oracles size their
    signatures with the SAME rule in SQL (plans/lsh_oracle.planes_cte),
    and a libm log2 a last-ulp under an integer boundary would flip
    ceil() in one engine only. Smallest m with t*2^m >= n, plus 8."""
    if n_vectors <= target_bucket:
        return 8
    return ((n_vectors + target_bucket - 1) // target_bucket - 1).bit_length() + 8


def auto_max_bucket(n_vectors: int, n_planes: int, mult: int = 16) -> int:
    """The DEFAULT bucket cap for probed near-dup candidate generation
    (r9 — routes the r8 ``_cap_buckets`` mitigation): ``mult`` times the
    ceiling MEAN bucket population, ``mult * max(1, ceil(N / 2^planes))``.

    Under the ``recommended_n_planes`` sizing the mean population is
    deliberately oversharded to ~1, so the cap resolves to ``mult`` at
    any corpus size; with an explicitly pinned width it scales with the
    mean instead of silently strangling recall. A bucket holding more
    than ``mult``x the mean is a duplicate-cluster core whose candidate
    volume is quadratic in cluster mass (measured: candidates grow 870x
    at 30x data uncapped vs 92x capped on the clustered fixture,
    PROBE_r8/SCALE.md 1e) — wider signatures cannot split true
    duplicates, only this cap (or upstream exact dedup) bounds them.

    PURE-INTEGER arithmetic, mirrored in SQL by the DuckDB oracles
    (plans/lsh_oracle.cap_cte) — the recommended_n_planes precedent:
    the cap stays dynamic with N in BOTH engines, never a fixture pin."""
    return mult * max(1, -(-n_vectors // (1 << n_planes)))


def _cap_buckets(cand_keys: DataFrame, key_cols: list[str], max_bucket: int | None) -> DataFrame:
    """Drop candidate-generation buckets with population > max_bucket
    (mirrors dedup.jaccard_pairs max_doc_freq df-capping): a degenerate
    bucket — mass-duplicate embeddings, a failed normalization — turns
    the bounded per-bucket self-join into an N^2 island. Capped buckets
    lose those candidates by design; run exact dedup first for
    mass-duplicate handling."""
    if max_bucket is None:
        return cand_keys
    small = (
        cand_keys.groupBy(*key_cols)
        .agg(F.count("*").alias("__pop"))
        .filter(F.col("__pop") <= max_bucket)
        .select(*key_cols)
    )
    return cand_keys.join(small, key_cols)


def hyperplane_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Random-hyperplane LSH signature per vector: bit j = sign of the
    dot product with a fixed pseudo-random integer hyperplane
    w[j][d] = ((31*j + 7*d) % 11) - 5. Deterministic, engine-neutral
    (integer weights), and entirely JVM-side: one array fold per plane,
    no shuffle. Vectors with equal signatures are near-dup candidates
    (SimHash for embeddings)."""
    def make_weight(j: int):
        # factory keeps the lambda binary — PySpark dispatches higher-
        # order-function lambdas on arity, so default-arg closures break
        def w(x, i):
            return x.cast("double") * (((F.lit(j) * 31 + i * 7) % 11) - 5).cast(
                "double"
            )

        return w

    bits = []
    for j in range(n_planes):
        weighted = F.transform(F.col(vec_col), make_weight(j))
        dot_j = F.aggregate(weighted, F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(dot_j > 0, "1").otherwise("0"))
    return df.select(F.col(id_col).alias("id"), F.concat(*bits).alias("signature"))


def signature_probes(sig: Column, n_planes: int, max_hamming: int = 1) -> Column:
    """The probe set of one LSH signature: itself plus every signature
    within ``max_hamming`` bit flips — n_planes+1 strings for the
    standard h=1. Query-side probing is the multiprobe strategy that
    SCALES (the one ``recommended_n_planes`` prescribes): probes join
    against EXACT full-width signatures, so candidate volume is
    ~(n_planes+1) * N * (bucket population), which stays flat when
    planes grow with log2(N) — where the pigeonhole-block join
    (``embedding_near_dup_multiprobe``) keys on blocks only
    n_planes/(h+1) bits wide and is quadratic in N no matter how many
    total planes (measured: 247x wall at 30x data vs this variant's
    near-linear growth; SCALE.md 1c)."""
    if max_hamming != 1:
        raise ValueError(
            "signature_probes implements the standard h=1 probing; "
            f"got max_hamming={max_hamming} (h>=2 probe sets grow "
            "C(n_planes, h) — use more planes + h=1 instead)"
        )
    probes = [sig]
    for j in range(n_planes):
        flipped = F.when(F.substring(sig, j + 1, 1) == "1", "0").otherwise("1")
        probes.append(
            F.concat(
                F.substring(sig, 1, j), flipped, F.substring(sig, j + 2, n_planes - j - 1)
            )
        )
    return F.array(*probes)


def _probe_exact_join(
    probe_sig: DataFrame,
    exact_sig: DataFrame,
    n_planes: int,
    left_name: str,
    right_name: str,
    max_hamming: int = 1,
) -> DataFrame:
    """Hamming<=``max_hamming`` candidate join between a probing side
    and an exact-signature side — (left_name, right_name) id pairs.
    ONE definition shared by the pair kernel (both sides the same
    corpus) and the incremental classifier (new batch -> corpus), so
    the probe semantics cannot drift between them. A matching pair
    matches on exactly ONE probe (identity at Hamming 0, the flipped
    position at Hamming 1), so no distinct is needed."""
    probes = probe_sig.select(
        F.col("id").alias(left_name),
        F.explode(
            signature_probes(F.col("signature"), n_planes, max_hamming)
        ).alias("probe"),
    )
    exact = exact_sig.select(
        F.col("id").alias(right_name), F.col("signature").alias("probe")
    )
    return probes.join(exact, "probe").select(left_name, right_name)


def _cosine_e4_on_pairs(
    cand: DataFrame,
    left_src: DataFrame,
    right_src: DataFrame,
    left_key: str,
    right_key: str,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Append the quantized exact cosine (``cosine_e4``) to an id-pair
    candidate table — the verify stage every near-dup consumer shares
    (pair kernel, incremental classifier), one definition so the
    zip_with/aggregate dot and the e4 quantization cannot drift."""
    va = left_src.select(
        F.col(id_col).alias(left_key),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("va"),
    )
    vb = right_src.select(
        F.col(id_col).alias(right_key),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        cand.join(va, left_key)
        .join(vb, right_key)
        .withColumn("cosine_e4", e4(dot))
        .drop("va", "vb")
    )


def probed_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = 8,
    max_hamming: int = 1,
    max_bucket: int | str | None = "auto",
) -> DataFrame:
    """The CANDIDATE stage of :func:`embedding_near_dup_probed` —
    (id_a, id_b) pairs whose signatures are within ``max_hamming``,
    BEFORE the exact-cosine verify. Exposed separately (r8) so the
    scale probe can record candidate-pair volume as data rather than
    narrative: the kernel's growth claim is "candidates are bounded by
    (n_planes+1) x N x bucket-population", and PROBE_r{N}.json rows
    carry this count per scale factor to certify it.

    ``max_bucket="auto"`` (the default since r9) engages the bucket cap
    at :func:`auto_max_bucket` — see that docstring for why uncapped is
    a measured scale-killer on clustered spaces; ``None`` disables the
    cap (the recall-exact differential twin), an int pins it."""
    if isinstance(max_bucket, str) and max_bucket != "auto":
        raise ValueError(
            f"max_bucket must be 'auto', an int, or None; got {max_bucket!r}"
        )
    if n_planes is None or max_bucket == "auto":
        n = df.count()
    if n_planes is None:
        n_planes = recommended_n_planes(n)
    if max_bucket == "auto":
        max_bucket = auto_max_bucket(n, n_planes)
    sig = bounded_persist(hyperplane_signatures(df, id_col, vec_col, n_planes))
    sig = _cap_buckets(sig, ["signature"], max_bucket)
    return _probe_exact_join(sig, sig, n_planes, "id_a", "id_b", max_hamming).filter(
        F.col("id_a") < F.col("id_b")
    )


def embedding_near_dup_probed(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = 8,
    max_hamming: int = 1,
    max_bucket: int | str | None = "auto",
) -> DataFrame:
    """THE default embedding near-dup kernel (r7): Hamming-tolerant
    near-dup via QUERY-SIDE signature probing — each vector's probe
    set (its signature + every 1-bit flip, ``signature_probes``)
    equi-joins against the corpus's exact full-width signatures, then
    exact cosine verifies. Semantically identical to
    ``embedding_near_dup_multiprobe`` (both emit exactly the
    Hamming<=1 candidate pairs passing the cosine threshold — pinned
    by test) but scalable: candidates are bounded by
    (n_planes+1) x N x bucket-population, flat under the
    ``recommended_n_planes`` sizing, where block joins go quadratic
    (measured 89x wall at 30x data even with scaled planes vs 30.0x
    here; SCALE.md 1c). Compositions (``dedup_consensus``,
    ``embedding_dup_clusters``) route through this kernel.

    ``n_planes=None`` sizes production runs automatically via
    ``recommended_n_planes(df.count())`` — one metadata-cheap count at
    plan-build time, the ``zordered_df`` auto-method precedent. The
    oracle-pinned registry queries pass the fixture width explicitly.

    ``max_bucket="auto"`` (the DEFAULT since r9) engages the bucket cap
    at :func:`auto_max_bucket`: width-adaptive sizing alone does NOT
    hold candidates linear on a clustered space — heavy buckets are
    duplicate-cluster cores growing with N (measured 870x candidates /
    17.5x wall at 30x data uncapped vs 92x / 3.94x capped; PROBE_r8,
    SCALE.md 1e). The cap is recall-changing BY DESIGN (skipped heavy
    buckets are exactly the mass-duplicate cores): run exact dedup
    first — the pinned ``exact_then_near_dup`` composition — or pass
    ``max_bucket=None`` for the recall-exact differential twin.

    A Hamming<=1 pair matches on exactly ONE probe per orientation and
    only the id_a < id_b orientation survives, so no distinct is
    needed — one fewer shuffle than the block-join variant."""
    cand = probed_candidates(
        df, id_col, vec_col, n_planes, max_hamming, max_bucket
    )
    return (
        _cosine_e4_on_pairs(cand, df, df, "id_a", "id_b", id_col, vec_col)
        .filter(F.col("cosine_e4") >= int(round(threshold * 10000)))
        .select("id_a", "id_b", "cosine_e4")
    )


def classify_embeddings_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    max_bucket: int | str | None = "auto",
    corpus_sig: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL embedding near-dup classification (r9 — the
    embedding tier of the ingest-dedup family, completing
    dedup.classify_against_corpus's exact/jaccard text tiers): each
    NEW vector is graded against the EXISTING corpus — (vec_id,
    n_near, max_cosine_e4, verdict 'near_dup'|'unique') — without ever
    pairing new×new or old×old. The production daily-ingest shape: the
    corpus side is the persisted index, so width and cap are sized
    over the CORPUS count (the index's configuration — a new batch
    must be probed at the index's width, not its own), hot corpus
    buckets are dropped by the same auto cap as the batch kernel
    (``auto_max_bucket``; a new vector probing into a mass-dup core
    gets no candidates — run exact dedup upstream, the
    exact_then_near_dup composition), and candidates are bounded by
    (planes+1) x |new| x cap regardless of batch or corpus size.

    A Hamming<=1 (new, old) pair matches on exactly ONE of the new
    side's probes (identity for Hamming 0, the flipped position for
    Hamming 1), so no distinct is needed — same argument as
    :func:`embedding_near_dup_probed`.

    ``corpus_sig`` accepts a PRE-STAGED (already capped) corpus
    signature table so a streaming caller
    (streaming/ingest.streaming_embedding_verdicts) can pin the index
    once across micro-batches instead of re-signaturing the corpus per
    batch; ``n_planes`` must then be the width it was built at."""
    if isinstance(max_bucket, str) and max_bucket != "auto":
        raise ValueError(
            f"max_bucket must be 'auto', an int, or None; got {max_bucket!r}"
        )
    if corpus_sig is not None:
        if n_planes is None:
            raise ValueError(
                "classify_embeddings_against_corpus: a pre-staged "
                "corpus_sig requires the explicit n_planes it was built at"
            )
        corp_sig = corpus_sig
    else:
        if n_planes is None or max_bucket == "auto":
            n = corpus_df.count()
        if n_planes is None:
            n_planes = recommended_n_planes(n)
        if max_bucket == "auto":
            max_bucket = auto_max_bucket(n, n_planes)
        corp_sig = bounded_persist(
            hyperplane_signatures(corpus_df, id_col, vec_col, n_planes)
        )
        corp_sig = _cap_buckets(corp_sig, ["signature"], max_bucket)
    new_sig = hyperplane_signatures(new_df, id_col, vec_col, n_planes)
    cand = _probe_exact_join(new_sig, corp_sig, n_planes, "new_id", "old_id")
    near = (
        _cosine_e4_on_pairs(
            cand, new_df, corpus_df, "new_id", "old_id", id_col, vec_col
        )
        .filter(F.col("cosine_e4") >= int(round(threshold * 10000)))
        .groupBy("new_id")
        .agg(
            F.count("*").alias("n_near"),
            F.max("cosine_e4").alias("max_cosine_e4"),
        )
    )
    return (
        new_df.select(F.col(id_col).alias("vec_id"))
        .join(near.withColumnRenamed("new_id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("n_near"), F.lit(0).cast("long")).alias("n_near"),
            "max_cosine_e4",
            F.when(F.col("n_near").isNotNull(), "near_dup")
            .otherwise("unique")
            .alias("verdict"),
        )
    )


def embedding_near_dup_multiprobe(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    max_hamming: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """DIFFERENTIAL TWIN of ``embedding_near_dup_probed`` (not a scale
    path — demoted r7): identical Hamming<=``max_hamming`` semantics
    via a pigeonhole BLOCK join (dedup.simhash_hamming_pairs / Manku
    et al. WWW'07) instead of query-side probing. The block join keys
    on blocks only n_planes/(h+1) bits wide, so it is structurally
    superlinear in N at ANY total plane count (measured 89x wall at
    30x data under production sizing vs the probed kernel's 30.0x —
    SCALE.md 1c). Kept because two independent candidate generators
    reaching the same pair set is the cheapest full-recall
    cross-check; use the probed kernel for real corpora."""
    from .dedup import simhash_blocks

    sig = bounded_persist(hyperplane_signatures(df, id_col, vec_col, n_planes))
    probe_structs = [
        F.struct(
            F.lit(b).alias("block"),
            F.substring("signature", start, length).alias("bits"),
        )
        for b, (start, length) in enumerate(
            simhash_blocks(n_planes, max_hamming + 1)
        )
    ]
    probes = sig.select(
        "id", "signature", F.explode(F.array(*probe_structs)).alias("p")
    ).select("id", "signature", F.col("p.block").alias("block"), F.col("p.bits").alias("bits"))
    probes = _cap_buckets(probes, ["block", "bits"], max_bucket)
    a = probes.select(
        F.col("id").alias("id_a"), F.col("signature").alias("sig_a"), "block", "bits"
    )
    b = probes.select(
        F.col("id").alias("id_b"), F.col("signature").alias("sig_b"), "block", "bits"
    )
    hamming = F.bit_count(
        F.conv("sig_a", 2, 10).cast("long").bitwiseXOR(F.conv("sig_b", 2, 10).cast("long"))
    )
    cand = (
        a.join(b, ["block", "bits"])
        .filter((F.col("id_a") < F.col("id_b")) & (hamming <= max_hamming))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    va = vecs.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
    vb = vecs.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine_e4", e4(dot))
        .filter(F.col("cosine_e4") >= int(round(threshold * 10000)))
        .select("id_a", "id_b", "cosine_e4")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT-signature variant
    (Hamming=0 candidates only — single-bucket recall): LSH-signature
    bucketing followed by an exact cosine verify on the candidates.
    Returns (id_a, id_b, cosine_e4) with cosine >= threshold. Bucket
    sizes are ~N/2^n_planes — size ``n_planes`` with
    ``recommended_n_planes(N)`` and/or set ``max_bucket`` to hard-cap
    degenerate buckets (mass-duplicate embeddings) the way
    jaccard_pairs caps stop shingles.

    Since r7 compositions default to ``embedding_near_dup_probed``
    (Hamming<=1 recall at the same bounded-candidate cost); this
    single-bucket variant remains as the recall floor's own
    oracle-pinned query and the probe family's differential base."""
    sig = hyperplane_signatures(df, id_col, vec_col, n_planes)
    sig = _cap_buckets(sig, ["signature"], max_bucket)
    a = sig.select(F.col("id").alias("id_a"), "signature")
    b = sig.select(F.col("id").alias("id_b"), "signature")
    cand = a.join(b, "signature").filter(F.col("id_a") < F.col("id_b"))
    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    va = vecs.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
    vb = vecs.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine_e4", e4(dot))
        .filter(F.col("cosine_e4") >= int(round(threshold * 10000)))
        .select("id_a", "id_b", "cosine_e4")
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Scalar int8 quantization per vector (max-abs symmetric): scale =
    127 / max|x|, code_p = floor(x_p * scale + 0.5). Pure higher-order
    Column exprs — JVM-side, no Python, no shuffle. The storage scale
    path for ANN: 4x smaller vectors (float32 -> int8 + one scale),
    dot products computable in integer space with one final rescale.
    floor(x+0.5) is used instead of round() so both engines (and any
    partitioning) quantize the identical double identically."""
    vals = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    m = F.array_max(F.transform(vals, F.abs))
    scale = F.when(m > 0, F.lit(127.0) / m).otherwise(F.lit(0.0))
    codes = F.transform(
        vals, lambda x: F.floor(x * scale + F.lit(0.5)).cast("int")
    )
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        codes.alias("codes"),
        vals.alias("vals"),
    )


def merge_topk(
    state: DataFrame | None,
    batch_topk: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Fold a corpus batch's top-k into the running top-k per query.

    Top-k under a total order is a mergeable monoid: keep-best-k of a
    union of keep-best-k partials equals keep-best-k of the whole —
    so an ANN index over a GROWING corpus maintains exact brute-force
    answers at per-batch cost (the interactive-session incremental
    top-k pattern, cf. EDBT'20). Both inputs carry the engine's
    deterministic order (cos_r desc, neighbor_id asc); the merge
    re-ranks the (<= 2k per query) union rows only.

    Idempotent under re-delivery: a neighbor present in both the state
    and the batch (overlapping batches, at-least-once replay) is
    deduplicated BEFORE ranking — otherwise the duplicate would occupy
    two ranks and evict the true k-th neighbor."""
    both = batch_topk if state is None else state.unionByName(batch_topk)
    both = both.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_e4"), F.asc("neighbor_id")
    )
    return (
        both.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("rank")
        .withColumnRenamed("__r", "rank")
    )


def ivf_index_build(
    df: DataFrame,
    pivots: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Persist an IVF index: the corpus bucket assignments written as
    parquet PARTITIONED BY bucket (so a probe reads only its cells'
    files — partition pruning is the on-disk analogue of the bucket
    join), plus the pivot vectors. Build once over the corpus, serve
    any number of query batches without re-deriving assignments — at
    100 TB the build is the expensive pass (one scan + one bucket
    shuffle) and queries touch ~nprobe/n_pivots of the data files.

    Layout: ``{index_path}/vectors/bucket=<b>/*.parquet`` holding
    (corpus_id, vec); ``{index_path}/pivots/*.parquet`` holding the
    pivot rows. Returns a small manifest dict."""
    import os

    cb = assign_buckets(df, pivots, id_col, vec_col).select(
        F.col("id").alias("corpus_id"), "bucket"
    )
    vectors = df.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("vec")
    ).join(cb, "corpus_id")
    vectors.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(index_path, "vectors")
    )
    pivots.select(
        F.col(id_col).alias("pivot_id"), F.col(vec_col).alias("vec")
    ).write.mode("overwrite").parquet(os.path.join(index_path, "pivots"))
    # bucket count from the WRITTEN partition directories — a listing,
    # not a second full assignment pass over the corpus
    vdir = os.path.join(index_path, "vectors")
    n_buckets = sum(1 for name in os.listdir(vdir) if name.startswith("bucket="))
    return {"path": index_path, "n_buckets": n_buckets}


def ivf_index_append(
    spark,
    index_path: str,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Fold a batch of NEW vectors into a persisted IVF index without
    rebuilding: assign the batch against the index's OWN pivots (the
    coarse quantizer is frozen at build time — the FAISS convention;
    re-training pivots would silently re-shard every existing cell),
    then append-write into the bucket-partitioned store. Existing data
    files are untouched, so continuous ingestion costs one batch-sized
    assignment + write per day instead of a corpus rebuild, and
    ``ivf_index_query`` answers over build+appends are IDENTICAL to a
    fresh build over the union (pinned by test — bucket assignment is
    a pure function of (vector, pivots)).

    Returns the refreshed manifest. At 100 TB the append is the whole
    point of the persisted layout: the build's full-corpus shuffle
    happens once; appends touch only the new rows and the footer
    listing."""
    import os

    pivots = spark.read.parquet(os.path.join(index_path, "pivots")).select(
        F.col("pivot_id").alias(id_col), F.col("vec").alias(vec_col)
    )
    nb = assign_buckets(new_df, pivots, id_col, vec_col).select(
        F.col("id").alias("corpus_id"), "bucket"
    )
    vectors = new_df.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("vec")
    ).join(nb, "corpus_id")
    vectors.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(index_path, "vectors")
    )
    vdir = os.path.join(index_path, "vectors")
    n_buckets = sum(1 for name in os.listdir(vdir) if name.startswith("bucket="))
    return {"path": index_path, "n_buckets": n_buckets}


def ivf_index_query(
    spark,
    index_path: str,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """Serve a query batch from a persisted IVF index: assign queries
    to their ``nprobe`` pivots (the tiny pivot table comes from the
    index), then join candidates ON THE BUCKET against the partitioned
    vector store — the bucket equi-join becomes partition-pruned file
    reads. Result semantics are identical to ``ivf_topk`` over the
    same corpus/pivots (pinned by test)."""
    import os

    pivots = spark.read.parquet(os.path.join(index_path, "pivots")).select(
        F.col("pivot_id").alias(id_col), F.col("vec").alias(vec_col)
    )
    corpus = spark.read.parquet(os.path.join(index_path, "vectors"))
    qb = assign_buckets(query_df, pivots, id_col, vec_col, nprobe=nprobe).select(
        F.col("id").alias("query_id"), "bucket"
    )
    queries = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    ).join(F.broadcast(qb), "query_id")
    cand = corpus.join(F.broadcast(queries), "bucket").filter(
        F.col("query_id") != F.col("corpus_id")
    )
    return _score_rank_candidates(cand, "__qvec", "vec", k)
