"""Empirical scale-up probe: replicate the fact tables K× (default 10)
with join-consistent key offsets, then time every headline query at 1×
and K× on the same session/methodology as bench.py.

What this demonstrates (recorded in SCALE.md §1c):
- queries whose cost is the fixed planning/dispatch floor stay flat,
- queries with real per-row work grow ~linearly (never super-linearly:
  no N² pair blowup, no broadcast that stops fitting),
- pushed-down point filters stay flat because the scan prunes.

Replication scheme (a copy is a disjoint "tenant", so every join stays
valid and every planted relationship recurs once per copy):
- orders.o_orderkey / lineitem.l_orderkey   += k * (max+1)
- orders.o_custkey / customer.c_custkey     += k * (max+1)
- events.event_id, events.user_id           += k * (max+1)
- documents.doc_id                          += k * (max+1)
- embeddings.vec_id                         += k * (max+1)
- documents.text: every token suffixed "_k" per copy, so shingle sets
  are copy-disjoint — near-dup PAIRS scale exactly linearly instead of
  exploding cross-copy (each copy is its own dup neighborhood).
- embeddings.embedding: copy i is reflected through the diagonal ±1
  matrix whose sign pattern is parity(popcount(dim & i)). A diagonal
  orthogonal transform preserves every WITHIN-copy dot product exactly
  (the planted near-dup neighborhoods recur bit-identically per copy)
  while cross-copy cosines of the same base vector decorrelate —
  without this, verbatim copies make every (copy_i, copy_j) pair of
  one vector a cosine-1.0 near-dup and the pair output grows ~k²/2
  (a replica artifact the r6 dedup_consensus probe surfaced, 5.4× at
  10× data; with the reflection the output is linear in k again).
- dimension tables (region/nation/part/supplier) stay single-copy:
  dims don't grow 10× when facts do, and they must stay broadcastable.

A `_replica_v2` marker file versions the layout: probes rebuild any
replica directory that predates the embedding reflection.

Usage: python scripts/scale_probe.py [--only q1,q2 | --all] [--isolate]
       [K] [base_sf_dir]
(--only times the named registry queries instead of the headline set;
--all times EVERY registry query — per-query failures are recorded as
NaN growth instead of aborting the run; --isolate runs each query's
build + warm-up + timed passes + counts as its own unit and drops the
persist pool between queries — the r8 probes showed that in a long
phase-at-a-time session the bounded-persist pool evicts a query's
barrier during the ~90 later frame builds and a heavy twin's GC
pressure bleeds into every later small row, inflating e.g.
quality_stratified_sample from 2.47x to 7.28x; use --isolate for hot
rows, the default for cross-round-comparable full sweeps)
Writes the replica under /tmp/spark-graft-scale{K}x (rebuilt if absent).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_integration_pipelines_spark.catalog import TABLES, load_table  # noqa: E402
from data_integration_pipelines_spark.plans import REGISTRY  # noqa: E402
from data_integration_pipelines_spark.session import get_spark  # noqa: E402

_KEY_OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# offset domain per key family so copies never collide
_KEY_FAMILY = {
    "o_orderkey": "order",
    "l_orderkey": "order",
    "o_custkey": "cust",
    "c_custkey": "cust",
    "event_id": "event",
    "user_id": "user",
    "doc_id": "doc",
    "vec_id": "vec",
}


_REPLICA_MARKER = "_replica_v2"  # bumped when the layout scheme changes


def build_replica(spark, base_dir: str, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # one offset per key family, shared across tables so joins stay valid
    family_off: dict[str, int] = {}
    for table, keys in _KEY_OFFSETS.items():
        df = load_table(spark, base_dir, table)
        for key in keys:
            fam = _KEY_FAMILY[key]
            if fam not in family_off:
                family_off[fam] = df.agg(F.max(key)).collect()[0][0] + 1
    for table in TABLES:
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        df = load_table(spark, base_dir, table)
        if table not in _KEY_OFFSETS:
            df.write.parquet(dst)  # dims stay single-copy
            continue
        copies = []
        for i in range(k):
            c = df
            for key in _KEY_OFFSETS[table]:
                off = i * family_off[_KEY_FAMILY[key]]
                c = c.withColumn(key, F.col(key) + F.lit(off))
            if table == "documents" and i > 0:
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1_{i}")
                )
            if table == "embeddings" and i > 0:
                # diagonal ±1 reflection: orthogonal, so within-copy dot
                # products (and hence the planted near-dup pairs) are
                # preserved bit-exactly; cross-copy cosines decorrelate.
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (v, d) -> CASE WHEN"
                        f" pmod(bit_count(d & {i}), 2) = 1"
                        " THEN -v ELSE v END)"
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.parquet(dst)
    Path(os.path.join(out_dir, _REPLICA_MARKER)).touch()


def _dedup_consensus_scaled_planes(spark, sf_dir: str):
    """dedup_consensus with PRODUCTION LSH sizing: the registry query
    pins n_planes=8 because the DuckDB oracle must replicate the exact
    signature bits (and 8 IS recommended_n_planes at fixture scale);
    at 10×/30× data a fixed signature width makes any candidate join
    quadratic (bucket population grows with N). Since r7 the registry
    query composes the PROBED kernel, so this twin is the same
    composition under n_planes=None (auto recommended_n_planes). Since
    r9 the registry default ALSO auto-caps (max_bucket='auto'), so this
    twin now pins max_bucket=None — the UNCAPPED contrast for the
    consensus composition, no longer the production path."""
    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.functions.quantize import e4
    from data_integration_pipelines_spark.operators.dedup import jaccard_pairs
    from data_integration_pipelines_spark.operators.similarity import (
        embedding_near_dup_probed,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    t = jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.8).select(
        "id_a", "id_b", e4(F.col("jaccard")).alias("jaccard_e4")
    )
    e = embedding_near_dup_probed(
        emb, threshold=0.35, n_planes=None, max_bucket=None
    )
    return (
        t.join(e, ["id_a", "id_b"], "full_outer")
        .select(
            "id_a",
            "id_b",
            "jaccard_e4",
            "cosine_e4",
            F.when(
                F.col("jaccard_e4").isNotNull() & F.col("cosine_e4").isNotNull(),
                "both",
            )
            .when(F.col("jaccard_e4").isNotNull(), "text_only")
            .otherwise("embedding_only")
            .alias("verdict"),
        )
        .orderBy("id_a", "id_b")
    )


def _embedding_near_dup_scaled_planes(spark, sf_dir: str):
    """embedding_near_dup with production LSH sizing (see the
    dedup_consensus twin's docstring for the rationale)."""
    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.operators.similarity import (
        embedding_near_dup_pairs,
        recommended_n_planes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    planes = recommended_n_planes(emb.count())
    return embedding_near_dup_pairs(emb, threshold=0.35, n_planes=planes).orderBy(
        "id_a", "id_b"
    )


def _embedding_near_dup_probed_scaled_planes(spark, sf_dir: str):
    """embedding_near_dup_probed at production widths with the bucket
    cap DISABLED — since r9 the registry default auto-caps
    (max_bucket='auto'), so this twin is the UNCAPPED contrast row:
    it measures the path the pre-r9 default took (17.5x wall / 870x
    candidates at 30x on the clustered replica) against the capped
    registry row's ~linear growth. Also the contrast row for the
    block-join twin below."""
    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.operators.similarity import (
        embedding_near_dup_probed,
        recommended_n_planes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    planes = recommended_n_planes(emb.count())
    return embedding_near_dup_probed(
        emb, threshold=0.35, n_planes=planes, max_hamming=1, max_bucket=None
    ).orderBy("id_a", "id_b")


def _embedding_near_dup_multiprobe_scaled_planes(spark, sf_dir: str):
    """embedding_near_dup_multiprobe with production LSH sizing — the
    registry query's fixed 8 planes make Hamming-1 block candidates
    quadratic in N (247× wall at 30× data, the r6 full-probe's worst
    row); the production rule holds block populations flat, recovering
    recall via probing without unbounded candidate growth."""
    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.operators.similarity import (
        embedding_near_dup_multiprobe,
        recommended_n_planes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    planes = recommended_n_planes(emb.count())
    return embedding_near_dup_multiprobe(
        emb, threshold=0.35, n_planes=planes, max_hamming=1
    ).orderBy("id_a", "id_b")


def _semdedup_gram(spark, sf_dir: str, k_mode: str):
    """SemDeDup gram-stage probe with a FIXED deterministic assignment
    (cluster = pmod(xxhash64(vec_id), k)) so the probe isolates the
    per-cluster pairwise work from the k-means fit cost. k_mode:
    'auto' = auto_k(N) (bounded ~64-vector clusters at any N — the r7
    production sizing), 'fixed' = the oracle-pinned k=8 (cluster size
    grows with N, gram work quadratic). The pair demonstrates VERDICT
    r6 task 5's claim directly: bounded per-cluster work at 30×."""
    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.operators.clustering import (
        auto_k,
        quantize_vec,
        semdedup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    k = auto_k(emb.count()) if k_mode == "auto" else 8
    assigned = emb.select(
        F.col("vec_id").alias("id"),
        quantize_vec(F.col("embedding")).alias("qvec"),
        F.pmod(F.xxhash64("vec_id"), F.lit(k)).alias("cluster"),
    )
    return (
        semdedup_pairs(assigned, 0.35)
        .groupBy("cluster")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("cluster")
    )


def _semdedup_pivoted_pipeline(spark, sf_dir: str):
    """The FULL linear-path SemDeDup composition at production sizing —
    the end-to-end answer to the flat-assignment N·k·D term that
    semdedup_survivors_auto_k measures (37.4× at 30×, SCALE.md 1d):
    centroids fit on a BOUNDED deterministic sample (the pq_train
    precedent; sample ≥ 8k rows so every cluster can seed), k grown
    with N (auto_k), the full corpus assigned via PIVOTED probing
    (O(N·D·√k)), then bounded-cluster gram dedup."""
    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.operators.clustering import (
        assign_clusters_pivoted,
        auto_k,
        kmeans_fit_table,
        quantize_vec,
        recommended_n_super,
        semdedup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    k = auto_k(n)
    step = max(1, n // max(4096, 8 * k))
    # hash-first sample — matches semdedup_assign's r9 id-distribution-
    # independent filter (ADVICE r8)
    sample = emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(step)) == 0)
    _, cent = kmeans_fit_table(sample, k=k, iters=2, reseed_empty=False)
    assigned = assign_clusters_pivoted(
        emb, cent, n_super=recommended_n_super(k), nprobe=1
    )
    qdf = emb.select(
        F.col("vec_id").alias("id"), quantize_vec(F.col("embedding")).alias("qvec")
    )
    pairs = semdedup_pairs(assigned.select("id", "cluster").join(qdf, "id"), 0.35)
    return (
        pairs.groupBy("cluster")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("cluster")
    )


def _semdedup_gram_auto_k(spark, sf_dir: str):
    return _semdedup_gram(spark, sf_dir, "auto")


def _semdedup_gram_fixed_k(spark, sf_dir: str):
    return _semdedup_gram(spark, sf_dir, "fixed")


def _embedding_near_dup_probed_capped(spark, sf_dir: str):
    """embedding_near_dup_probed at production sizing WITH the bucket
    cap engaged (r8): the r8 candidate counts showed that on a
    CLUSTERED embedding space the recommended_n_planes sizing alone
    does not hold candidate volume linear — heavy LSH buckets (cluster
    cores) grow with N, so candidates grew 537x at 30x data. The
    documented mitigation is the kernel's max_bucket knob
    (similarity._cap_buckets — drop candidate generation in buckets
    over the cap, the jaccard max_doc_freq precedent; recall for
    in-hot-bucket pairs is traded away, run exact dedup first). This
    twin certifies that the CAPPED path's candidates and wall stay
    ~linear on the same replica."""
    from data_integration_pipelines_spark.operators.similarity import (
        embedding_near_dup_probed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_probed(
        emb, threshold=0.35, n_planes=None, max_bucket=256
    ).orderBy("id_a", "id_b")


def _massdup_tables(spark, sf_dir: str):
    """A MASS-DUPLICATE corpus derived from the fixture: the minimum-id
    document/vector is replicated verbatim N/10 times (new ids above
    the existing id range), so the duplicate pile's mass GROWS WITH N —
    the adversarial regime the bucket cap exists for (constant-fraction
    per-vector duplication would stay linear; one pile growing with N
    is what makes uncapped candidate generation quadratic). Returns
    (docs', emb') with doc/vec domains consistent."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    m = max(1, n // 10)
    lo_v = emb.agg(F.min("vec_id")).collect()[0][0]
    hi_v = emb.agg(F.max("vec_id")).collect()[0][0]
    hi_d = docs.agg(F.max("doc_id")).collect()[0][0]
    off = max(hi_v, hi_d) + 1
    copies_e = (
        emb.filter(F.col("vec_id") == lo_v)
        .crossJoin(spark.range(m).select(F.col("id").alias("__c")))
        .select((F.lit(off) + F.col("__c")).alias("vec_id"),
                *[c for c in emb.columns if c != "vec_id"])
    )
    lo_doc = docs.filter(F.col("doc_id") == lo_v)
    if not lo_doc.take(1):
        raise ValueError(
            f"_massdup_tables: no document with doc_id == min vec_id "
            f"({lo_v}) — on a fixture with disjoint doc/vec id domains "
            "the composition would drop the pile by JOIN OMISSION and "
            "the probe would certify nothing about exact-dedup recovery"
        )
    copies_d = (
        lo_doc.crossJoin(spark.range(m).select(F.col("id").alias("__c")))
        .select((F.lit(off) + F.col("__c")).alias("doc_id"), "text")
    )
    return docs.unionByName(copies_d), emb.unionByName(copies_e.select(emb.columns))


def _near_dup_massdup_uncapped(spark, sf_dir: str):
    """The UNCAPPED probed kernel on the mass-dup corpus — the
    quadratic counterfactual: the pile shares one signature bucket
    whose population is 0.1*N, so candidates grow ~N^2/200 and the
    pair OUTPUT itself is quadratic (every copy pair passes the cosine
    bar at 1.0)."""
    from data_integration_pipelines_spark.operators.similarity import (
        embedding_near_dup_probed,
    )

    _, emb = _massdup_tables(spark, sf_dir)
    return embedding_near_dup_probed(
        emb, threshold=0.35, n_planes=None, max_bucket=None
    )


def _near_dup_massdup_capped(spark, sf_dir: str):
    """The CAPPED DEFAULT on the mass-dup corpus — wall stays bounded
    (the pile's bucket is dropped) at the cost of every in-pile pair
    INCLUDING the organic neighbors of the duplicated vector: recall
    loss, which the composition below repairs."""
    from data_integration_pipelines_spark.operators.similarity import (
        embedding_near_dup_probed,
    )

    _, emb = _massdup_tables(spark, sf_dir)
    return embedding_near_dup_probed(
        emb, threshold=0.35, n_planes=None, max_bucket="auto"
    )


def _exact_then_near_dup_massdup(spark, sf_dir: str):
    """THE PRODUCTION COMPOSITION (exact_then_near_dup) on the mass-dup
    corpus: exact fingerprint dedup collapses the verbatim pile to its
    min-id representative, the pile's bucket falls back under the cap,
    and the capped kernel on survivors recovers the representative's
    organic near-dup pairs — linear wall AND full survivor recall,
    probe-certified at the scale the unit test pins symbolically."""
    from data_integration_pipelines_spark.operators.dedup import exact_dedup
    from data_integration_pipelines_spark.operators.similarity import (
        embedding_near_dup_probed,
    )

    docs, emb = _massdup_tables(spark, sf_dir)
    surv = exact_dedup(docs, "text", "doc_id").select(
        F.col("survivor_id").alias("vec_id")
    )
    return embedding_near_dup_probed(
        emb.join(surv, "vec_id"),
        threshold=0.35, n_planes=None, max_hamming=1, max_bucket="auto",
    )


def _stratified_single_stratum(spark, sf_dir: str):
    """quality_stratified_sample's threshold cut under the adversarial
    ONE-GIANT-STRATUM layout (every doc in one lang — the
    training_chunks_single_source precedent): the r7 rank formulation
    serialized the whole corpus through one window task here by
    construction; the r8 histogram-threshold path must hold because
    the only per-stratum window runs over the SCORE HISTOGRAM (and
    boundary ties), never data rows."""
    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.functions.text import bpe_token_count
    from data_integration_pipelines_spark.operators.skew import (
        stratified_fraction_cut,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.lit("xx").alias("lang"),
        bpe_token_count(F.col("text")).alias("quality"),
    )
    return stratified_fraction_cut(
        scored, ["lang"], "quality", "doc_id", num=2, den=5
    ).orderBy("doc_id")


def _contamination_wide_eval_shuffle(spark, sf_dir: str):
    """contamination_fraction_wide_eval with the holdout side PINNED to
    the shuffle-hash regime (VERDICT r7 task 6): the registry query is
    deliberately unhinted — AQE broadcasts the holdout while it fits
    autoBroadcastJoinThreshold and shuffles when it doesn't — but every
    probe so far ran with AQE still free to broadcast, so the join's
    OTHER branch (the one a genuinely wide eval set takes at 100 TB)
    was never certified. The hint forces that branch at probe scale."""
    from data_integration_pipelines_spark.plans.queries_curation import (
        contamination_fraction_wide_eval,
    )

    return contamination_fraction_wide_eval(spark, sf_dir, shuffle_holdout=True)


# ---- candidate-pair counters (VERDICT r7 task 4) -------------------
# growth rows for candidate-join kernels claim "output/candidate volume
# grows linearly" — these record the CANDIDATE counts per scale factor
# so the claim is data, not narrative. Keyed by probe/query name; each
# returns the candidate-pair count for that query's exact sizing.


def _cand_probed(n_planes, max_bucket=None):
    def count(spark, sf_dir: str) -> int:
        from data_integration_pipelines_spark.operators.similarity import (
            probed_candidates,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        return probed_candidates(
            emb, n_planes=n_planes, max_bucket=max_bucket
        ).count()

    return count


_CAND_COUNTERS = {
    # the registry queries and their probe twins are ALL width-adaptive
    # since r7 (n_planes=None -> recommended_n_planes(N) in both
    # engines) and AUTO-CAPPED since r9 (max_bucket='auto' ->
    # auto_max_bucket(N, planes) — the routed r8 mitigation); the
    # fixed-8 rows are the embedding_near_dup / _multiprobe
    # differential twins, which have no counter here
    "embedding_near_dup_probed": _cand_probed(None, max_bucket="auto"),
    "dedup_consensus": _cand_probed(None, max_bucket="auto"),
    # the demoted pre-r9 default — the uncapped contrast rows
    "embedding_near_dup_probed_uncapped": _cand_probed(None, max_bucket=None),
    "embedding_near_dup_probed_scaled_planes": _cand_probed(
        None, max_bucket=None
    ),
    "dedup_consensus_scaled_planes": _cand_probed(None, max_bucket=None),
    # fixed-cap contrast (the r8 pre-routing twin, cap pinned at 256)
    "embedding_near_dup_probed_capped": _cand_probed(None, max_bucket=256),
}


def _cand_exact_then_near_dup(spark, sf_dir: str) -> int:
    from data_integration_pipelines_spark.operators.dedup import exact_dedup
    from data_integration_pipelines_spark.operators.similarity import (
        probed_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    surv = exact_dedup(docs, "text", "doc_id").select(
        F.col("survivor_id").alias("vec_id")
    )
    return probed_candidates(
        emb.join(surv, "vec_id"), n_planes=None, max_bucket="auto"
    ).count()


_CAND_COUNTERS["exact_then_near_dup"] = _cand_exact_then_near_dup


def _semdedup_route(spark, sf_dir: str) -> str:
    """Which branch the semdedup_assign front door takes at this corpus
    size — recorded per scale factor so 'the pivoted route fired at
    30x' is artifact data, not arithmetic in prose (VERDICT r8 task 5).
    Recomputes the front door's own decision inputs (one count + one
    1-row dim probe) without running the clustering."""
    from data_integration_pipelines_spark.operators.clustering import (
        auto_k,
        semdedup_route,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    # semdedup_route IS the front door's own predicate (one shared
    # definition) — the recorded route cannot drift from the decision
    return semdedup_route(n, auto_k(n), dim)


# extra per-scale metadata recorded next to the counts: query name ->
# fn(spark, sf_dir) -> str. Strings are copied into the report verbatim
# per scale factor (no growth ratio).
_META_PROBES = {
    "semdedup_survivors": _semdedup_route,
    "semdedup_pairs": _semdedup_route,
    "semdedup_keep_ids": _semdedup_route,
}


# probe-only variants: (fn, time_build) — not registry queries (their
# parameters depend on corpus size, which the oracle contract forbids)
_EXTRA_PROBES = {
    "semdedup_gram_auto_k": (_semdedup_gram_auto_k, True),
    "semdedup_gram_fixed_k": (_semdedup_gram_fixed_k, True),
    "semdedup_pivoted_pipeline": (_semdedup_pivoted_pipeline, True),
    "dedup_consensus_scaled_planes": (_dedup_consensus_scaled_planes, True),
    "embedding_near_dup_scaled_planes": (
        _embedding_near_dup_scaled_planes,
        True,
    ),
    "embedding_near_dup_multiprobe_scaled_planes": (
        _embedding_near_dup_multiprobe_scaled_planes,
        True,
    ),
    "embedding_near_dup_probed_scaled_planes": (
        _embedding_near_dup_probed_scaled_planes,
        True,
    ),
    "contamination_wide_eval_shuffle": (_contamination_wide_eval_shuffle, True),
    "embedding_near_dup_probed_capped": (_embedding_near_dup_probed_capped, True),
    "stratified_single_stratum": (_stratified_single_stratum, False),
    # the mass-duplicate trio (r9): one pile growing with N — uncapped
    # quadratic counterfactual, capped-only recall loss, composition
    # repair. time_build=True: the table construction (count + 3 tiny
    # collects) is part of the path being measured.
    "near_dup_massdup_uncapped": (_near_dup_massdup_uncapped, True),
    "near_dup_massdup_capped": (_near_dup_massdup_capped, True),
    "exact_then_near_dup_massdup": (_exact_then_near_dup_massdup, True),
}


def time_queries(
    spark, sf_dir: str, only: set[str] | None = None, isolate: bool = False
) -> tuple[dict[str, float], dict[str, dict[str, int]]]:
    """Returns (per-query best wall seconds, per-query counts). Counts
    carry ``n_out`` (output rows, every query) and ``n_candidates``
    (candidate pairs, kernels with a _CAND_COUNTERS entry) — recorded
    OUTSIDE the timed passes so growth claims about output- or
    candidate-bound queries are certified by the artifact itself.

    ``isolate=True`` runs each query's build + warm + timed passes +
    counts back-to-back and drops the persist pool between queries
    (see the module docstring: the phase-at-a-time default lets pool
    eviction + heavy-twin GC pollute small rows in long sessions)."""
    fns: dict[str, tuple] = {
        name: (q.fn, q.time_build)
        for name, q in REGISTRY.items()
        if (only is None and q.headline) or (only is not None and name in only)
    }
    for name in _EXTRA_PROBES:
        if only is not None and name in only:
            fns[name] = _EXTRA_PROBES[name]
    timings: dict[str, float] = {}
    counts: dict[str, dict[str, int]] = {}

    def run_one(name, fn, time_build, df):
        for _ in range(2):
            t0 = time.time()
            if time_build:
                # driver-loop algorithms do real work in fn() — time it
                # (same honesty rule as bench.py)
                df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    def measure_counts(name, df):
        # counting failures must never discard a valid timing (ADVICE
        # r8): counts get their own try, a miss records only the
        # missing count
        try:
            counts[name] = {"n_out": df.count()}
        except Exception as exc:
            print(f"COUNT-FAIL {name}.n_out: {type(exc).__name__}: {exc}"[:300],
                  file=sys.stderr)
            counts[name] = {}
        if name in _CAND_COUNTERS:
            try:
                counts[name]["n_candidates"] = _CAND_COUNTERS[name](
                    spark, sf_dir
                )
            except Exception as exc:
                print(
                    f"COUNT-FAIL {name}.n_candidates: "
                    f"{type(exc).__name__}: {exc}"[:300],
                    file=sys.stderr,
                )
        if name in _META_PROBES:
            try:
                counts[name]["route"] = _META_PROBES[name](spark, sf_dir)
            except Exception as exc:
                print(f"META-FAIL {name}.route: {type(exc).__name__}: {exc}"[:300],
                      file=sys.stderr)

    if isolate:
        from data_integration_pipelines_spark.operators.cache import (
            release_cached,
        )

        for name, (fn, time_build) in fns.items():
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                run_one(name, fn, time_build, df)
            except Exception as exc:
                print(f"FAIL {name}: {type(exc).__name__}: {exc}"[:300],
                      file=sys.stderr)
                timings[name] = float("nan")
            else:
                measure_counts(name, df)
            release_cached()
            spark.catalog.clearCache()
        return timings, counts

    frames = {}
    failures: dict[str, str] = {}
    for name, (fn, _) in fns.items():
        try:
            frames[name] = fn(spark, sf_dir)
            frames[name].write.format("noop").mode("overwrite").save()
        except Exception as exc:  # full-registry runs: record, keep going
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"FAIL {name}: {failures[name]}", file=sys.stderr)
    # default: INTERLEAVED passes (pass 1 over every query, then pass
    # 2) — the methodology every prior round's full sweep used; keep it
    # so cross-round growth numbers stay comparable
    for _ in range(2):
        for name, df in frames.items():
            t0 = time.time()
            if fns[name][1]:
                df = fns[name][0](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    # counts run AFTER the timed passes (ADVICE r8): probed_candidates
    # bounded_persists its own signature table, and count actions add
    # exactly the persist-pool pressure the isolate docstring blames
    # for polluting small rows — measuring last keeps the interleaved
    # timings comparable across rounds
    for name, df in frames.items():
        measure_counts(name, df)
    for name, err in failures.items():
        timings[name] = float("nan")
    return timings, counts


def main() -> None:
    args = sys.argv[1:]
    only: set[str] | None = None
    isolate = "--isolate" in args
    if isolate:
        args.remove("--isolate")
    if "--all" in args:
        args.remove("--all")
        only = set(REGISTRY)
    elif "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
        unknown = only - set(REGISTRY) - set(_EXTRA_PROBES)
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
    k = int(args[0]) if args else 10
    base = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    # the replica dir encodes the BASE too (r9): different-base runs at
    # the same K previously reused whichever replica was built first
    out = f"/tmp/spark-graft-scale{k}x-{os.path.basename(base.rstrip('/'))}"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not (
        os.path.exists(os.path.join(out, "embeddings.parquet"))
        and os.path.exists(os.path.join(out, _REPLICA_MARKER))
    ):
        build_replica(spark, base, out, k)
    base_t, base_c = time_queries(spark, base, only, isolate)
    # drop the persist pool AND the catalog cache between phases: in
    # local mode storage and broadcast builds share ONE heap, and the
    # base phase's pooled tables otherwise squeeze the 30x phase's
    # broadcast allocations (observed notEnoughMemoryToBuildAndBroadcast
    # at k=30 with the stock 8g heap)
    from data_integration_pipelines_spark.operators.cache import release_cached

    release_cached()
    spark.catalog.clearCache()
    scaled_t, scaled_c = time_queries(spark, out, only, isolate)
    report = {}
    for name in base_t:
        row = {
            "base_s": base_t[name],
            f"x{k}_s": scaled_t[name],
            "growth": round(scaled_t[name] / base_t[name], 2),
        }
        keys = set(base_c.get(name, {})) | set(scaled_c.get(name, {}))
        for key in sorted(keys):
            bv = base_c.get(name, {}).get(key)
            sv = scaled_c.get(name, {}).get(key)
            if bv is not None:
                row[f"{key}_base"] = bv
            if sv is not None:
                row[f"{key}_x{k}"] = sv
                # growth ratios only for numeric counts (route is a str)
                if isinstance(sv, (int, float)) and isinstance(bv, (int, float)) and bv:
                    row[f"{key}_growth"] = round(sv / bv, 2)
        report[name] = row
    print(json.dumps({"k": k, "base": base, "queries": report}, indent=2))


if __name__ == "__main__":
    main()
