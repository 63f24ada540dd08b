"""Seeded global-shuffle export (sources/shard_export.assign_shuffled /
export_shuffled) and the corpus distinct-n diversity metric.

The shuffle is the trainer-facing training-order contract: membership
and order must be pure functions of (id, seed) — never of partitioning,
task layout, or cluster size — and a new epoch order must be one
integer away. These pin exactly that.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_pipelines_spark.catalog import load_table
from data_integration_pipelines_spark.sources.shard_export import (
    SHARD_COL,
    SHUFFLE_KEY_COL,
    assign_shuffled,
)


def _docs(spark, sf_small):
    return load_table(spark, sf_small, "documents")


def _mapping(df) -> dict:
    return {
        r["doc_id"]: (r[SHARD_COL], r[SHUFFLE_KEY_COL])
        for r in df.select("doc_id", SHARD_COL, SHUFFLE_KEY_COL).collect()
    }


def test_assignment_is_partitioning_invariant(spark, sf_small):
    """shard + order key depend only on (id, seed): the same frame
    repartitioned 1-way and 7-way assigns identically."""
    docs = _docs(spark, sf_small)
    a = _mapping(assign_shuffled(docs.repartition(1), "doc_id", 8, seed=0))
    b = _mapping(assign_shuffled(docs.repartition(7), "doc_id", 8, seed=0))
    assert a == b and len(a) == 500


def test_seed_redeals_order_but_not_membership_total(spark, sf_small):
    """seed+1 is a fresh epoch: the full document set is preserved but
    both shard membership and in-shard order re-deal."""
    docs = _docs(spark, sf_small)
    a = _mapping(assign_shuffled(docs, "doc_id", 8, seed=0))
    b = _mapping(assign_shuffled(docs, "doc_id", 8, seed=1))
    assert set(a) == set(b)  # same corpus
    assert a != b  # different deal
    # the deal is balanced-ish under both seeds: no empty shard at n=500
    for m in (a, b):
        shards = {v[0] for v in m.values()}
        assert shards == set(range(8))


def test_manifest_query_matches_export(spark, sf_small, tmp_path):
    """The registered shard_shuffle_manifest query (8 shards, seed 0)
    certifies the same digests export_shuffled writes — the report and
    the artifact cannot drift."""
    from data_integration_pipelines_spark.plans import REGISTRY
    from data_integration_pipelines_spark.sources.shard_export import (
        export_shuffled,
    )

    docs = _docs(spark, sf_small)
    manifest = export_shuffled(
        docs, str(tmp_path / "shards"), key_col="doc_id", n_shards=8, seed=0
    )
    rows = REGISTRY["shard_shuffle_manifest"].fn(spark, sf_small).collect()
    assert len(rows) == 8
    for r in rows:
        meta = manifest["shards"][r["shard"]]
        assert meta["n_rows"] == r["n_docs"]
        assert meta["order_md5"] == r["order_md5"]


def test_corpus_distinct_ngrams_invariants(spark, sf_small):
    """Structural invariants of distinct-n: every doc contributes
    len(toks) unigrams and len(toks)-1 bigrams, so per lang
    n_bigrams == n_tokens - n_docs; distinct counts never exceed
    totals; ratios land in (0, 1e6]."""
    from data_integration_pipelines_spark.plans import REGISTRY

    docs = _docs(spark, sf_small)
    n_docs = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    rows = REGISTRY["corpus_distinct_ngrams"].fn(spark, sf_small).collect()
    assert {r["lang"] for r in rows} == set(n_docs)
    for r in rows:
        assert r["n_bigrams"] == r["n_tokens"] - n_docs[r["lang"]]
        assert 0 < r["n_distinct_unigrams"] <= r["n_tokens"]
        assert 0 < r["n_distinct_bigrams"] <= r["n_bigrams"]
        assert 0 < r["distinct1_e6"] <= 1_000_000
        assert 0 < r["distinct2_e6"] <= 1_000_000
        # bigrams are strictly more diverse than unigrams on real text
        assert r["n_distinct_bigrams"] >= r["n_distinct_unigrams"]
