"""Differential tests: every registered query against its DuckDB oracle
at sf0.001 (mirrors the reference's own cross-engine habit — SURVEY §5
item 3 — and the driver's CORRECTNESS gate)."""

from __future__ import annotations

import pytest

from data_integration_pipelines_spark.plans import REGISTRY
from tests.oracle_compare import compare_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_small, name):
    ok, msg = compare_query(spark, REGISTRY[name], sf_small)
    assert ok, f"{name}: {msg}"


def test_persist_heavy_queries_idempotent_in_one_session(spark, sf_small):
    """Re-running the cache-pool-backed queries in ONE session must give
    identical results — guards against persisted-intermediate leakage
    or eviction-order effects (operators/cache.bounded_persist)."""
    from data_integration_pipelines_spark.plans import REGISTRY

    for name in ("ngram_jaccard_pairs", "minhash_lsh_pairs", "simhash_hamming_pairs",
                 "decontaminate", "dup_clusters"):
        q = REGISTRY[name]
        first = sorted(map(tuple, q.fn(spark, sf_small).collect()))
        second = sorted(map(tuple, q.fn(spark, sf_small).collect()))
        assert first == second, name


def test_training_chunks_invariants(spark, sf_small):
    """Concat-and-chunk semantics beyond the oracle hash: every chunk
    but each shard's tail holds exactly 256 tokens, totals conserve the
    corpus token count exactly (boundary splits move tokens, never drop
    or duplicate them), chunk ids are dense from 0 per shard, and a
    chunk's boundary-doc count never exceeds 2 (one doc continuing in +
    one continuing out — contributors BETWEEN the boundaries are whole)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.functions.text import ws_tokens
    from data_integration_pipelines_spark.plans import REGISTRY

    rows = REGISTRY["training_chunks"].fn(spark, sf_small).collect()
    per_source = defaultdict(list)
    for r in rows:
        per_source[r.source].append(r)
    assert per_source
    for source, chunks in per_source.items():
        ids = [c.chunk for c in chunks]
        assert ids == list(range(len(ids))), f"{source}: chunk ids not dense"
        for c in chunks[:-1]:
            assert c.chunk_tokens == 256, f"{source} chunk {c.chunk}"
        assert 1 <= chunks[-1].chunk_tokens <= 256
        assert all(c.n_boundary_docs <= 2 for c in chunks)
        assert all(c.n_docs >= 1 for c in chunks)

    docs = load_table(spark, sf_small, "documents")
    want_totals = {
        r.source: r.total
        for r in docs.select(
            "source", F.size(ws_tokens(F.col("text"))).cast("long").alias("n")
        )
        .filter(F.col("n") > 0)
        .groupBy("source")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    got_totals = {
        s: sum(c.chunk_tokens for c in chunks) for s, chunks in per_source.items()
    }
    assert got_totals == want_totals
