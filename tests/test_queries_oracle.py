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
