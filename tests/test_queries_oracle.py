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
