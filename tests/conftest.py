from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "realdeps: exercises an optional real dependency (openpyxl/h5py/"
        "PIL) branch; skips via importorskip where the dep is absent",
    )


@pytest.fixture(scope="session")
def spark():
    from data_integration_pipelines_spark.session import get_spark

    spark = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium() -> str:
    return SF_MEDIUM
