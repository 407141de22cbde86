from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from hybrid_data_lakehouse_lab_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("pytest", shuffle_partitions=8)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
