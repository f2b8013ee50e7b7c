from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from hfp_loader_spark.session import get_spark

    spark = get_spark(app_name="hfp_loader_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    """Smallest driver-provided scale factor for fast tests."""
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
