from __future__ import annotations

import pytest

from pulsar_elasticsearch_sync_rs_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pytest", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def spark_global(spark):
    """Alias used by hypothesis tests (function-scoped @given cannot
    take function-scoped fixtures; session scope is fine)."""
    return spark
