from __future__ import annotations

import pytest

from etl_global_mobility_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: per-round soak tests (scale properties with runtime budgets)",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


SF_DIRS = {
    "smoke": "/root/testdata/sf0.001",
    "correctness": "/root/testdata/sf0.01",
    "bench": "/root/testdata/sf0.1",
}


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_DIRS["smoke"]


@pytest.fixture(scope="session")
def sf_correctness():
    return SF_DIRS["correctness"]
