from __future__ import annotations

import pytest

from maillog2db_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("maillog2db_spark_tests", cpus=4)
    yield s
    s.stop()


def pytest_collection_modifyitems(config, items):
    """Tier the measured-slow tests (tests/slow_tier.txt, r11) behind
    the ``slow`` marker so the default gate finishes in ~1/3 of the
    full-suite wall time; ``-m slow`` runs the tiered set, ``-m ""``
    runs everything."""
    import os

    path = os.path.join(os.path.dirname(__file__), "slow_tier.txt")
    with open(path) as f:
        slow = {line.strip() for line in f if line.strip()}
    for item in items:
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)
