from __future__ import annotations

import pytest

from maillog2db_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("maillog2db_spark_tests", cpus=4)
    yield s
    s.stop()
