import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arkouda_njit_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small local session for tests: tiny data, low shuffle fan-out keeps
    # per-test latency down; production defaults live in session.get_spark.
    s = get_spark(master="local[8]", shuffle_partitions=8, app_name="tests")
    yield s
    s.stop()
