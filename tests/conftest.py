from __future__ import annotations

import pytest

from sparkcheck.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sparkcheck-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s


@pytest.fixture(autouse=True)
def _pin_session_conf(request):
    """Tests share one JVM SparkSession, but code under test may
    legitimately call get_spark() itself (the CLI entrypoints do) —
    getOrCreate applies builder confs onto the EXISTING session, so a
    CLI test bumps spark.sql.shuffle.partitions from 4 to 32 for every
    later test. Re-pin the session defaults before each test so plan
    shapes don't depend on test file ordering."""
    if "spark" not in request.fixturenames:
        yield
        return
    s = request.getfixturevalue("spark")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    yield
