from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from lakehouse_spark_spark.session import get_session, tune_for_oracle

    s = get_session("tests", cpus=4)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    tune_for_oracle(s)
    yield s


SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
