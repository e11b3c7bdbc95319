from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sarpro_spark.session import build_session

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Small fixed parallelism keeps test startup/shuffle overhead low; the
    # operators themselves are written for arbitrary partition counts.
    s = build_session("sarpro_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture()
def nanos_conf_reset(spark):
    """r9 (ADVICE r8): tests that flip spark.sql.legacy.parquet.nanosAsLong
    mid-test (streaming file sources need 'false'; frames.load_table sets
    'true' for the events table's TIMESTAMP(NANOS)) must not leak the flip
    into later tests — unset back to the Spark default at teardown."""
    yield
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
