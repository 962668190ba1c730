from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Deliberately a BARE session, NOT our get_spark factory: the
    # driver's correctness harness builds its own SparkSession without
    # our correctness confs (round-1 postmortem: nanosAsLong missing →
    # 12 red rows). Running the whole suite on a driver-like session
    # forces every engine entry point to self-heal at runtime.
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.appName("fpdr-tests")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
