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


def pytest_collection_modifyitems(config, items):
    """Two test profiles (round-13 verdict item: the driver's pytest
    budget expired at ~82% of the 38-minute full suite, so a green run
    could not be confirmed).

    - Default: everything NOT marked ``full`` — smoke + per-operator
      units + a representative oracle-parity sample; completes in
      minutes.
    - Full (``FPDR_FULL_TESTS=1``): every test, including the
      232-query oracle-parity sweep. The same sweep also runs
      standalone as ``tools/gate_run.py`` (the registry gate), so the
      default profile defers — never deletes — that coverage.
    """
    if os.environ.get("FPDR_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="full profile only — set FPDR_FULL_TESTS=1 (coverage also"
        " runs via tools/gate_run.py)"
    )
    for item in items:
        if item.get_closest_marker("full"):
            item.add_marker(skip)
