from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ups_crossref_etl_spark.session import get_spark
from ups_crossref_etl_spark.sources.lake import assert_testdata_shape

SF_SMOKE = "/root/testdata/sf0.001"

# Testdata-drift sentinel, at collection time (no JVM): an events.ts
# encoding the readers don't handle must fail the whole run loudly —
# round 4 built on stale artifacts after a silent regeneration.
assert_testdata_shape(SF_SMOKE)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
