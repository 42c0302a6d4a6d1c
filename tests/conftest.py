from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from duwamish_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("duwamish-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def vertices_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")
