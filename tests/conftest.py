from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from citation_graph_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="cgs-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    yield s


def edges_df(spark, edge_list):
    """[(src, dst[, weight])] → edges DataFrame."""
    rows = [
        (int(e[0]), int(e[1]), float(e[2]) if len(e) > 2 else 1.0)
        for e in edge_list
    ]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def vertices_df(spark, n):
    return spark.range(n).withColumnRenamed("id", "vid")
