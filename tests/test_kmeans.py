"""MLlib k-means entry: deterministic under fixed seed, sane clusters."""

from __future__ import annotations

from citation_graph_spark.operators import QUERIES, load_all

load_all()
SF_DIR = "/root/testdata/sf0.001"


def test_kmeans_deterministic_and_covering(spark):
    a = {r["vec_id"]: r["cluster"] for r in QUERIES["embedding_kmeans"](spark, SF_DIR).collect()}
    b = {r["vec_id"]: r["cluster"] for r in QUERIES["embedding_kmeans"](spark, SF_DIR).collect()}
    assert a == b  # fixed seed → identical assignment
    assert len(a) == 500
    assert 2 <= len(set(a.values())) <= 10
