"""CSR-block PageRank must agree with the join/groupBy kernel exactly
(same semantics, different message-generation physics) and with the
single-node numpy oracle."""

from __future__ import annotations

from conftest import edges_df
from citation_graph_spark.fixtures import documents_spark_df
from citation_graph_spark.graph.ids import build_vertices
from citation_graph_spark.extraction import build_edges
from citation_graph_spark.graph import pagerank
from citation_graph_spark.graph.csr import pagerank_csr


def _scores(df):
    return {r["vid"]: r["score"] for r in df.collect()}


def test_csr_matches_join_kernel_small(spark):
    edges = edges_df(
        spark,
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (4, 0), (1, 0, 2.0)],
    )
    a = _scores(pagerank(edges, tol=1e-10, max_iter=300))
    b = _scores(pagerank_csr(edges, tol=1e-10, max_iter=300))
    assert a.keys() == b.keys()
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12, (v, a[v], b[v])


def test_csr_matches_join_kernel_corpus(spark):
    docs = documents_spark_df(spark, 400)
    verts = build_vertices(docs).cache()
    edges = build_edges(docs, verts).cache()
    a = _scores(pagerank(edges, verts.select("vid"), tol=1e-8))
    b = _scores(pagerank_csr(edges, verts.select("vid"), tol=1e-8))
    assert a.keys() == b.keys()
    for v in a:
        assert abs(a[v] - b[v]) < 1e-9, (v, a[v], b[v])
