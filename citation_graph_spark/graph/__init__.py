from citation_graph_spark.graph.ids import assign_dense_ids
from citation_graph_spark.graph.degrees import out_degrees, in_degrees, undirect
from citation_graph_spark.graph.pagerank import pagerank
from citation_graph_spark.graph.components import connected_components
from citation_graph_spark.graph.communities import label_propagation
from citation_graph_spark.graph.triangles import four_clique_counts, triangle_counts
from citation_graph_spark.graph.coloring import greedy_coloring
from citation_graph_spark.graph.matching import maximal_matching
from citation_graph_spark.graph.mis import maximal_independent_set
from citation_graph_spark.graph.densest import (
    densest_subgraph_rounds,
    densest_subgraph_vertices,
)
from citation_graph_spark.graph.traversal import (
    bfs_distances,
    bfs_per_source,
    personalized_pagerank,
    sssp,
    widest_paths,
)
from citation_graph_spark.graph.kcore import k_core
from citation_graph_spark.graph.ktruss import k_truss
from citation_graph_spark.graph.spectral import fiedler_scores, spectral_bisect
from citation_graph_spark.graph.betweenness import (
    betweenness_sampled,
    edge_betweenness_sampled,
)
from citation_graph_spark.graph.eigenvector import eigenvector_centrality
from citation_graph_spark.graph.hits import hits
from citation_graph_spark.graph.katz import katz_centrality
from citation_graph_spark.graph.scc import strongly_connected_components
from citation_graph_spark.graph.anf import exact_balls, hyperball
from citation_graph_spark.graph.louvain import louvain_local_moves
from citation_graph_spark.graph.walks import deterministic_walks, neighbor_sample
from citation_graph_spark.graph.wl import wl_refinement

__all__ = [
    "assign_dense_ids",
    "out_degrees",
    "in_degrees",
    "undirect",
    "pagerank",
    "connected_components",
    "label_propagation",
    "four_clique_counts",
    "densest_subgraph_rounds",
    "maximal_independent_set",
    "maximal_matching",
    "greedy_coloring",
    "densest_subgraph_vertices",
    "triangle_counts",
    "bfs_distances",
    "bfs_per_source",
    "personalized_pagerank",
    "k_core",
    "k_truss",
    "betweenness_sampled",
    "edge_betweenness_sampled",
    "fiedler_scores",
    "spectral_bisect",
    "hits",
    "katz_centrality",
    "strongly_connected_components",
    "sssp",
    "widest_paths",
    "exact_balls",
    "hyperball",
    "louvain_local_moves",
    "deterministic_walks",
    "eigenvector_centrality",
    "neighbor_sample",
    "wl_refinement",
]
