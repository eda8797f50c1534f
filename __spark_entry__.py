"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query: build the same-brand co-order part
graph from sf0.001, PageRank it with the engine's iterative kernel,
return the top-20 parts by score with names.

``queries()`` / ``oracle_sql()`` — the full registry from
``citation_graph_spark.operators`` (relational §2 inventory, text
analysis, dedup family, similarity search, graph kernels). Queries
without an oracle entry are the iterative-kernel runs on the
synthesized corpus (non-SQL-expressible; exactness covered by pytest
oracles in tests/oracles.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citation_graph_spark import operators  # noqa: E402

operators.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the part co-order graph at sf0.001."""
    from citation_graph_spark.operators.graphq import part_graph_edges
    from citation_graph_spark.graph import pagerank
    from citation_graph_spark.tables import load_tables

    sf_dir = "/root/testdata/sf0.001"
    edges = part_graph_edges(spark, sf_dir)
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    ranks = pagerank(sym, alpha=0.85, tol=1e-8, max_iter=50)
    part = load_tables(spark, sf_dir)["part"]
    top = (
        ranks.join(part, ranks["vid"] == part["p_partkey"])
        .select("vid", "p_name", "p_brand", F.col("score"))
        .orderBy(F.desc("score"), F.asc("vid"))
        .limit(20)
    )
    return top


# Driver-gate sampling is first-N (N=50) in dict order. Round-5 refresh
# (VERDICT r4 "Next round" #2): the front 50 = the four round-4 hash-red
# rows whose oracles were re-typed to BIGINT this round (must flip to
# green), then every oracle-backed query with NO driver row in any
# CORRECTNESS_r0{1..4}.json, then the 20 queries whose newest driver row
# is r1 — computed mechanically from the four committed gate artifacts.
# Rows-only (no-oracle) queries sort last so they never burn a sample
# slot on an `err:"no_oracle"` row (VERDICT r4 "What's wrong" #4).
_GATE_PRIORITY = [
    "corpus_repo_graph", "corpus_repo_reciprocity", "bm25_search",
    "graph_part_closeness",
    # round-5 additions (never gated): the hub-capped wedge variant
    # and the d=512 high-dim kNN gate variant
    "corpus_cocitation_capped", "knn_cosine_topk_d512",
    "corpus_random_walks", "corpus_assortativity",
    "corpus_neighborhood_function", "graph_part_louvain_move",
    "graph_part_ktruss", "graph_part_betweenness",
    "corpus_cocitation_incremental", "corpus_scc", "corpus_cocitation",
    "corpus_bib_coupling", "corpus_link_predict_ra",
    "corpus_neighbor_jaccard", "corpus_katz", "corpus_h_index",
    "corpus_self_citation", "hdbscan_embedding_ivf", "doc_repetition",
    "benchmark_contamination", "docs_without_boilerplate",
    "doc_split_assign", "lang_stratified_sample", "lang_id_heuristic",
    "doc_fingerprints", "top_terms_per_lang", "token_histogram",
    "bpe_pair_counts", "segment_union_tagged",
    "building_without_1996_orders", "customers_ordering_and_active",
    "order_event_totals", "latest_event_per_user_type", "order_price_bands",
    "normalized_part_names", "customer_uid_sha", "orders_by_month_1996",
    "docs_mentioning_spark", "top_revenue_customers", "event_sessions",
    "brand_price_quantiles", "segments_per_nation", "knn_cosine_topk",
    "ann_sign_lsh", "embedding_centroids", "ann_ivf",
    # ---- below the 50-sample line ----
    "token_counts", "text_quality",
    "pii_redaction", "doc_chunks", "corpus_mixture", "context_packing",
    "latest_order_per_customer", "asof_view_before_purchase",
    "customers_without_big_orders", "brands_with_supply",
    "nation_trade_pairs", "co_suppliers", "graph_part_degrees",
    "graph_part_components", "graph_part_triangles", "graph_part_pagerank",
    "graph_part_label_prop", "graph_part_bfs", "graph_part_ppr",
    "graph_part_kcore", "graph_part_clustering_coeff",
    "graph_part_label_prop_weighted", "graph_part_degree_histogram",
    "graph_part_harmonic", "graph_part_sssp", "graph_part_hits",
    "corpus_edges", "corpus_pagerank", "corpus_components",
    "corpus_label_prop", "corpus_triangles", "graph_part_modularity",
    "cluster_assign_seed", "cluster_calinski_harabasz",
    "cluster_davies_bouldin", "cluster_silhouette", "dbscan_embedding",
    "single_linkage_embedding", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_embedding_ivf", "dedup_embedding_cosine", "dedup_groups_minhash",
    "dbscan_embedding_ivf", "single_linkage_embedding_ivf",
    "hdbscan_embedding", "props_json_stats", "event_props_exploded",
    "embedding_xy", "fuzzy_part_names", "multimodal_metadata",
    "pricing_summary", "orders_per_customer_min", "nation_customer_stats",
    "brand_top_parts", "graph_part_partition_refine",
    "graph_part_partition_quality", "inverted_index_terms",
    "proximity_pair_docs", "graph_part_louvain_two_level",
    "event_view_purchase_attr", "corpus_repo_pagerank",
    "corpus_repo_profile", "corpus_repo_scc", "corpus_repo_generations",
    "graph_part_multilevel_partition", "graph_part_spectral_bisect",
    "graph_part_coarsen", "graph_part_edge_betweenness", "graph_part_msf",
    "graph_part_msf_weighted", "graph_part_path_trace",
    "graph_part_four_cliques", "span_dedup_ngram", "revenue_rollup",
    "corpus_link_predict_cn", "bipartite_butterflies",
    "corpus_densest_subgraph", "graph_part_mis", "graph_part_matching",
    "graph_part_vertex_cover", "dedup_sorted_neighborhood",
    "graph_part_widest_path", "graph_part_coloring", "event_funnel",
    "event_transitions", "event_retention_cohorts", "corpus_g_index",
    "doc_weighted_sample", "corpus_rich_club", "corpus_reciprocity",
    "doc_bigram_typicality", "doc_keywords_tfidf", "corpus_wl_refinement",
    "graph_part_eigenvector", "corpus_eigenvector",
    "corpus_distance_distribution", "corpus_neighbor_sample",
    "corpus_generations", "bpe_learn_merges", "bpe_encode_docs",
    "corpus_hyperball", "umap_xy", "doc_topics_lda", "doc_topics_nmf",
    "kmeans_model_selection", "kmeans_pareto_front", "pca_xy", "tsne_xy",
    "embedding_kmeans",
]

def _prioritized(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(operators.QUERIES))


def oracle_sql() -> dict[str, str]:
    # the corpus_* oracles read the deterministic corpus from a stable
    # parquet path; materialize it here so the SQL is runnable even if
    # the driver evaluates oracles before (or without) the Spark side
    from citation_graph_spark.fixtures.corpus import ensure_corpus_parquet
    from citation_graph_spark.operators.graphq import _CORPUS_DOCS, _CORPUS_SEED

    ensure_corpus_parquet(_CORPUS_DOCS, _CORPUS_SEED)
    return _prioritized(dict(operators.ORACLES))
