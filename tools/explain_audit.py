"""Physical-plan audit → PLANS.md.

Captures `.explain("formatted")` for representative queries and greps
the properties that matter at 100 TB: predicate pushdown reaching the
scan (PushedFilters), column pruning (ReadSchema), broadcast vs
shuffle joins, whole-stage codegen coverage, and exchange counts.
Run after plan-affecting changes; the committed PLANS.md is the
reviewed state.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

AUDIT = [
    ("pricing_summary", "fact scan + wide aggregate: filter must reach the scan"),
    ("nation_trade_pairs", "star join: every dimension must broadcast"),
    ("top_revenue_customers", "fact-fact join + dim broadcast + windowed top-k"),
    ("asof_view_before_purchase", "keyed range join + window rank"),
    ("dedup_minhash_lsh", "shingle pipeline + band-signature equi-join"),
    ("knn_cosine_topk", "broadcast query batch over candidate scan"),
    ("graph_part_degrees", "edge derivation + symmetric closure + count"),
    ("dedup_simhash_pairs", "banded fingerprint equi-join + popcount verify"),
    ("dedup_embedding_ivf", "IVF bucket self-join + exact-cosine verify"),
    ("cluster_silhouette", "O(n·k) metric: per-cluster aggregates broadcast back"),
    ("event_props_exploded", "MapType explode + aggregate"),
    ("lang_stratified_sample", "hash-filter sample: ReadSchema must prune to (doc_id, lang)"),
    ("doc_split_assign", "pure column-expression split + rollup: one exchange"),
    ("tsne_xy", "landmark t-SNE transform: broadcast + mapInPandas, zero exchanges"),
    ("umap_xy", "landmark UMAP transform: broadcast + mapInPandas, zero exchanges"),
    ("pca_xy", "mapInPandas Gram moments + zip_with projection: zero exchanges, no Generate"),
    ("graph_part_modularity", "LP labels + degree/intra aggs; only nested-loop is the 1-row total broadcast"),
    ("eps_pairs_ivf", "density-family ε-join, IVF mode: inverted-list equi-join + exact verify, no cartesian"),
    ("mutual_reachability_ivf", "hdbscan graph lineage: ε-pairs → core window → greatest() join"),
    ("boruvka_round", "one MSF nomination round: 2 joins + union + window, bounded exchanges"),
    ("doc_repetition", "Gopher repetition signals: token explode partial-agg + no-Generate trigram distinctness, one doc_id shuffle"),
    ("benchmark_contamination", "decontamination probe: eval-shingle side must BROADCAST (lineage audited pre-checkpoint)"),
    ("pii_redaction", "PII count+scrub: pure regexp column expressions, zero exchanges"),
    ("doc_chunks", "context-window chunking: per-row transform + posexplode, zero exchanges"),
    ("corpus_mixture", "mixture/epoch weighting: when-chain weights + sequence explode, zero exchanges"),
    ("context_packing", "sequence packing: shard-window cumsum, ONE exchange on the shard key"),
    ("bpe_pair_counts", "BPE pair stats: pair explode + map-side-combined groupBy + TakeOrdered top-k"),
    ("corpus_cocitation", "bibliometric wedge self-join keyed on the citing doc: equi-join + count, no cartesian"),
    ("corpus_link_predict_ra", "wedge join + degree join + anti-join vs adjacency: all equi-joins on well-spread keys"),
    ("corpus_h_index", "in-citation count + per-repo window + max: two exchanges"),
    ("katz_round", "one Katz round: state join on pinned edge layout + one groupBy shuffle"),
    ("ktruss_support_round", "one k-truss peel round post-orientation: wedge/closure equi-joins + support groupBy, orientation shuffle REUSED"),
    ("betweenness_forward_round", "Brandes forward round: frontier⨝edges + settled anti-join + sigma groupBy"),
    ("betweenness_backward_round", "Brandes backward round: finalized level⨝edges + ratio groupBy + left join to receivers"),
    ("hyperball_round", "one HyperBall round: edges⨝registers equi-join + grouped register max — O(E·m) rows behind one vertex-keyed shuffle"),
    ("walk_round", "one walk step: frontier⨝edges equi-join + per-walk hash-argmin window"),
    ("louvain_round", "one Louvain local-move round: volume/k(v,c) grouped aggs + equi-joins + per-vertex window argmax"),
    ("generation_relax_round", "one condensation-DAG relaxation: equi-join + grouped max + left-join merge"),
    ("corpus_assortativity", "degree assortativity: two degree joins + one global moment agg"),
    ("corpus_distance_distribution", "ANF rollup: radius-keyed agg + 1-row total/eff-r broadcasts, no real cartesian"),
    ("corpus_neighbor_sample", "GraphSAGE sampling: per-hop src-window rank + frontier equi-joins, no cartesian"),
    ("wl_round", "one WL refinement round: edges⨝colors equi-join + vertex-keyed multiset-hash sum + merge join"),
    ("ev_round", "one eigenvector power round: edges⨝state equi-join + vertex-keyed int64 sum"),
    ("graph_part_closeness", "sampled closeness: per-source BFS + reached/sum-dist agg, integer division"),
    ("four_clique_lineage", "kClist ordered expansion: 6 equi-joins over the oriented DAG, no cartesian"),
    ("span_dedup_ngram", "span-level exact-substring dedup: gram explode + map-side-combined counts, gram/doc_id keyed shuffles only"),
    ("revenue_rollup", "grouping-sets rollup: one Expand + hash-aggregate pass, dims broadcast"),
    ("bipartite_butterflies", "bipartite 2x2-biclique counts: part-centered wedge self-join + pair groupBy, no cartesian"),
    ("corpus_link_predict_cn", "CN/PA/Salton predictors: wedge join + degree joins + anti-join, all keyed"),
    ("doc_bigram_typicality", "bigram LM train+score in one pass: bigram/w1/doc_id keyed shuffles only"),
    ("densest_peel_round", "one densest-subgraph peel round: degree threshold + two semi-joins of the edge state"),
    ("mis_round", "one Luby MIS round: two semi-joins + neighbor-min groupBy + winner filter"),
    ("matching_round", "one matching round: endpoint windows + (a,b) groupBy conjunction"),
    ("dedup_sorted_neighborhood", "sorted-neighborhood dedup: range-exchange rank + block-keyed window pairing + shingle verify"),
    ("doc_keywords_tfidf", "TF-IDF keywords: two map-side aggregates + term-keyed join + per-doc top-5 window"),
    ("doc_weighted_sample", "systematic weighted sample: one range exchange + per-range cumsum + broadcast offsets"),
    ("event_transitions", "Markov transition counts: one user-keyed window + one pair rollup"),
    ("event_retention_cohorts", "retention triangle: user-keyed min + distinct + join + tiny rollup"),
    ("bm25_search", "integer BM25: token explode + two map-side aggs + broadcast df join + global top-k window"),
    ("edge_betweenness_final", "edge betweenness final agg: canonical edges ⨝ Brandes state ×2 + (a,b) groupBy — rounds covered by the betweenness entries"),
    ("path_parents", "shortest-path parent table: dist ⨝ sym ⨝ dist equi-joins + min-parent groupBy (BFS rounds audited separately)"),
    ("fiedler_round", "one Fiedler M·x round: state ⨝ weighted self-loop edges + vertex-keyed int64 sum"),
    ("inverted_index_terms", "positional postings: posexplode + term filter on the generated column + (doc_id, term) groupBy"),
    ("proximity_pair_docs", "proximity search: doc_id-keyed positions self-join, distance predicate rides the equi-join"),
    ("graph_part_coarsen", "matching contraction: supervertex map joins + quotient-pair groupBy (matching rounds audited separately)"),
    ("corpus_repo_graph", "repo dependency quotient: vid-keyed vertex joins + repo-pair groupBy + per-source share window"),
    ("corpus_repo_profile", "per-repo cohesion panel: vid-keyed joins + repo rollups + left-join merge"),
    ("event_view_purchase_attr", "attribution join: user-keyed equi-join, event-time range rides the key"),
    # round 5
    ("knn_cosine_topk_d512", "d=512 brute kNN: broadcast query batch over candidate scan, same shape as the 64-dim baseline at 8x width"),
    ("corpus_cocitation_capped", "hub-capped wedge: per-center row_number truncation BEFORE the self-join — bounded per-center emission"),
]


def _lineage(spark, name: str):
    """Builders for audit entries that are internal lineages rather than
    registered queries (registered outputs that localCheckpoint, or
    per-round kernel bodies)."""
    from citation_graph_spark.tables import load_tables

    if name == "fiedler_round":
        from citation_graph_spark.graph.spectral import fiedler_round_lineage

        syms = spark.createDataFrame(
            [(0, 1, 1), (1, 0, 1), (0, 0, 3), (1, 1, 3)],
            "src long, dst long, w long",
        )
        x = spark.createDataFrame([(0, -3), (1, -2)], "vid long, x long")
        return fiedler_round_lineage(syms, x)
    if name == "edge_betweenness_final":
        from pyspark.sql import functions as F

        from citation_graph_spark.graph.betweenness import (
            edge_dependency_lineage,
        )
        from citation_graph_spark.graph.degrees import undirect
        from citation_graph_spark.operators.graphq import part_graph_edges

        e = undirect(part_graph_edges(spark, SF_DIR).select("src", "dst"))
        # plan-shape stand-in for the checkpointed Brandes state: same
        # schema and a real distributed lineage, no kernel execution
        done = (
            e.select(F.col("src").alias("vid"))
            .distinct()
            .select(
                F.col("vid").alias("s"),
                "vid",
                F.lit(0).alias("dist"),
                F.lit(1).cast("long").alias("sigma"),
                F.lit(0.0).alias("delta"),
            )
        )
        return edge_dependency_lineage(e, done)
    if name == "path_parents":
        from pyspark.sql import functions as F

        from citation_graph_spark.graph.degrees import undirect
        from citation_graph_spark.operators.graphq import part_graph_edges

        sym = undirect(part_graph_edges(spark, SF_DIR).select("src", "dst"))
        # fresh lineage for the dist side (mirrors the checkpointed BFS
        # output in the registered query)
        dist = (
            undirect(part_graph_edges(spark, SF_DIR).select("src", "dst"))
            .select(F.col("src").alias("vid"))
            .distinct()
            .select("vid", (F.col("vid") % 5).cast("int").alias("dist"))
        )
        return (
            dist.alias("dv")
            .join(sym, F.col("dv.vid") == sym["dst"])
            .join(
                dist.alias("du"),
                (F.col("du.vid") == sym["src"])
                & (F.col("du.dist") == F.col("dv.dist") - 1),
            )
            .groupBy(F.col("dv.vid").alias("v"))
            .agg(F.min(F.col("du.vid")).alias("p"))
        )
    if name == "dedup_simhash_pairs":
        # the registered query materializes via localCheckpoint;
        # audit the lineage it materializes
        from citation_graph_spark.operators.dedup import (
            _simhash_sigs,
            simhash_pair_lineage,
        )

        return simhash_pair_lineage(
            _simhash_sigs(load_tables(spark, SF_DIR)["documents"])
        )
    if name == "eps_pairs_ivf":
        from citation_graph_spark.operators.dbscan import _EPS2, eps_pairs

        return eps_pairs(
            load_tables(spark, SF_DIR)["embeddings"], _EPS2, candidates="ivf"
        )
    if name == "mutual_reachability_ivf":
        from citation_graph_spark.operators.dbscan import eps_pairs
        from citation_graph_spark.operators.density import (
            _EPS2_MAX,
            _MIN_SAMPLES,
            core_distances,
            mr_lineage,
        )

        pairs = eps_pairs(
            load_tables(spark, SF_DIR)["embeddings"],
            _EPS2_MAX,
            candidates="ivf",
            keep_dist2=True,
        )
        return mr_lineage(pairs, core_distances(pairs, _MIN_SAMPLES))
    if name == "boruvka_round":
        from citation_graph_spark.graph.msf import nomination_lineage, normalize_edges

        e = normalize_edges(
            spark.createDataFrame(
                [(1, 2, 5), (2, 3, 1)], "src long, dst long, w long"
            )
        )
        labels = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3)], "vid long, comp long"
        )
        return nomination_lineage(e, labels)
    if name == "katz_round":
        from citation_graph_spark.graph.katz import round_lineage

        e = spark.createDataFrame(
            [(1, 2), (2, 3)], "src long, dst long"
        ).repartition(4, "src")
        state = spark.createDataFrame(
            [(1, 1.0), (2, 1.0), (3, 1.0)], "vid long, x double"
        ).repartition(4, "vid")
        return round_lineage(e, state, alpha=0.001, beta=1.0)
    if name == "ktruss_support_round":
        from citation_graph_spark.graph.ktruss import _support_from_oriented

        o = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (3, 4)], "u long, v long"
        ).repartition(4, "u")
        return _support_from_oriented(o)
    if name == "betweenness_forward_round":
        from citation_graph_spark.graph.betweenness import forward_round_lineage

        e = spark.createDataFrame(
            [(1, 2), (2, 3)], "src long, dst long"
        ).repartition(4, "src").localCheckpoint(eager=True)
        reach = spark.createDataFrame(
            [(1, 1, 0, 1)], "s long, vid long, dist int, sigma long"
        ).repartition(4, "s", "vid").localCheckpoint(eager=True)
        return forward_round_lineage(e, reach, reach, 1)
    if name == "betweenness_backward_round":
        from citation_graph_spark.graph.betweenness import backward_round_lineage

        e = spark.createDataFrame(
            [(1, 2), (2, 3)], "src long, dst long"
        ).repartition(4, "src").localCheckpoint(eager=True)
        cur = spark.createDataFrame(
            [(1, 1, 0, 1)], "s long, vid long, dist int, sigma long"
        ).repartition(4, "s", "vid").localCheckpoint(eager=True)
        done = spark.createDataFrame(
            [(1, 2, 1, 1, 0.0)],
            "s long, vid long, dist int, sigma long, delta double",
        ).repartition(4, "s", "vid").localCheckpoint(eager=True)
        return backward_round_lineage(e, done, cur, 0)
    if name == "hyperball_round":
        from citation_graph_spark.graph.anf import hyperball_round_lineage

        e = spark.createDataFrame(
            [(1, 2), (2, 3)], "src long, dst long"
        ).repartition(4, "src").localCheckpoint(eager=True)
        regs = spark.createDataFrame(
            [(1, 0, 1), (2, 5, 2), (3, 9, 1)], "vid long, idx int, rho int"
        ).repartition(4, "vid").localCheckpoint(eager=True)
        return hyperball_round_lineage(e, regs)
    if name == "walk_round":
        from citation_graph_spark.graph.walks import walk_round_lineage

        e = spark.createDataFrame(
            [(1, 2), (2, 3)], "src long, dst long"
        ).repartition(4, "src").localCheckpoint(eager=True)
        fr = spark.createDataFrame(
            [(1, 0, 1)], "wid long, step int, v long"
        ).localCheckpoint(eager=True)
        return walk_round_lineage(e, fr, 1)
    if name == "louvain_round":
        from citation_graph_spark.graph.louvain import louvain_round_lineage

        sym = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
        ).repartition(4, "src").localCheckpoint(eager=True)
        deg = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 1)], "vid long, d long"
        ).repartition(4, "vid").localCheckpoint(eager=True)
        comm = deg.selectExpr("vid", "vid AS community").localCheckpoint(
            eager=True
        )
        return louvain_round_lineage(sym, deg, comm, 2)
    if name == "generation_relax_round":
        from citation_graph_spark.operators.topology import (
            generation_relax_lineage,
        )

        q = spark.createDataFrame(
            [(1, 2), (2, 3)], "csrc long, cdst long"
        ).localCheckpoint(eager=True)
        gen = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 0)], "c long, generation int"
        ).localCheckpoint(eager=True)
        return generation_relax_lineage(q, gen)
    if name == "wl_round":
        from citation_graph_spark.graph.wl import wl_round_lineage

        sym = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
        ).repartition(4, "src").localCheckpoint(eager=True)
        colors = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 1)], "vid long, color long"
        ).repartition(4, "vid").localCheckpoint(eager=True)
        return wl_round_lineage(sym, colors)
    if name == "ev_round":
        from citation_graph_spark.graph.eigenvector import (
            eigenvector_round_lineage,
        )

        sym2 = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 1), (2, 2)], "src long, dst long"
        ).repartition(4, "src").localCheckpoint(eager=True)
        x = spark.createDataFrame(
            [(1, 1000000), (2, 1000000)], "vid long, x long"
        ).repartition(4, "vid").localCheckpoint(eager=True)
        return eigenvector_round_lineage(sym2, x)
    if name == "benchmark_contamination":
        from citation_graph_spark.operators.dedup import (
            _shingles,
            contamination_lineage,
        )

        return contamination_lineage(
            _shingles(load_tables(spark, SF_DIR)["documents"])
        )
    if name == "four_clique_lineage":
        from pyspark.sql import functions as F

        from citation_graph_spark.graph.triangles import (
            four_clique_lineage,
            oriented_edges,
        )
        from citation_graph_spark.operators.graphq import part_graph_edges

        edges = part_graph_edges(spark, SF_DIR)
        verts = edges.select(F.col("src").alias("vid")).distinct()
        return four_clique_lineage(oriented_edges(edges), vertices=verts)
    if name == "densest_peel_round":
        from pyspark.sql import functions as F

        from citation_graph_spark.graph.densest import peel_round_lineage

        alive = (
            spark.createDataFrame(
                [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
            )
            .repartition(4, "src")
            .localCheckpoint(eager=True)
        )
        deg = alive.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        deg = deg.localCheckpoint(eager=True)
        return peel_round_lineage(alive, deg, 3, 4)
    if name == "matching_round":
        from citation_graph_spark.graph.matching import matching_round_lineage

        act = (
            spark.createDataFrame(
                [(1, 2, 17), (2, 3, 29), (1, 3, 41)],
                "a long, b long, m long",
            )
            .repartition(4, "a")
            .localCheckpoint(eager=True)
        )
        return matching_round_lineage(act, 1)
    if name == "mis_round":
        from citation_graph_spark.graph.mis import mis_round_lineage

        e = (
            spark.createDataFrame(
                [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
            )
            .repartition(4, "src")
            .localCheckpoint(eager=True)
        )
        active = (
            spark.createDataFrame([(1,), (2,), (3,)], "vid long")
            .repartition(4, "vid")
            .localCheckpoint(eager=True)
        )
        return mis_round_lineage(e, active, 1)
    return None


def main() -> None:
    from citation_graph_spark.session import get_spark
    from citation_graph_spark import operators

    operators.load_all()
    spark = get_spark(
        app_name="explain-audit",
        # AQE defers physical decisions to runtime and hides codegen
        # markers in pre-execution plans; audit the static plan
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )

    out = ["# PLANS — physical-plan audit of representative queries\n"]
    out.append(
        "Generated by tools/explain_audit.py. Summary lines list the\n"
        "scale-relevant plan properties; full formatted plans follow.\n"
    )
    from citation_graph_spark.planaudit import plan_stats

    for name, why in AUDIT:
        df = _lineage(spark, name)
        if df is None:
            df = operators.QUERIES[name](spark, SF_DIR)
        s = plan_stats(df)
        out.append(f"\n## {name}\n\n*{why}*\n")
        out.append(
            f"- exchanges: {s['exchanges']}; joins: {s['broadcast_joins']} broadcast, "
            f"{s['shuffled_hash_joins']} shuffled-hash, {s['sort_merge_joins']} sort-merge; "
            f"whole-stage-codegen spans: {s['codegen_spans']}"
        )
        for p in set(s["pushed"]):
            out.append(f"- PushedFilters: [{p}]")
        for r in set(s["read_schemas"]):
            out.append(f"- ReadSchema: {r}")
        out.append("\n```\n" + s["formatted"].strip() + "\n```")

    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
