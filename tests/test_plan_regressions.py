"""Plan regressions: the scale-relevant physical-plan properties from
PLANS.md, pinned in CI.  A change that adds a shuffle, drops a
broadcast, breaks scan pushdown/pruning, or introduces a cartesian
product into a non-baseline query fails HERE instead of waiting for a
bench diff.

Ceilings (≤) rather than exact counts where Catalyst has latitude;
structural zeros (no sort-merge in an all-broadcast star, zero
exchanges in a pure column-expression query) are exact."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from citation_graph_spark import operators
from citation_graph_spark.planaudit import plan_stats, static_plans

SF_DIR = "/root/testdata/sf0.001"

operators.load_all()


@pytest.fixture(scope="module")
def stats(spark):
    cache: dict[str, dict] = {}

    def get(name: str) -> dict:
        if name not in cache:
            with static_plans(spark):
                cache[name] = plan_stats(operators.QUERIES[name](spark, SF_DIR))
        return cache[name]

    return get


def test_pricing_summary_scan_and_one_shuffle(stats):
    s = stats("pricing_summary")
    # partial agg → ONE exchange → final agg (2 Exchange nodes incl.
    # the ordering requirement); no joins at all
    assert s["exchanges"] <= 2
    assert s["sort_merge_joins"] == 0 and s["cartesian"] == 0
    # the date filter must reach the parquet scan
    assert any("l_shipdate" in p for p in s["pushed"]), s["pushed"]
    # column pruning: the scan reads the 7 needed columns, never l_comment
    assert s["read_schemas"] and all(
        "l_comment" not in r for r in s["read_schemas"]
    ), s["read_schemas"]


def test_nation_trade_pairs_all_broadcast_star(stats):
    s = stats("nation_trade_pairs")
    assert s["sort_merge_joins"] == 0 and s["shuffled_hash_joins"] == 0
    assert s["cartesian"] == 0
    assert s["broadcast_joins"] >= 4
    assert s["exchanges"] <= 2  # only the final aggregate shuffles


def test_top_revenue_customers_dims_broadcast(stats):
    s = stats("top_revenue_customers")
    assert s["sort_merge_joins"] == 0 and s["cartesian"] == 0
    assert s["broadcast_joins"] >= 2
    assert s["exchanges"] <= 2


def test_asof_join_no_sort_merge(stats):
    s = stats("asof_view_before_purchase")
    assert s["sort_merge_joins"] == 0 and s["cartesian"] == 0
    assert s["exchanges"] <= 2


def test_dedup_minhash_lsh_banded_equi_join(stats):
    s = stats("dedup_minhash_lsh")
    # the whole point of LSH banding: an equi-join on band signatures,
    # never a cartesian similarity join
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 2


def test_dedup_simhash_pairs_banded(spark):
    # the registered query materializes via localCheckpoint, so pin the
    # lineage it materializes instead of the post-checkpoint scan
    from citation_graph_spark.operators.dedup import (
        _simhash_sigs,
        simhash_pair_lineage,
    )
    from citation_graph_spark.tables import load_tables

    with static_plans(spark):
        s = plan_stats(
            simhash_pair_lineage(
                _simhash_sigs(load_tables(spark, SF_DIR)["documents"])
            )
        )
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 5


def test_dedup_embedding_ivf_bucketed(stats):
    s = stats("dedup_embedding_ivf")
    # IVF candidates come from a bucket equi-join; exact verify joins
    # back by vec_id — sub-quadratic end to end
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 10


def test_knn_scan_parallel(stats):
    s = stats("knn_cosine_topk")
    # the 10-query batch broadcasts (BroadcastNestedLoopJoin over the
    # scan is the intended shape: broadcast side is constant-size);
    # the scan side must NOT shuffle before the top-k window
    assert s["sort_merge_joins"] == 0
    assert s["exchanges"] <= 2


def test_sampling_queries_zero_or_min_exchange(stats):
    s = stats("lang_stratified_sample")
    # pure column-expression hash filter: NO exchange at all, scan prunes
    assert s["exchanges"] == 0
    assert s["read_schemas"] and all(
        "content" not in r for r in s["read_schemas"]
    ), s["read_schemas"]

    s2 = stats("doc_split_assign")
    assert s2["exchanges"] <= 2  # the rollup aggregate only
    assert s2["cartesian"] == 0


def test_graph_degrees_bounded_shuffles(stats):
    s = stats("graph_part_degrees")
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 10


def test_silhouette_linear_metric_plan(stats):
    s = stats("cluster_silhouette")
    # O(n·k) by construction: per-cluster aggregates broadcast back to
    # the point table — a cartesian point×point product must never appear
    assert s["cartesian"] == 0
    assert s["broadcast_joins"] >= 2


def test_density_ivf_eps_join_never_cartesian(spark):
    """The density family's whole scale claim rests on the IVF ε-join
    not silently regressing to all-pairs: pin the candidate-generation
    → exact-verify lineage for the _ivf queries (reference parity
    being protected: clustering/hdbscan.py:36-42, dbscan.py:39-45)."""
    from citation_graph_spark.operators.dbscan import _EPS2, eps_pairs
    from citation_graph_spark.tables import load_tables

    emb = load_tables(spark, SF_DIR)["embeddings"]
    with static_plans(spark):
        s = plan_stats(eps_pairs(emb, _EPS2, candidates="ivf"))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 12


def test_hdbscan_mutual_reachability_lineage_never_cartesian(spark):
    """hdbscan's graph construction end-to-end (ε-pairs → core-distance
    window → greatest() join) in IVF mode: sub-quadratic, no cartesian."""
    from citation_graph_spark.operators.density import (
        _EPS2_MAX,
        _MIN_SAMPLES,
        core_distances,
        mr_lineage,
    )
    from citation_graph_spark.operators.dbscan import eps_pairs
    from citation_graph_spark.tables import load_tables

    emb = load_tables(spark, SF_DIR)["embeddings"]
    with static_plans(spark):
        pairs = eps_pairs(emb, _EPS2_MAX, candidates="ivf", keep_dist2=True)
        s = plan_stats(mr_lineage(pairs, core_distances(pairs, _MIN_SAMPLES)))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 20


def test_boruvka_round_bounded_exchanges(spark):
    """One Borůvka nomination round (the exact lineage the MSF loop
    checkpoints) must stay a constant number of joins + one window —
    bounded exchanges, no cartesian — so O(log n) rounds is the whole
    kernel cost."""
    from citation_graph_spark.graph.msf import nomination_lineage, normalize_edges

    e = normalize_edges(
        spark.createDataFrame([(1, 2, 5), (2, 3, 1)], "src long, dst long, w long")
    )
    labels = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "vid long, comp long")
    with static_plans(spark):
        s = plan_stats(nomination_lineage(e, labels))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 12


def test_boruvka_contraction_bounded_exchanges(spark):
    """The per-round contraction (rooted_nominations + one pointer-jump
    step) must stay one self-join each — bounded exchanges, no
    cartesian — so the merge cost per Borůvka round is O(log depth)
    cheap rounds, not a full CC kernel run."""
    from citation_graph_spark.graph.msf import rooted_nominations

    sel = spark.createDataFrame(
        [(1, 5, 1, 2, 2), (2, 5, 1, 2, 1), (3, 7, 3, 2, 2)],
        "comp long, w long, src long, dst long, other long",
    )
    with static_plans(spark):
        par = rooted_nominations(sel)
        s = plan_stats(par)
        jump = par.alias("a").join(
            par.select(F.col("comp").alias("p"), F.col("p").alias("np")), "p"
        )
        s2 = plan_stats(jump)
    assert s["cartesian"] == 0 and s2["cartesian"] == 0
    assert s["exchanges"] <= 6
    assert s2["exchanges"] <= 10


def test_graph_part_modularity_no_cartesian_product(stats):
    s = stats("graph_part_modularity")
    # the only nested-loop join allowed is the broadcast of the 1-row
    # edge-count total; a real CartesianProduct must never appear
    assert "CartesianProduct" not in s["formatted"]
    assert s["cartesian"] <= 2  # BroadcastNestedLoopJoin mentions of the 1-row total
    assert s["exchanges"] <= 22


def test_pca_xy_projection_zero_shuffle_no_explode(stats):
    # r4: moments come from a per-partition mapInPandas Gram and the
    # projection is a zip_with/aggregate column expression — the
    # returned plan must have NO exchange, NO join, and NO Generate
    # (a Generate here means the r3 n·d² posexplode shape came back,
    # which is infeasible at the reference's 1536/3072-dim vectors)
    s = stats("pca_xy")
    assert s["exchanges"] == 0
    assert s["sort_merge_joins"] == 0 and s["cartesian"] == 0
    assert s["broadcast_joins"] == 0
    assert "Generate" not in s["formatted"]


def test_tsne_xy_transform_is_zero_shuffle(stats):
    # the out-of-sample interpolation is a broadcast + mapInPandas over
    # the scan: any Exchange/join here means the landmark design broke
    s = stats("tsne_xy")
    assert s["exchanges"] == 0
    assert s["sort_merge_joins"] == 0 and s["cartesian"] == 0
    assert s["broadcast_joins"] == 0


def test_umap_xy_transform_is_zero_shuffle(stats):
    # same serving pass as tsne_xy (shared _landmark_coords): zero
    # exchanges, zero joins in the returned transform plan
    s = stats("umap_xy")
    assert s["exchanges"] == 0
    assert s["sort_merge_joins"] == 0 and s["cartesian"] == 0
    assert s["broadcast_joins"] == 0


def test_doc_repetition_single_doc_shuffle_no_generate_for_trigrams(stats):
    # token-frequency branch: explode -> groupBy(doc_id, w) partially
    # aggregates map-side; trigram distinctness is transform +
    # array_distinct (a column expression, no second Generate). The
    # whole plan must stay bounded: the doc_id re-joins hash-shuffle
    # but never sort-merge a cartesian.
    s = stats("doc_repetition")
    assert s["cartesian"] == 0
    # formatted plans mention each node twice (tree + detail): one
    # Generate node == 2 string hits
    assert s["formatted"].count("Generate") <= 2, "trigram branch regressed to explode"
    assert s["exchanges"] <= 5


def test_benchmark_contamination_probe_join_is_broadcast(spark):
    # the eval-shingle side is small by construction; a regression to
    # sort-merge (or cartesian) here shuffles the full training corpus
    # by shingle at 100 TB
    from citation_graph_spark.operators.dedup import (
        _shingles,
        contamination_lineage,
    )
    from citation_graph_spark.tables import load_tables

    with static_plans(spark):
        s = plan_stats(
            contamination_lineage(
                _shingles(load_tables(spark, SF_DIR)["documents"])
            )
        )
    assert s["cartesian"] == 0
    assert s["broadcast_joins"] >= 1, "eval probe join no longer broadcast"


def test_bibliometric_wedge_joins_post_materialization(stats):
    # co-citation / coupling self-join the localCheckpointed edge
    # table: the wedge key is the only join key (equi, never
    # cartesian) and the extraction lineage must NOT be replayed per
    # branch (that would blow the exchange count right back up)
    for name, ceil in (
        ("corpus_cocitation", 8),
        ("corpus_bib_coupling", 8),
        ("corpus_link_predict_ra", 10),
        ("corpus_neighbor_jaccard", 16),
    ):
        s = stats(name)
        assert s["cartesian"] == 0, name
        assert s["exchanges"] <= ceil, (name, s["exchanges"])


def test_bibliometric_aggregates_bounded(stats):
    s = stats("corpus_h_index")
    assert s["cartesian"] == 0 and s["exchanges"] <= 8
    s = stats("corpus_self_citation")
    # the vertex dim joins must broadcast (vertex table is the small
    # side of a fact-dim join here); one group shuffle
    assert s["cartesian"] == 0 and s["exchanges"] <= 4
    assert s["broadcast_joins"] >= 2


def test_katz_round_shape(spark):
    # one Katz round against a pinned edge layout: equi-joins + one
    # groupBy shuffle, never cartesian
    from citation_graph_spark.graph.katz import round_lineage

    e = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    ).repartition(4, "src")
    st = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 1.0)], "vid long, x double"
    ).repartition(4, "vid")
    with static_plans(spark):
        s = plan_stats(round_lineage(e, st, alpha=0.001, beta=1.0))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 8


def test_ktruss_support_round_shape(spark):
    # one k-truss peel round AFTER the orientation is materialized
    # (the kernel checkpoints it — it is read four times): wedge +
    # closure equi-joins + the per-edge support groupBy — never
    # cartesian, bounded exchanges
    from citation_graph_spark.graph.ktruss import _support_from_oriented

    o = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "u long, v long"
    ).repartition(4, "u")
    with static_plans(spark):
        s = plan_stats(_support_from_oriented(o))
    assert s["cartesian"] == 0
    # 5 physical exchanges (orient repartition, wedge, closure union,
    # second wedge arm, support agg) + ReusedExchange markers — the
    # orientation shuffle is REUSED by all four readers, not recomputed
    assert s["exchanges"] <= 10
    assert "ReusedExchange" in s["formatted"]


def test_betweenness_round_shapes(spark):
    # forward: frontier⨝edges equi-join, settled anti-join, sigma
    # groupBy; backward: level⨝edges equi-join, ratio groupBy, left
    # join back to receivers — never cartesian either way
    from citation_graph_spark.graph.betweenness import (
        backward_round_lineage,
        forward_round_lineage,
    )

    # inputs are localCheckpointed in the kernel loop — mirror that so
    # the pinned shape is the real per-round plan, not test lineage
    e = (
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        .repartition(4, "src")
        .localCheckpoint(eager=True)
    )
    reach = (
        spark.createDataFrame(
            [(1, 1, 0, 1)], "s long, vid long, dist int, sigma long"
        )
        .repartition(4, "s", "vid")
        .localCheckpoint(eager=True)
    )
    with static_plans(spark):
        sf = plan_stats(forward_round_lineage(e, reach, reach, 1))
    assert sf["cartesian"] == 0
    # 4 physical exchanges: edges on src, frontier on vid, anti-join
    # on (s, vid) — and the sigma agg REUSES the anti-join
    # partitioning (no exchange between partial and final agg)
    assert sf["exchanges"] <= 8

    done = (
        spark.createDataFrame(
            [(1, 2, 1, 1, 0.0)],
            "s long, vid long, dist int, sigma long, delta double",
        )
        .repartition(4, "s", "vid")
        .localCheckpoint(eager=True)
    )
    cur = reach
    with static_plans(spark):
        sb = plan_stats(backward_round_lineage(e, done, cur, 0))
    assert sb["cartesian"] == 0
    # same budget as the forward round: level⨝edges, ratio groupBy,
    # left join back to the level's receivers — all equi-keyed
    assert sb["exchanges"] <= 8


def test_hyperball_round_shape(spark):
    # one HyperBall round: edges⨝registers equi-join + grouped max —
    # the scale claim is that a round is O(E·m) rows behind ONE
    # vertex-keyed shuffle, never a cartesian register blend
    from citation_graph_spark.graph.anf import hyperball_round_lineage

    e = (
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        .repartition(4, "src")
        .localCheckpoint(eager=True)
    )
    regs = (
        spark.createDataFrame(
            [(1, 0, 1), (2, 5, 2), (3, 9, 1)], "vid long, idx int, rho int"
        )
        .repartition(4, "vid")
        .localCheckpoint(eager=True)
    )
    with static_plans(spark):
        s = plan_stats(hyperball_round_lineage(e, regs))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 7


def test_walk_round_shape(spark):
    # one walk step: frontier⨝edges equi-join + per-walk window argmin
    from citation_graph_spark.graph.walks import walk_round_lineage

    e = (
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        .repartition(4, "src")
        .localCheckpoint(eager=True)
    )
    fr = (
        spark.createDataFrame([(1, 0, 1)], "wid long, step int, v long")
        .localCheckpoint(eager=True)
    )
    with static_plans(spark):
        s = plan_stats(walk_round_lineage(e, fr, 1))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 7


def test_louvain_round_shape(spark):
    # one local-move round: volumes + k(v,c) grouped aggs, equi-joins,
    # per-vertex window — bounded exchanges, never cartesian
    from citation_graph_spark.graph.louvain import louvain_round_lineage

    sym = (
        spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
        )
        .repartition(4, "src")
        .localCheckpoint(eager=True)
    )
    deg = (
        spark.createDataFrame([(1, 1), (2, 2), (3, 1)], "vid long, d long")
        .repartition(4, "vid")
        .localCheckpoint(eager=True)
    )
    comm = deg.selectExpr("vid", "vid AS community").localCheckpoint(
        eager=True
    )
    with static_plans(spark):
        s = plan_stats(louvain_round_lineage(sym, deg, comm, 2))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 28


def test_generation_relax_round_shape(spark):
    # one condensation-DAG relaxation round: equi-join + grouped max +
    # left-join merge — the loop is depth-bounded, each round this shape
    from citation_graph_spark.operators.topology import (
        generation_relax_lineage,
    )

    q = (
        spark.createDataFrame([(1, 2), (2, 3)], "csrc long, cdst long")
        .localCheckpoint(eager=True)
    )
    gen = (
        spark.createDataFrame(
            [(1, 0), (2, 0), (3, 0)], "c long, generation int"
        )
        .localCheckpoint(eager=True)
    )
    with static_plans(spark):
        s = plan_stats(generation_relax_lineage(q, gen))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 9


def test_wl_round_shape(spark):
    # one WL round: edges⨝colors equi-join + vertex-keyed sum + merge
    # join — PageRank's shuffle structure, never cartesian
    from citation_graph_spark.graph.wl import wl_round_lineage

    sym = (
        spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
        )
        .repartition(4, "src")
        .localCheckpoint(eager=True)
    )
    colors = (
        spark.createDataFrame([(1, 1), (2, 2), (3, 1)], "vid long, color long")
        .repartition(4, "vid")
        .localCheckpoint(eager=True)
    )
    with static_plans(spark):
        s = plan_stats(wl_round_lineage(sym, colors))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 8


def test_eigenvector_round_shape(spark):
    # one shifted power-iteration round: edges⨝state equi-join +
    # vertex-keyed int64 sum — identical discipline to wl_round
    from citation_graph_spark.graph.eigenvector import (
        eigenvector_round_lineage,
    )

    sym2 = (
        spark.createDataFrame(
            [(1, 2), (2, 1), (1, 1), (2, 2)], "src long, dst long"
        )
        .repartition(4, "src")
        .localCheckpoint(eager=True)
    )
    x = (
        spark.createDataFrame(
            [(1, 1000000), (2, 1000000)], "vid long, x long"
        )
        .repartition(4, "vid")
        .localCheckpoint(eager=True)
    )
    with static_plans(spark):
        s = plan_stats(eigenvector_round_lineage(sym2, x))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 6


def test_four_clique_lineage_equi_joins_no_cartesian(spark):
    # kClist ordered expansion: every clique-edge check must be a keyed
    # join on the oriented DAG — a CartesianProduct / nested-loop here
    # means the candidate set exploded to all 4-tuples
    from citation_graph_spark.graph.triangles import (
        four_clique_lineage,
        oriented_edges,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (1, 4), (2, 4)], "src long, dst long"
    )
    with static_plans(spark):
        s = plan_stats(four_clique_lineage(oriented_edges(edges)))
    assert s["cartesian"] == 0
    # all six edge relations join merge-hinted (hub-skew spill safety)
    assert s["shuffled_hash_joins"] == 0
    assert s["sort_merge_joins"] >= 5


def test_span_dedup_bounded_shuffles_no_self_join(stats):
    # one gram explode, pre-aggregated per (doc_id, gram), ONE
    # gram-keyed shuffle for corpus counts, doc_id-keyed shuffles back:
    # no cartesian, no candidate self-join blowup
    s = stats("span_dedup_ngram")
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 10
    # the gram⨝corpus-count and final doc_id joins are keyed (small-SF
    # size estimates may broadcast them; either physical choice is keyed)
    assert s["sort_merge_joins"] + s["shuffled_hash_joins"] + s["broadcast_joins"] <= 4


def test_revenue_rollup_one_expand_dims_broadcast(stats):
    # grouping sets compile to a single Expand + hash aggregate; the
    # two true dims broadcast; only customer⨝orders and the aggregate
    # may shuffle
    import re

    s = stats("revenue_rollup")
    # exactly one Expand node (formatted plans print each node twice:
    # tree line + detail line — match the numbered detail header)
    assert len(re.findall(r"^\(\d+\) Expand", s["formatted"], re.M)) == 1
    assert s["broadcast_joins"] >= 2
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 5


def test_densest_peel_round_shape(spark):
    # one peel round: threshold filter over the materialized degree
    # table + two semi-joins of the edge state — bounded exchanges,
    # never a cartesian
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
    with static_plans(spark):
        s = plan_stats(peel_round_lineage(alive, deg, 3, 4))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 10


def test_mis_round_shape(spark):
    # one Luby round: two edge-vs-active semi-joins + neighbor-min
    # groupBy + winner left-join filter — bounded exchanges, no
    # cartesian
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
    with static_plans(spark):
        s = plan_stats(mis_round_lineage(e, active, 1))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 12


def test_bipartite_butterflies_keyed_wedges(stats):
    # part-centered wedge self-join + pair groupBy — all keyed joins
    s = stats("bipartite_butterflies")
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 12


def test_doc_bigram_typicality_no_self_join_blowup(stats):
    # bigram/w1/doc_id keyed shuffles only; joins keyed (broadcast at
    # small SF), never cartesian
    s = stats("doc_bigram_typicality")
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 12


def test_matching_round_shape(spark):
    # one matching round: endpoint expansion + stacked per-endpoint
    # window minima + (a,b) groupBy conjunction — bounded exchanges,
    # never a cartesian
    from citation_graph_spark.graph.matching import matching_round_lineage

    act = (
        spark.createDataFrame(
            [(1, 2, 17), (2, 3, 29), (1, 3, 41)], "a long, b long, m long"
        )
        .repartition(4, "a")
        .localCheckpoint(eager=True)
    )
    with static_plans(spark):
        s = plan_stats(matching_round_lineage(act, 1))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 8


def test_sorted_neighborhood_block_joins_never_cartesian(stats):
    # range exchange for the global rank, block-keyed candidate joins,
    # shingle-keyed verify — a pos-inequality join falling back to
    # nested-loop/cartesian would show up here
    s = stats("dedup_sorted_neighborhood")
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 14


def test_tfidf_keywords_keyed_joins_only(stats):
    # tf/df aggregates + term-keyed join + per-doc window; the only
    # nested-loop allowed is a 1-row scalar broadcast (none expected)
    s = stats("doc_keywords_tfidf")
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 10


def test_weighted_sample_single_range_exchange(stats):
    # range exchange for the prefix sum + broadcast offsets; never a
    # second wide shuffle
    s = stats("doc_weighted_sample")
    assert s["cartesian"] == 0
    assert s["broadcast_joins"] >= 1
    assert s["exchanges"] <= 6


def test_event_transitions_one_window_one_rollup(stats):
    s = stats("event_transitions")
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 4


def test_bm25_search_pruned_scan_keyed_joins(spark):
    """BM25: the token scan must prune to (doc_id, text); the df join
    broadcasts; no cartesian anywhere."""
    with static_plans(spark):
        s = plan_stats(operators.QUERIES["bm25_search"](spark, SF_DIR))
    assert s["cartesian"] == 0
    assert s["read_schemas"] and all(
        "source" not in r and "lang" not in r for r in s["read_schemas"]
    ), s["read_schemas"]
    assert s["broadcast_joins"] >= 1


def test_edge_betweenness_final_no_cartesian(spark):
    """The edge-dependency aggregation must stay equi-keyed: two state
    joins + one (a,b) groupBy + left join, no cartesian product."""
    from citation_graph_spark.graph.betweenness import (
        edge_dependency_lineage,
    )
    from citation_graph_spark.graph.degrees import undirect
    from citation_graph_spark.operators.graphq import part_graph_edges

    e = undirect(part_graph_edges(spark, SF_DIR).select("src", "dst"))
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
    with static_plans(spark):
        s = plan_stats(edge_dependency_lineage(e, done))
    assert s["cartesian"] == 0


def test_path_parent_table_equi_joins_only(spark):
    """Shortest-path parent derivation: dist⨝sym⨝dist must stay
    equi-keyed (the dist-1 predicate rides the vid equi-join)."""
    from citation_graph_spark.graph.degrees import undirect
    from citation_graph_spark.operators.graphq import part_graph_edges

    sym = undirect(part_graph_edges(spark, SF_DIR).select("src", "dst"))
    # fresh lineage for the dist side (the registered query's dist table
    # is a checkpointed BFS output) — avoids the ambiguous-self-join trap
    dist = (
        undirect(part_graph_edges(spark, SF_DIR).select("src", "dst"))
        .select(F.col("src").alias("vid"))
        .distinct()
        .select("vid", (F.col("vid") % 5).cast("int").alias("dist"))
    )
    parent = (
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
    with static_plans(spark):
        s = plan_stats(parent)
    assert s["cartesian"] == 0


def test_fiedler_round_bounded_exchanges(spark):
    """One Fiedler M·x round over materialized-equivalent inputs (the
    kernel persists syms and checkpoints x, so a round is exactly one
    join + one vertex-keyed groupBy): bounded exchanges, no cartesian."""
    from citation_graph_spark.graph.spectral import fiedler_round_lineage

    syms = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1), (0, 0, 3), (1, 1, 3)],
        "src long, dst long, w long",
    )
    x = spark.createDataFrame([(0, -3), (1, -2)], "vid long, x long")
    with static_plans(spark):
        s = plan_stats(fiedler_round_lineage(syms, x))
    assert s["cartesian"] == 0
    assert s["exchanges"] <= 6  # the ev_round ceiling: join + agg keys


def test_repo_quotient_no_cartesian(spark):
    """The repo dependency quotient must stay vid-keyed: two vertex
    joins + a repo-pair groupBy + one share window — no cartesian."""
    with static_plans(spark):
        s = plan_stats(operators.QUERIES["corpus_repo_graph"](spark, SF_DIR))
    assert s["cartesian"] == 0
