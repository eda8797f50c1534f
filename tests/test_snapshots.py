"""Snapshot catalog: atomic commits, time travel, incremental reads,
manifest-level file pruning (the Iceberg-analog semantics the
north-star deployment depends on — citation_graph_spark/snapshots.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from citation_graph_spark.fixtures.corpus import generate_documents
from citation_graph_spark.snapshots import SnapshotCatalog


def _docs(spark, lo, hi):
    pdf = generate_documents(1200, seed=42).iloc[lo:hi]
    return spark.createDataFrame(pdf).repartition(4)


def _keys(df):
    return sorted(
        (r.repo, r.path) for r in df.select("repo", "path").collect()
    )


def test_append_time_travel_incremental(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "tbl"))
    v1 = cat.commit(_docs(spark, 0, 800), mode="append")
    v2 = cat.commit(_docs(spark, 800, 1200), mode="append")
    assert (v1, v2) == (1, 2)

    assert cat.read(spark, version=1).count() == 800
    assert cat.read(spark).count() == 1200

    inc = cat.incremental(spark, 1, 2)
    assert _keys(inc) == _keys(_docs(spark, 800, 1200))

    # the diff is metadata-only: the plan touches ONLY v2 data files
    v2_dir = os.path.join(str(tmp_path / "tbl"), "data", "v00002")
    assert inc.inputFiles() and all(
        f.startswith("file:") and v2_dir in f for f in inc.inputFiles()
    )
    assert len(inc.inputFiles()) == len(cat.manifest(2)["added_files"])

    # empty diff keeps the table schema
    empty = cat.incremental(spark, 2, 2)
    assert empty.count() == 0
    assert empty.schema == cat.read(spark).schema


def test_overwrite_keeps_history(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "tbl"))
    cat.commit(_docs(spark, 0, 800))
    cat.commit(_docs(spark, 800, 1200))
    cat.commit(_docs(spark, 0, 100), mode="overwrite")

    assert cat.read(spark).count() == 100
    assert cat.read(spark, version=2).count() == 1200  # time travel
    ops = [h["operation"] for h in cat.history()]
    assert ops == ["append", "append", "overwrite"]
    assert [h["total_rows"] for h in cat.history()] == [800, 1200, 100]


def test_manifest_level_pruning(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "tbl"))
    df = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 97).alias("v")
    )
    # range-partitioned write → disjoint per-file [min,max] on k
    cat.commit(df.repartitionByRange(8, "k"), stats_cols=["k"])

    keep, total = cat.prune_files({"k": (2500, 2600)})
    assert total == 8 and len(keep) < total

    got = sorted(
        r.k for r in cat.scan(spark, {"k": (2500, 2600)}).collect()
    )
    assert got == list(range(2500, 2601))

    # open-ended predicates
    assert cat.scan(spark, {"k": (9990, None)}).count() == 10
    assert cat.scan(spark, {"k": (None, 9)}).count() == 10


def test_commit_is_atomic_and_torn_tmp_ignored(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "tbl"))
    cat.commit(_docs(spark, 0, 100))
    # a crashed writer leaves a torn temp manifest — readers never see it
    torn = os.path.join(str(tmp_path / "tbl"), "manifests", "v00002.json.tmp")
    with open(torn, "w") as f:
        f.write('{"version": 2, "files": [')  # torn mid-write
    assert cat.versions() == [1]
    assert cat.current_version() == 1
    assert cat.read(spark).count() == 100
    # next commit proceeds past the debris
    v = cat.commit(_docs(spark, 100, 200))
    assert v == 2 and cat.read(spark).count() == 200


def test_snapshot_incremental_drives_warm_refresh(spark, tmp_path):
    """Catalog → kernel integration: snapshot v1 ranks seed the refresh
    after an append, and the incremental read plans only new files —
    the O(drift) refresh loop the catalog exists to feed."""
    import numpy as np

    from citation_graph_spark.extraction import build_edges
    from citation_graph_spark.graph.ids import build_vertices
    from citation_graph_spark.streaming.incremental import refresh_pagerank

    def iters(path):
        with open(path) as f:
            return sum(1 for _ in f)

    pdf = generate_documents(400, seed=11)
    cat = SnapshotCatalog(str(tmp_path / "docs_tbl"))
    cat.commit(spark.createDataFrame(pdf.iloc[:300]).repartition(2))

    docs1 = cat.read(spark, version=1)
    verts1 = build_vertices(docs1)
    scores1 = refresh_pagerank(build_edges(docs1, verts1), verts1, tol=1e-6)

    cat.commit(spark.createDataFrame(pdf.iloc[300:]).repartition(2))
    assert cat.incremental(spark, 1).count() == 100

    docs_all = cat.read(spark)
    verts_all = build_vertices(docs_all)
    edges_all = build_edges(docs_all, verts_all)
    # dense vids shift on growth: remap via the stable (repo, path) key
    prior = (
        scores1.join(verts1.select("vid", "repo", "path"), "vid")
        .join(
            verts_all.selectExpr("vid as new_vid", "repo", "path"),
            ["repo", "path"],
        )
        .selectExpr("new_vid as vid", "score")
    )
    m_cold = str(tmp_path / "m_cold.jsonl")
    m_warm = str(tmp_path / "m_warm.jsonl")
    cold = refresh_pagerank(edges_all, verts_all, tol=1e-6, metrics_path=m_cold)
    warm = refresh_pagerank(
        edges_all, verts_all, prior_scores=prior, tol=1e-6, metrics_path=m_warm
    )
    c = cold.orderBy("vid").toPandas()["score"].to_numpy()
    w = warm.orderBy("vid").toPandas()["score"].to_numpy()
    assert np.allclose(c, w, atol=1e-6, rtol=0)
    assert iters(m_warm) < iters(m_cold)


def test_manifest_contents_are_relative_and_stat_complete(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "tbl"))
    cat.commit(_docs(spark, 0, 300), stats_cols=["repo", "path"])
    m = cat.manifest(1)
    assert m["parent"] is None and m["operation"] == "append"
    for e in m["files"]:
        assert not e["path"].startswith("/")  # relocatable
        assert set(e["stats"]) == {"repo", "path"}
        lo, hi = e["stats"]["repo"]
        assert lo <= hi
    assert sum(e["rows"] for e in m["files"]) == 300
    # manifest round-trips as stable JSON
    with open(cat._manifest_path(1)) as f:
        assert json.load(f) == m
