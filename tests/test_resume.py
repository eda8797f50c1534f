"""Resumability (north rule): kill at iteration k, relaunch, identical
final scores; converged checkpoints return without extra rounds."""

from __future__ import annotations

import numpy as np

from citation_graph_spark.graph import connected_components, pagerank
from tests.conftest import edges_df, vertices_df
from tests.oracles import random_graph


def test_pagerank_kill_resume_identical(spark, tmp_path):
    el = random_graph(300, 1500, seed=3)
    edges = edges_df(spark, el)
    verts = vertices_df(spark, 300)

    full = (
        pagerank(edges, verts).orderBy("vid").toPandas()["score"].to_numpy()
    )
    ck = str(tmp_path / "ck")
    pagerank(edges, verts, max_iter=6, checkpoint_dir=ck, checkpoint_interval=3)
    resumed = (
        pagerank(edges, verts, checkpoint_dir=ck, resume=True)
        .orderBy("vid")
        .toPandas()["score"]
        .to_numpy()
    )
    assert np.allclose(full, resumed, atol=1e-12, rtol=0)

    again = (
        pagerank(edges, verts, checkpoint_dir=ck, resume=True)
        .orderBy("vid")
        .toPandas()["score"]
        .to_numpy()
    )
    assert (again == resumed).all()


def test_components_kill_resume_identical(spark, tmp_path):
    el = random_graph(300, 900, seed=5)
    edges = edges_df(spark, el)
    verts = vertices_df(spark, 300)

    full = (
        connected_components(edges, verts)
        .orderBy("vid")
        .toPandas()["component"]
        .tolist()
    )
    ck = str(tmp_path / "ck")
    connected_components(
        edges, verts, max_iter=2, checkpoint_dir=ck, checkpoint_interval=1
    )
    resumed = (
        connected_components(edges, verts, checkpoint_dir=ck, resume=True)
        .orderBy("vid")
        .toPandas()["component"]
        .tolist()
    )
    assert resumed == full
