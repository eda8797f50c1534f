"""Oracle-parity tests for the serving-layer query registry.

Every oracle-backed query in ``citation_graph_spark.operators`` runs on
Spark at sf0.001 and is compared against its DuckDB oracle — row count,
column-name set, and an order-insensitive value hash. This is the same
contract the driver's correctness gate enforces at sf0.01 (see
tools/check_correctness.py); descends from the reference's data_checks
suite (reference: data_checks/conftest.py:10-72 loads produced tables,
tests assert invariants over them).
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from citation_graph_spark import operators
from citation_graph_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"

operators.load_all()

# includes the corpus_* pipeline queries: their oracles re-implement
# extraction + id assignment + the iterative kernel in SQL over the
# materialized corpus parquet (graphq._CORPUS_CTE); the kernels are
# additionally replayed exactly by tests/test_graph_kernels.py
ORACLE_QUERIES = sorted(operators.ORACLES)


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    df = operators.QUERIES[name](spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    ores = duck.sql(operators.ORACLES[name])
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    assert sorted(df.columns) == sorted(ocols), f"{name}: column mismatch"
    assert len(rows) == len(orows), f"{name}: rowcount {len(rows)} vs {len(orows)}"
    assert table_hash(rows, df.columns) == table_hash(orows, ocols), (
        f"{name}: value hash mismatch"
    )


def test_rows_only_queries_have_kernel_oracles():
    """Queries without SQL oracles must be k-means (no
    cross-implementation oracle exists; determinism in test_kmeans,
    metric-checked in test_clustering_metrics; the Pareto front is a
    deterministic driver-side reduction of the same sweep, invariants
    in test_kmeans), pca_xy/tsne_xy/umap_xy (full numpy
    pipeline-replay oracles in test_dimred), or LDA/NMF topics
    (determinism + invariants in test_topics). The corpus_* pipeline
    queries are deliberately NOT allowed here: they gained full SQL
    oracles (graphq._CORPUS_CTE) and must keep them."""
    rows_only = set(operators.QUERIES) - set(operators.ORACLES)
    allowed = {
        "embedding_kmeans",
        "pca_xy",
        "doc_topics_lda",
        "doc_topics_nmf",
        "kmeans_model_selection",
        "kmeans_pareto_front",
        "tsne_xy",
        "umap_xy",  # full numpy pipeline-replay oracle in test_dimred
        # HLL estimates have no SQL twin; register fixpoint bit-replayed
        # + accuracy pinned vs oracle-backed exact_balls in test_topology
        "corpus_hyperball",
        # iterative merge loop, not single-SQL-expressible; sequential
        # replay of the identical schedule in test_tokenization
        "bpe_learn_merges",
        # encodes with the table the iterative learn loop produces;
        # sequential learn+encode replay in test_tokenization
        "bpe_encode_docs",
    }
    assert rows_only <= allowed, rows_only
