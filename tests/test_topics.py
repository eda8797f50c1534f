"""Determinism + invariants for the LDA topic surface (no cross-engine
oracle exists for variational/EM LDA — same posture as k-means, which
is additionally metric-checked; topics are pinned by seed)."""

from __future__ import annotations

from citation_graph_spark import operators

SF_DIR = "/root/testdata/sf0.001"

operators.load_all()


def test_doc_topics_deterministic_and_total(spark):
    a = {
        r["doc_id"]: (r["topic"], r["topic_weight_micro"])
        for r in operators.QUERIES["doc_topics_lda"](spark, SF_DIR).collect()
    }
    b = {
        r["doc_id"]: (r["topic"], r["topic_weight_micro"])
        for r in operators.QUERIES["doc_topics_lda"](spark, SF_DIR).collect()
    }
    # distributed EM sums floats in nondeterministic order, so weights
    # wobble in the 4th decimal — and this synthetic corpus's topic
    # posteriors sit ~0.202 vs the 0.200 uniform floor, so near-tied
    # docs legitimately flip dominant topic between runs. The model
    # itself must be stable: per-doc dominant WEIGHT within 0.5%, and
    # the assignment agreement above a coarse tripwire.
    assert all(abs(a[k][1] - b[k][1]) <= 5000 for k in a), "weights drifted > 0.5%"
    agree = sum(1 for k in a if a[k][0] == b[k][0]) / len(a)
    assert agree >= 0.7, f"dominant-topic agreement collapsed: {agree:.3f}"

    import pandas as pd

    n_docs = len(pd.read_parquet(f"{SF_DIR}/documents.parquet"))
    assert len(a) == n_docs, "exactly one dominant topic per document"
    topics = {t for t, _ in a.values()}
    assert topics <= set(range(5))
    # dominant weight must be at least uniform share (1/k)
    assert all(w >= 200000 for _, w in a.values())
