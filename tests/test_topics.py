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


def np_nmf(docs_pdf, r, iters, vocab_size=None):
    """Pure-numpy replay of nmf_factorize: same init, same updates,
    same top-V-by-document-frequency vocabulary cap."""
    import re

    import numpy as np

    from citation_graph_spark.operators.topics import (
        _NMF_EPS,
        _NMF_VOCAB,
        _hash01,
    )

    if vocab_size is None:
        vocab_size = _NMF_VOCAB
    tok_counts = {}
    for _, row in docs_pdf.iterrows():
        for t in re.split(r"\s+", row["text"].strip().lower()):
            tok_counts[(row["doc_id"], t)] = tok_counts.get((row["doc_id"], t), 0) + 1
    df = {}
    for _, t in tok_counts:
        df[t] = df.get(t, 0) + 1
    kept = sorted(df, key=lambda t: (-df[t], t))[:vocab_size]
    vocab = sorted(kept)
    jmap = {t: j for j, t in enumerate(vocab)}
    tok_counts = {
        (d, t): c for (d, t), c in tok_counts.items() if t in jmap
    }
    doc_ids = sorted({d for d, _ in tok_counts})
    imap = {d: i for i, d in enumerate(doc_ids)}
    V = np.zeros((len(doc_ids), len(vocab)))
    for (d, t), c in tok_counts.items():
        V[imap[d], jmap[t]] = c
    W = np.array([[_hash01(d, k) for k in range(r)] for d in doc_ids])
    H = np.array([[_hash01(k + 7919, j) for j in range(len(vocab))] for k in range(r)])
    for _ in range(iters):
        H = H * (W.T @ V) / (W.T @ W @ H + _NMF_EPS)
        W = W * (V @ H.T) / (W @ H @ H.T + _NMF_EPS)
    return doc_ids, W


def test_doc_topics_nmf_matches_numpy_replay(spark):
    """The full distributed factorization replayed in numpy: same
    hash init, same multiplicative updates — weights must agree to
    float-reduction noise and dominant topics must match wherever the
    top-2 factors aren't in a dead heat."""
    import numpy as np
    import pandas as pd

    from citation_graph_spark.operators.topics import _NMF_ITERS, _NMF_R

    docs_pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    doc_ids, W = np_nmf(docs_pdf, _NMF_R, _NMF_ITERS)

    got = {
        r_["doc_id"]: (r_["topic"], r_["weight_milli"])
        for r_ in operators.QUERIES["doc_topics_nmf"](spark, SF_DIR).collect()
    }
    assert set(got) == set(doc_ids)
    mismatches = 0
    for i, d in enumerate(doc_ids):
        order = np.argsort(-W[i])
        want_topic = int(order[0])
        want_w = W[i, want_topic]
        topic, w_milli = got[d]
        # weights agree to reduction noise
        assert abs(w_milli - np.floor(W[i, topic] * 1000 + 0.5)) <= 1
        if topic != want_topic:
            # only excusable when the top two factors are nearly tied
            gap = want_w - W[i, int(order[1])]
            assert gap < 1e-6 * max(want_w, 1.0), (d, topic, want_topic, gap)
            mismatches += 1
    assert mismatches <= max(2, len(doc_ids) // 100)


def test_nmf_vocab_cap_matches_numpy_replay(spark):
    """A vocab_size small enough to actually truncate this corpus must
    still replay exactly: same top-V-by-df selection, same alphabetical
    dense ids within the cap, same updates."""
    import numpy as np
    import pandas as pd

    from citation_graph_spark.operators.topics import nmf_factorize
    from citation_graph_spark.tables import load_tables

    docs_pdf = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    # replay first to size the cap so it genuinely truncates
    full_vocab = {
        t
        for _, row in docs_pdf.iterrows()
        for t in row["text"].strip().lower().split()
    }
    v_cap = max(4, len(full_vocab) // 3)
    assert v_cap < len(full_vocab), "fixture vocab too small to exercise cap"

    doc_ids, W = np_nmf(docs_pdf, 3, 4, vocab_size=v_cap)
    docs = load_tables(spark, SF_DIR)["documents"]
    w_df, vocab = nmf_factorize(docs, r=3, iters=4, vocab_size=v_cap)
    assert len(vocab) == v_cap
    got = {}
    for r_ in w_df.collect():
        got.setdefault(r_["doc_id"], {})[r_["k"]] = r_["w"]
    assert set(got) == set(doc_ids), "OOV-doc drop rule diverged"
    for i, d in enumerate(doc_ids):
        for k in range(3):
            # reduction-order noise only (same math, different sum order)
            assert abs(got[d][k] - W[i, k]) <= 1e-6 * max(abs(W[i, k]), 1.0)
