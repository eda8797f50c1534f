"""Bucketed-dedup guarantees: the scale-path rungs vs their brute-force
baselines.

- dedup_embedding_ivf candidates are verified with the exact cosine, so
  every emitted pair must also appear in the all-pairs baseline
  (subset), and measured recall is reported/bounded.
- dedup_simhash_pairs is *exact* by the pigeonhole argument (Hamming
  radius 3 < 4 bands): the banded result must equal the un-banded
  brute-force Hamming-ball join, not just approximate it.
"""

from __future__ import annotations

import duckdb
import pytest

from citation_graph_spark import operators
from citation_graph_spark.operators.dedup import (
    _HAMMING_K,
    _simhash_ctes,
)
from citation_graph_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"

operators.load_all()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_embedding_ivf_subset_and_recall(spark):
    ivf = {
        (r["v1"], r["v2"])
        for r in operators.QUERIES["dedup_embedding_ivf"](spark, SF_DIR).collect()
    }
    full = {
        (r["v1"], r["v2"])
        for r in operators.QUERIES["dedup_embedding_cosine"](spark, SF_DIR).collect()
    }
    assert ivf <= full, "IVF-verified pairs must be a subset of all-pairs"
    assert full, "baseline found no near-dup pairs — fixture drifted"
    recall = len(ivf) / len(full)
    # measured ~0.59 at nprobe=2 on this corpus's adversarially-spread
    # 0.25-cosine band; the floor is a regression tripwire
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.3f}"


def test_simhash_pairs_banding_is_lossless(duck, spark):
    brute = duck.sql(
        f"""
        WITH {_simhash_ctes()}
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_K}
        """
    ).fetchall()
    banded = {
        (r["d1"], r["d2"])
        for r in operators.QUERIES["dedup_simhash_pairs"](spark, SF_DIR).collect()
    }
    assert banded == set(brute)


def test_span_dedup_flags_shared_spans_only(spark):
    """Two docs embed the same 7-token span inside unique text; a third
    shares nothing. Exactly the shared positions flag; short docs get
    zero spans and keep=1."""
    from citation_graph_spark.operators.dedup import span_dedup_scores

    boiler = "all rights reserved see license file for"  # 7 tokens
    rows = [
        (1, "alpha beta gamma " + boiler + " delta epsilon"),  # 12 tok
        (2, boiler + " zeta eta theta iota kappa"),  # 12 tok
        (3, "one two three four five six seven eight nine"),  # 9 tok
        (4, "too short"),  # < K tokens -> zero spans
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in span_dedup_scores(df).collect()
    }
    # doc 1: 12-6=6 spans, exactly 1 flagged (the boilerplate span)
    assert got[1]["n_spans"] == 6 and got[1]["n_flagged"] == 1
    assert got[2]["n_spans"] == 6 and got[2]["n_flagged"] == 1
    assert got[3]["n_spans"] == 3 and got[3]["n_flagged"] == 0
    assert got[4] == {
        "doc_id": 4, "n_spans": 0, "n_flagged": 0, "flagged_r4": 0, "keep": 1,
    }
    # ratio quantization: 1/6 -> floor(1666.66 + .5) = 1667
    assert got[1]["flagged_r4"] == 1667 and got[1]["keep"] == 1


def test_span_dedup_drops_fully_duplicated_doc(spark):
    from citation_graph_spark.operators.dedup import span_dedup_scores

    text = "the quick brown fox jumps over the lazy dog again"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different words here x y z q")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in span_dedup_scores(df).collect()}
    assert got[1]["flagged_r4"] == 10000 and got[1]["keep"] == 0
    assert got[2]["keep"] == 0
    assert got[3]["n_flagged"] == 0 and got[3]["keep"] == 1


# ------------------------------------------------- sorted neighborhood
def test_global_pos_is_exact_global_rank(spark):
    from citation_graph_spark.operators.dedup import _global_pos

    rows = [(i, f"k{i % 7:02d}") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "k"])
    got = {
        r["doc_id"]: r["pos"]
        for r in _global_pos(df, ["k", "doc_id"], 8).collect()
    }
    want = {
        doc: i + 1
        for i, (doc, _) in enumerate(
            sorted(rows, key=lambda t: (t[1], t[0]))
        )
    }
    assert got == want


def test_sorted_neighborhood_matches_oracle_at_sf0001(duck, spark):
    from citation_graph_spark.operators import ORACLES, QUERIES

    got = {
        (r["d1"], r["d2"], r["jaccard_micro"])
        for r in QUERIES["dedup_sorted_neighborhood"](spark, SF_DIR).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            ORACLES["dedup_sorted_neighborhood"]
        ).fetchall()
    }
    assert got == want


def test_sorted_neighborhood_catches_prefix_near_dups(spark):
    """Two docs sharing a long normalized prefix sort adjacent and the
    Jaccard verify keeps them; an unrelated doc between unrelated keys
    pairs with nothing."""
    from citation_graph_spark.operators.dedup import (
        _SNM_W,
        _global_pos,
        dedup_sorted_neighborhood,
    )
    import citation_graph_spark.operators.dedup as dd

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " one extra tail"),
        (2, base + " one extra tall"),
        (3, "completely different words nothing shared here at all ok"),
    ]
    import pandas as pd
    import os, tempfile

    tmp = tempfile.mkdtemp()
    os.makedirs(f"{tmp}", exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(f"{tmp}/documents.parquet")
    # satisfy load_tables for the one table the query reads
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        src = f"{SF_DIR}/{t}.parquet"
        dst = f"{tmp}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    pairs = {
        (r["d1"], r["d2"])
        for r in dedup_sorted_neighborhood(spark, tmp).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
