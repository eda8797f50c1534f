"""Invariants + plan pins for the corpus-curation operators
(operators/curation.py): PII redaction actually scrubs, chunking
covers every token with the documented count formula, and mixture
weighting realizes its per-language epoch targets. Oracle parity for
all three is covered by tests/test_operators.py; these are the
semantic guarantees a hash can't express.

Reference analog: the reference's curation passes are row-wise pandas
string cleaning (utils.py:76-98, combine_serp.py:43-58); the Spark
versions are pure column expressions, so the plan pins assert the
zero-shuffle map-only shape that makes them 100 TB-safe.
"""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from citation_graph_spark import operators
from citation_graph_spark.operators.curation import (
    CHUNK_S,
    CHUNK_W,
    EMAIL_RE,
    IPV4_RE,
    MIX_WEIGHTS,
    PHONE_RE,
    _enriched_text,
)
from citation_graph_spark.planaudit import plan_stats, static_plans
from citation_graph_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"

operators.load_all()


def test_pii_redaction_scrubs_everything(spark):
    """After redaction the three patterns must have ZERO matches left,
    and the synthetic injection guarantees every doc had ≥1 of each
    beforehand (so the scrub is exercised on every row)."""
    out = operators.QUERIES["pii_redaction"](spark, SF_DIR)
    agg = out.agg(
        F.min("n_email").alias("me"),
        F.min("n_phone").alias("mp"),
        F.min("n_ipv4").alias("mi"),
    ).first()
    assert agg["me"] >= 1 and agg["mp"] >= 1 and agg["mi"] >= 1

    d = load_tables(spark, SF_DIR)["documents"]
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(_enriched_text(), EMAIL_RE, "<EMAIL>"),
            IPV4_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    leftover = d.select(
        (
            F.regexp_count(red, F.lit(EMAIL_RE))
            + F.regexp_count(red, F.lit(PHONE_RE))
            + F.regexp_count(red, F.lit(IPV4_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("s")).first()["s"]
    assert leftover == 0


def test_doc_chunks_cover_every_token(spark):
    """Chunk count per doc == 1 if nt<=W else ceil((nt-W)/S)+1; chunk
    sizes are in [1, W]; the last chunk ends exactly at token nt (full
    coverage, no overrun)."""
    d = load_tables(spark, SF_DIR)["documents"]
    nt_by_doc = {
        r["doc_id"]: r["nt"]
        for r in d.select(
            "doc_id",
            F.size(
                F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
            ).alias("nt"),
        ).collect()
    }
    rows = operators.QUERIES["doc_chunks"](spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(nt_by_doc)
    for doc_id, chunks in by_doc.items():
        nt = nt_by_doc[doc_id]
        expect = 1 if nt <= CHUNK_W else math.ceil((nt - CHUNK_W) / CHUNK_S) + 1
        assert len(chunks) == expect, (doc_id, nt)
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(expect))
        for c in chunks:
            assert 1 <= c["chunk_tokens"] <= CHUNK_W
        last = chunks[-1]
        assert last["chunk_idx"] * CHUNK_S + last["chunk_tokens"] == nt


def test_corpus_mixture_realizes_weights(spark):
    """Per (lang, doc) the epochs are contiguous 1..copies; copies
    match an independent python recomputation of base + md5 gate; and
    langs outside MIX_WEIGHTS never appear."""
    rows = operators.QUERIES["corpus_mixture"](spark, SF_DIR).collect()
    per_doc: dict[tuple, list] = {}
    for r in rows:
        assert r["lang"] in MIX_WEIGHTS
        per_doc.setdefault((r["lang"], r["doc_id"]), []).append(r["epoch"])
    for (lang, doc_id), epochs in per_doc.items():
        base, thr = MIX_WEIGHTS[lang]
        gate = hashlib.md5(f"{doc_id}:mix".encode()).hexdigest()[:2]
        copies = base + (1 if thr is not None and gate <= thr else 0)
        assert sorted(epochs) == list(range(1, copies + 1)), (lang, doc_id)
    # downsampling really happens: zh (0 base + 0.5 gate) must emit
    # strictly fewer docs than exist in the fixture
    d = load_tables(spark, SF_DIR)["documents"]
    n_zh = d.filter(F.col("lang") == "zh").count()
    n_zh_out = len({k for k in per_doc if k[0] == "zh"})
    assert 0 < n_zh_out < n_zh


def test_regexes_are_cross_engine_subset():
    """The PII regexes must stay inside the Java∩RE2 common subset the
    module documents: no lookaround, no backrefs (python re accepts the
    same subset, so compiling here plus the DuckDB oracle run in
    test_operators covers both engines)."""
    for pat in (EMAIL_RE, IPV4_RE, PHONE_RE):
        assert "(?<" not in pat and "(?=" not in pat and "\\1" not in pat
        re.compile(pat)


def test_curation_plans_are_map_only(spark):
    """All three curation queries are narrow per-row transforms: zero
    exchanges, zero joins — the property that makes them free at
    100 TB (pure map stage over the scan)."""
    with static_plans(spark):
        for name in ("pii_redaction", "doc_chunks", "corpus_mixture"):
            s = plan_stats(operators.QUERIES[name](spark, SF_DIR))
            assert s["exchanges"] == 0, (name, s["exchanges"])
            assert s["cartesian"] == 0 and s["sort_merge_joins"] == 0
        # column pruning: pii_redaction never reads the embedding or
        # unused metadata columns
        s = plan_stats(operators.QUERIES["pii_redaction"](spark, SF_DIR))
        assert s["read_schemas"] and all(
            "quality" not in r for r in s["read_schemas"]
        ), s["read_schemas"]
