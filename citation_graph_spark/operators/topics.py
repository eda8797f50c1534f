"""Topic-model surface (reference parity: ExtendedArticle.lda_topic /
nmf_topic, reference schemas.py:133-134, produced by the
scripts/topics/process_keywords.py pipeline).

The reference fits sklearn LDA/NMF on a single-node keyword matrix;
here the equivalent is distributed MLlib LDA over the tokenized
``documents`` table: tokens → CountVectorizer → LDA(k) → dominant
topic per document. The LLM-keyword-generation half of the reference
pipeline is a declared non-goal (SURVEY §7.3); this covers the topic
*assignment* surface a reference user consumes.

No SQL oracle exists for variational LDA (rows-only gate row);
tests/test_topics.py pins determinism (fixed seed, run-to-run
equality) and schema/coverage invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citation_graph_spark.operators import register
from citation_graph_spark.tables import load_tables

_K = 5
_SEED = 20240817


def fit_doc_topics(docs: DataFrame, k: int = _K, seed: int = _SEED) -> DataFrame:
    """(doc_id, topic, topic_weight_micro) — dominant LDA topic per doc."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("tokens")
    )
    cv = CountVectorizer(inputCol="tokens", outputCol="features", vocabSize=4096)
    cvm = cv.fit(toks)
    feats = cvm.transform(toks)
    lda = LDA(k=k, seed=seed, maxIter=20, optimizer="em")
    model = lda.fit(feats)
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import Window

    dist = model.transform(feats).select("doc_id", "topicDistribution")
    exploded = dist.select(
        "doc_id",
        F.posexplode(vector_to_array("topicDistribution")).alias("topic", "w"),
    )

    win = Window.partitionBy("doc_id").orderBy(F.desc("w"), F.asc("topic"))
    return (
        exploded.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("topic").cast("long").alias("topic"),
            F.floor(F.col("w") * 1000000 + F.lit(0.5)).cast("long").alias(
                "topic_weight_micro"
            ),
        )
    )


@register("doc_topics_lda")  # rows-only: no cross-engine oracle for LDA;
# determinism + invariants in tests/test_topics.py
def doc_topics_lda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant LDA topic per document (reference lda_topic field,
    schemas.py:133). EM optimizer: deterministic for a fixed seed and
    input partitioning."""
    return fit_doc_topics(load_tables(spark, sf_dir)["documents"])


# --------------------------------------------------------------------------
# Distributed NMF (reference nmf_topic field, schemas.py:134 — sklearn NMF
# in scripts/topics/process_keywords.py). MLlib has no NMF; this is the
# textbook distributed layout: the tall factor W (n_docs × r) stays a
# DataFrame, the small factor H (r × vocab) and the r×r Gram matrices live
# on the driver and broadcast into the update joins. Multiplicative
# updates (Lee & Seung):
#     H ← H ⊙ (WᵀV) ⊘ (WᵀW·H + ε)      [WᵀV, WᵀW: distributed aggs]
#     W ← W ⊙ (V·Hᵀ) ⊘ (W·HHᵀ + ε)     [V·Hᵀ: distributed agg; HHᵀ: r×r]
# Init is a pure integer-hash function of (doc_id, k) / (k, term_rank), so
# tests/test_topics.py replays the ENTIRE factorization in numpy.

_NMF_R = 4
_NMF_ITERS = 8
_NMF_EPS = 1e-9
_NMF_VOCAB = 2048  # top-V terms by document frequency (df desc, term asc)
_H_MOD = 1_000_003


def _hash01(a: int, b: int) -> float:
    """Deterministic (0.5, 1.5] init value — identical in numpy replay.

    ``a`` is reduced mod _H_MOD before the multiply so the Spark-side
    LongType mirror of this expression cannot overflow int64 for
    doc_id ≳ 3.5e9 ((a%M)·(c%M) ≤ (1e6)·(4.3e5) ≪ 2^63); the value is
    unchanged — (a·c) mod M ≡ ((a mod M)·(c mod M)) mod M."""
    return (
        ((a % _H_MOD) * (2654435761 % _H_MOD) + b * 40503) % _H_MOD
    ) / _H_MOD + 0.5


def nmf_factorize(
    docs: DataFrame,
    r: int = _NMF_R,
    iters: int = _NMF_ITERS,
    vocab_size: int = _NMF_VOCAB,
):
    """Returns (w_df(doc_id, k, w), vocab list) after ``iters`` updates.

    The vocabulary is CAPPED to the ``vocab_size`` terms with highest
    document frequency (tie-break: term asc) — the rank is a
    distributed count + orderBy/limit, so the driver only ever holds V
    terms and the per-iteration r×V factor, never the unbounded corpus
    vocabulary (mirrors MLlib CountVectorizer's ``vocabSize``). Tokens
    outside the cap are dropped from V; a document whose every token is
    out-of-vocab drops out of the factorization entirely (same rule in
    the numpy replay, tests/test_topics.py)."""
    import numpy as np

    spark = docs.sparkSession
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    counts = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    # top-V terms by document frequency — distributed agg, bounded
    # collect; dense ids stay the alphabetical rank WITHIN the capped
    # vocab (matches numpy replay)
    top_terms = (
        counts.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(vocab_size)
        .collect()
    )
    vocab = sorted(r_["term"] for r_ in top_terms)
    term_id = spark.createDataFrame(
        [(t, j) for j, t in enumerate(vocab)], "term string, j int"
    )
    v = (
        counts.join(F.broadcast(term_id), "term")
        .select("doc_id", "j", "x")
        .persist()
    )
    v.count()

    # W as (doc_id, k, w) rows — tall, distributed; hash init
    ks = spark.range(r).select(F.col("id").cast("int").alias("k"))
    w = (
        v.select("doc_id")
        .distinct()
        .crossJoin(F.broadcast(ks))
        .select(
            "doc_id",
            "k",
            # mod-reduce doc_id BEFORE the multiply — keeps every
            # intermediate ≪ 2^63 (same reduction in _hash01, which the
            # numpy replay uses; values are identical by modular
            # arithmetic, only the overflow at doc_id ≳ 3.5e9 goes away)
            (
                (
                    (
                        F.pmod(F.col("doc_id"), F.lit(_H_MOD))
                        * F.lit(2654435761 % _H_MOD)
                        + F.col("k") * 40503
                    )
                    % _H_MOD
                )
                / _H_MOD
                + 0.5
            ).alias("w"),
        )
        .persist()
    )
    w.count()

    # H on the driver — r × vocab, hash init
    hmat = np.array(
        [[_hash01(k + 7919, j) for j in range(len(vocab))] for k in range(r)]
    )

    for _ in range(iters):
        # WᵀV (r × vocab) and WᵀW (r × r): distributed aggs, tiny results
        wv_rows = (
            v.join(w, "doc_id")
            .groupBy("k", "j")
            .agg(F.sum(F.col("x") * F.col("w")).alias("s"))
            .collect()
        )
        wtv = np.zeros((r, len(vocab)))
        for row in wv_rows:
            wtv[row["k"], row["j"]] = row["s"]
        w2 = w.select("doc_id", F.col("k").alias("k1"), F.col("w").alias("w1"))
        ww_rows = (
            w2.join(w.withColumnRenamed("k", "k2").withColumnRenamed("w", "w2"), "doc_id")
            .groupBy("k1", "k2")
            .agg(F.sum(F.col("w1") * F.col("w2")).alias("s"))
            .collect()
        )
        wtw = np.zeros((r, r))
        for row in ww_rows:
            wtw[row["k1"], row["k2"]] = row["s"]
        hmat = hmat * wtv / (wtw @ hmat + _NMF_EPS)

        # V·Hᵀ (distributed) and W·HHᵀ (join with broadcast r×r)
        h_rows = spark.createDataFrame(
            [(j, k, float(hmat[k, j])) for j in range(len(vocab)) for k in range(r)],
            "j int, k int, h double",
        )
        vh = (
            v.join(F.broadcast(h_rows), "j")
            .groupBy("doc_id", "k")
            .agg(F.sum(F.col("x") * F.col("h")).alias("num"))
        )
        hht = hmat @ hmat.T
        hht_rows = spark.createDataFrame(
            [(k1, k2, float(hht[k1, k2])) for k1 in range(r) for k2 in range(r)],
            "k1 int, k int, g double",
        )
        den = (
            w.select("doc_id", F.col("k").alias("k1"), "w")
            .join(F.broadcast(hht_rows), "k1")
            .groupBy("doc_id", "k")
            .agg(F.sum(F.col("w") * F.col("g")).alias("den"))
        )
        new_w = (
            w.join(vh, ["doc_id", "k"], "left")
            .join(den, ["doc_id", "k"], "left")
            .select(
                "doc_id",
                "k",
                (
                    F.col("w")
                    * F.coalesce("num", F.lit(0.0))
                    / (F.coalesce("den", F.lit(0.0)) + F.lit(_NMF_EPS))
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
        w.unpersist()
        w = new_w

    v.unpersist()
    return w, vocab


@register("doc_topics_nmf")  # rows-only: iterative factorization, no SQL
# oracle; exact-structure numpy replay in tests/test_topics.py
def doc_topics_nmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant NMF topic per document (reference nmf_topic field,
    schemas.py:134): argmax_k W[doc, k] after the multiplicative-update
    factorization, weight milli-quantized."""
    docs = load_tables(spark, sf_dir)["documents"]
    w, _ = nmf_factorize(docs)
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(F.desc("w"), F.asc("k"))
    return (
        w.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("k").cast("long").alias("topic"),
            F.floor(F.col("w") * 1000 + F.lit(0.5)).cast("long").alias(
                "weight_milli"
            ),
        )
    )
