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
