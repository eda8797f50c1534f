"""Text-analysis operators over the ``documents`` table.

The large-scale training-data-pipeline surface: token counting,
quality scoring, heuristic language ID and content fingerprinting —
all pure column expressions (JVM-side, whole-stage codegen; zero
Python in the hot path), mirroring how the reference keeps its text
normalizers as vectorizable string ops (reference F1 normalize_title
utils.py:76-98, F5 author-name normalizers combine_serp.py:43-58).

Cross-engine parity notes: tokenization is ``trim`` + split on
``\\s+`` on both engines; ratios are exact integer-over-integer double
divisions; hashes are md5/sha256 hex (identical output on both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from citation_graph_spark.operators import register
from citation_graph_spark.tables import load_tables

_STOP_EN = ("the", "a", "of", "and", "is", "to")
_STOP_DE = ("der", "die", "das", "und", "ist")
_STOP_ES = ("el", "la", "los", "y", "es")


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


# --------------------------------------------------------------------------
@register(
    "token_counts",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+'))          AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens,
           length(text)                                        AS n_chars
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document
    — the unit-of-work estimator every training pipeline needs."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).alias(
            "bpe_tokens"
        ),
        F.length("text").alias("n_chars"),
    )


# --------------------------------------------------------------------------
@register(
    "text_quality",
    oracle=rf"""
    WITH feats AS (
      SELECT lang,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             length(text) AS n_chars,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             t -> t IN ({_sql_list(_STOP_EN)}))) AS n_stop,
             len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           floor(sum(n_tokens) * 10000.0 / count(*) + 0.5) / 10000.0     AS avg_tokens,
           floor(sum(n_chars) * 10000.0 / sum(n_tokens) + 0.5) / 10000.0 AS avg_token_len,
           floor(sum(n_stop) * 10000.0 / sum(n_tokens) + 0.5) / 10000.0  AS stopword_ratio,
           floor(sum(n_punct) * 10000.0 / sum(n_chars) + 0.5) / 10000.0  AS punct_ratio
    FROM feats GROUP BY lang
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality profile: token/char statistics, stopword
    ratio, punctuation density — length/punct/stopword heuristics are
    the standard pre-training quality filters."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split(F.trim(F.col("text")), r"\s+")
    stop_arr = F.array(*[F.lit(w) for w in _STOP_EN])
    feats = d.select(
        "lang",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias(
            "n_stop"
        ),
        F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9\s]")).alias("n_punct"),
    )
    def ratio4(num, den):
        # corpus-level ratio over exact integer sums: identical IEEE ops
        # on both engines (never round(double, n) — Spark rounds the
        # shortest decimal repr, DuckDB the binary value; they disagree
        # at .xxx5 boundaries)
        return F.floor(F.sum(num) * 10000.0 / F.sum(den) + F.lit(0.5)) / 10000.0

    return feats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.floor(F.sum("n_tokens") * 10000.0 / F.count(F.lit(1)) + F.lit(0.5))
            / 10000.0
        ).alias("avg_tokens"),
        ratio4(F.col("n_chars"), F.col("n_tokens")).alias("avg_token_len"),
        ratio4(F.col("n_stop"), F.col("n_tokens")).alias("stopword_ratio"),
        ratio4(F.col("n_punct"), F.col("n_chars")).alias("punct_ratio"),
    )


# --------------------------------------------------------------------------
@register(
    "lang_id_heuristic",
    oracle=rf"""
    WITH scored AS (
      SELECT lang,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             t -> t IN ({_sql_list(_STOP_EN)}))) AS s_en,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             t -> t IN ({_sql_list(_STOP_DE)}))) AS s_de,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             t -> t IN ({_sql_list(_STOP_ES)}))) AS s_es
      FROM documents
    )
    SELECT lang,
           CASE WHEN s_en = 0 AND s_de = 0 AND s_es = 0 THEN 'unknown'
                WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_es THEN 'de'
                ELSE 'es' END AS predicted,
           count(*) AS n_docs
    FROM scored GROUP BY lang, predicted
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram-heuristic class): score each
    document against per-language stopword sets, argmax with a fixed
    deterministic precedence (en > de > es on ties)."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split(F.trim(F.col("text")), r"\s+")

    def score(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scored = d.select(
        "lang",
        score(_STOP_EN).alias("s_en"),
        score(_STOP_DE).alias("s_de"),
        score(_STOP_ES).alias("s_es"),
    )
    predicted = (
        F.when(
            (F.col("s_en") == 0) & (F.col("s_de") == 0) & (F.col("s_es") == 0),
            "unknown",
        )
        .when((F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_es")), "en")
        .when(F.col("s_de") >= F.col("s_es"), "de")
        .otherwise("es")
    )
    return (
        scored.withColumn("predicted", predicted)
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
@register(
    "doc_fingerprints",
    oracle=r"""
    SELECT doc_id,
           substr(sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 16)
             AS fingerprint
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint over whitespace-normalized lowercased text
    (reference F2 sha-id utils.py:56-73 generalized to a dedup
    fingerprint). Joining on the fingerprint is the exact-dedup path."""
    d = load_tables(spark, sf_dir)["documents"]
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return d.select(
        "doc_id", F.substring(F.sha2(norm, 256), 1, 16).alias("fingerprint")
    )


# --------------------------------------------------------------------------
@register(
    "top_terms_per_lang",
    oracle=r"""
    SELECT lang, term, n, rk FROM (
      SELECT lang, term, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rk
      FROM (
        SELECT lang, term, count(*) AS n FROM (
          SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS term
          FROM documents
        ) GROUP BY lang, term
      )
    ) WHERE rk <= 5
    """,
)
def top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k terms per language (reference A8 'Top $x keywords per
    year', perspectives/topics.json:1 — explode + count + window)."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split(F.trim(F.col("text")), r"\s+")
    counts = (
        d.select("lang", F.explode(toks).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "term", "n", "rk")
    )


# --------------------------------------------------------------------------
@register(
    "token_histogram",
    oracle=r"""
    SELECT (len(string_split_regex(trim(coalesce(text, '')), '\s+')) // 10) * 10
             AS bucket,
           count(*) AS n_docs,
           cast(sum(length(coalesce(text, ''))) AS BIGINT) AS chars
    FROM documents
    GROUP BY 1
    """,
)
def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length distribution: documents bucketed by whitespace
    token count (width-10 bins, pure integer arithmetic — exact
    cross-engine). The profiling rollup a pipeline runs before setting
    sequence-length / packing parameters; also the shape of any
    sketch-free distribution summary at 100 TB (one map-side-combined
    aggregate, cardinality = number of buckets)."""
    d = load_tables(spark, sf_dir)["documents"]
    # coalesce first: size(split(NULL)) is -1 in Spark (bucket -10)
    # while the oracle would emit a NULL bucket — same null discipline
    # as docs_without_boilerplate
    return (
        d.select(
            F.expr(
                "(size(split(trim(coalesce(text, '')), '\\\\s+')) div 10) * 10"
            ).alias("bucket"),
            F.length(F.coalesce(F.col("text"), F.lit(""))).alias("nc"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nc").cast("long").alias("chars"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "doc_repetition",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      FROM documents
    ),
    tc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    ta AS (
      SELECT doc_id,
             cast(sum(c) AS BIGINT)  AS n_tokens,
             cast(count(*) AS BIGINT) AS n_uniq,
             cast(max(c) AS BIGINT)  AS top_cnt
      FROM tc GROUP BY doc_id
    ),
    tri AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\s+')) AS nt,
             len(list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
               i -> string_split_regex(trim(text), '\s+')[i] || ' '
                 || string_split_regex(trim(text), '\s+')[i + 1] || ' '
                 || string_split_regex(trim(text), '\s+')[i + 2]
             ))) AS n_uniq_tri
      FROM documents
    )
    SELECT ta.doc_id,
           ta.n_tokens,
           CAST(floor((ta.n_tokens - ta.n_uniq) * 10000.0 / ta.n_tokens
                      + 0.5) AS BIGINT) AS dup_token_r4,
           CAST(floor(ta.top_cnt * 10000.0 / ta.n_tokens + 0.5) AS BIGINT)
             AS top_token_r4,
           CAST(CASE WHEN tri.nt >= 3
                THEN floor((tri.nt - 2 - tri.n_uniq_tri) * 10000.0
                           / (tri.nt - 2) + 0.5)
                ELSE 0 END AS BIGINT) AS dup_trigram_r4
    FROM ta JOIN tri ON ta.doc_id = tri.doc_id
    """,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate
    token fraction, most-frequent-token share, duplicate word-trigram
    fraction (ratios quantized to 1e-4 integers, exact cross-engine).
    The standard pre-training repetition filter (Rae et al. 2021 §A1.1
    style); high values flag boilerplate / degenerate generations.

    Scale shape: trigram distinctness is a pure column expression
    (transform + array_distinct — no Generate); token frequencies use
    one explode whose groupBy(doc_id, w) partially aggregates map-side,
    so shuffle volume is per-doc vocabulary, not token count. Everything
    joins back on doc_id — one co-partitioned shuffle at 100 TB."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split(F.trim(F.col("text")), r"\s+")
    tc = (
        d.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_uniq"),
            F.max("c").alias("top_cnt"),
        )
    )
    tri_arr = F.expr(
        "array_distinct(transform("
        "  sequence(0, size(split(trim(text), '\\\\s+')) - 3),"
        "  i -> concat_ws(' ', split(trim(text), '\\\\s+')[i],"
        "       split(trim(text), '\\\\s+')[i+1],"
        "       split(trim(text), '\\\\s+')[i+2])))"
    )
    tri = d.select(
        "doc_id",
        F.size(toks).alias("nt"),
        F.when(F.size(toks) >= 3, F.size(tri_arr)).otherwise(0).alias("n_uniq_tri"),
    )

    def r4(num, den):
        return F.floor(num * 10000.0 / den + F.lit(0.5))

    return tc.join(tri, "doc_id").select(
        "doc_id",
        "n_tokens",
        r4(F.col("n_tokens") - F.col("n_uniq"), F.col("n_tokens")).alias(
            "dup_token_r4"
        ),
        r4(F.col("top_cnt"), F.col("n_tokens")).alias("top_token_r4"),
        F.when(
            F.col("nt") >= 3,
            r4(F.col("nt") - 2 - F.col("n_uniq_tri"), F.col("nt") - 2),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_trigram_r4"),
    )


# --------------------------------------------------------------------------
# Corpus bigram language model + per-document typicality scoring — the
# statistical-LM curation rung (CCNet/KenLM-style perplexity filtering,
# Wenzek et al. 2020) expressed float-free: each bigram occurrence is
# credited its MLE conditional probability P(w2|w1) = C(w1 w2)/C(w1·)
# micro-quantized by integer division, and a document's typicality is
# the integer mean credit. Atypical (low-score) documents are the ones
# perplexity filtering drops; identical ranking, exact cross-engine.
@register(
    "doc_bigram_typicality",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS ts
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ts)),
                    i -> ts[i] || ' ' || ts[i + 1])) AS g
      FROM toks WHERE len(ts) >= 2
    ),
    db AS (SELECT doc_id, g, count(*) AS k FROM bg GROUP BY doc_id, g),
    c12 AS (SELECT g, sum(k) AS c12 FROM db GROUP BY g),
    c1 AS (SELECT split_part(g, ' ', 1) AS w1, sum(k) AS c1
           FROM db GROUP BY 1),
    scored AS (
      SELECT db.doc_id,
             sum(db.k) AS n_bigrams,
             sum(db.k * ((1000000 * c12.c12) // c1.c1)) AS credit_sum
      FROM db
      JOIN c12 USING (g)
      JOIN c1 ON split_part(db.g, ' ', 1) = c1.w1
      GROUP BY db.doc_id
    )
    SELECT d.doc_id,
           cast(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           cast(CASE WHEN coalesce(s.n_bigrams, 0) > 0
                THEN s.credit_sum // s.n_bigrams ELSE 0 END AS BIGINT)
             AS typ_micro
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def doc_bigram_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a corpus bigram model and score every document's mean
    micro-quantized conditional bigram probability (``typ_micro``):
    boilerplate and templated text scores high, lexically anomalous
    text low — the drop signal of LM-perplexity corpus filtering,
    here with the model trained and applied in the SAME distributed
    pass. Reference analog: none (its quality control is manual
    curation); this is the statistical rung a 100-TB pre-training
    corpus needs.

    Scale shape: one bigram explode pre-aggregated per (doc_id,
    bigram) map-side, one bigram-keyed shuffle for C(w1 w2), one
    w1-keyed shuffle for C(w1·), two model joins back on those same
    well-spread keys, one doc_id-keyed final agg — volume O(tokens),
    no self-join. Skewed head bigrams ('of the') are absorbed by
    map-side combine; at 100 TB the model tables would be stored and
    reused across scoring runs (snapshots.py)."""
    return bigram_typicality_scores(load_tables(spark, sf_dir)["documents"])


def bigram_typicality_scores(d: DataFrame) -> DataFrame:
    """Core of doc_bigram_typicality over any (doc_id, text) frame —
    exposed for unit tests and non-fixture corpora."""
    toks = F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+")
    grams = F.when(
        F.size(toks) >= 2,
        F.expr(
            "transform(sequence(0, size(split(trim(lower(coalesce(text, ''))),"
            " '\\\\s+')) - 2), i -> concat_ws(' ',"
            " split(trim(lower(coalesce(text, ''))), '\\\\s+')[i],"
            " split(trim(lower(coalesce(text, ''))), '\\\\s+')[i + 1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    db = (
        d.select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    c12 = db.groupBy("g").agg(F.sum("k").alias("c12"))
    w1 = F.substring_index(F.col("g"), " ", 1)
    c1 = db.groupBy(w1.alias("w1")).agg(F.sum("k").alias("c1"))
    scored = (
        db.join(c12, "g")
        .join(c1, w1 == F.col("w1"))
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(
                F.col("k") * F.expr("(1000000 * c12) div c1")
            ).alias("credit_sum"),
        )
    )
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.expr("credit_sum div n_bigrams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("typ_micro"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "doc_keywords_tfidf",
    oracle=r"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id,
               lower(unnest(string_split_regex(trim(coalesce(text, '')),
                                               '\s+'))) AS term
        FROM documents
      ) WHERE length(term) > 0
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf,
             CAST(t.tf * n.n AS DOUBLE) / d.df AS score
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
      WHERE d.df < n.n
    )
    SELECT doc_id, term, tf,
           CAST(floor(score * 1000 + 0.5) AS BIGINT) AS score_milli,
           rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
)
def doc_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keywords, top-5 — the deterministic analog
    of the reference's LLM keyword extraction stage
    (scripts/topics/agenerate_keywords.py:38-98 prompts an LLM per
    article; here the corpus itself scores the terms). IDF is the raw
    N/df ratio with a universal-term cut (a term in EVERY doc carries
    zero information and is dropped; rarer stopwords are simply
    outranked), so the score tf·N/df needs ONE float rounding step
    (integer product, one division) — bit-identical on both engines;
    ordering ties break on the term.

    Scale shape: two map-side-combined aggregates (tf, df), one
    term-keyed join (vocabulary-sized right side — at corpus scale this
    is the natural shuffle key; hub terms cost one combiner row per
    partition, never a hot reduce key), one per-doc window for the
    top-5."""
    d = load_tables(spark, sf_dir)["documents"]
    n_docs = d.count()
    terms = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
        ).alias("t0"),
    )
    tf = (
        terms.select("doc_id", F.lower(F.col("t0")).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .filter(F.col("df") < F.lit(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "doc_id",
            "term",
            "tf",
            F.floor(F.col("score") * 1000 + F.lit(0.5))
            .cast("long")
            .alias("score_milli"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


# --------------------------------------------------------------------------
# BM25 ranked retrieval — the deterministic analog of the reference's
# search surface (reference: src/citations/data_sources/serpapi.py and
# scripts/search/* rank via an external engine; here the corpus ranks
# itself). Okapi BM25 with k1 = 6/5, b = 3/4 and the raw-ratio IDF
# N/df (the doc_keywords_tfidf convention — no transcendental, so no
# cross-engine libm risk). With those rational constants the whole
# score clears denominators:
#
#   score = (N/df) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
#         = 22·N·tf·L / (df · (10·tf·L + 3·L + 9·dl·N))
#
# (avgdl = L/N; multiply through by 10·L) — every factor is int64, so
# score_milli is ONE integer division: bit-exact on both engines with
# no float contract at all. Overflow bound: 22000·N·tf·L < 2^63 up to
# N·L·tf ≈ 4·10^14 — petabyte-corpus territory at the fixture's doc
# shape; at true web scale the milli scale factor drops to unity.
_BM25_TERMS = ("spark", "join", "window")
_BM25_TOPK = 20


@register(
    "bm25_search",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, term FROM (
        SELECT doc_id,
               lower(unnest(string_split_regex(trim(coalesce(text, '')),
                                               '\s+'))) AS term
        FROM documents
      ) WHERE length(term) > 0
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    g AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT sum(dl) FROM dl) AS l),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}',
                     '{_BM25_TERMS[2]}')
      GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT t.doc_id,
             (22000 * g.n * t.tf * g.l) //
             (d.df * (10 * t.tf * g.l + 3 * g.l + 9 * dl.dl * g.n))
             AS milli
      FROM tf t
        JOIN dfq d USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN g
    )
    SELECT doc_id, CAST(score_milli AS BIGINT) AS score_milli, rk FROM (
      SELECT doc_id, sum(milli) AS score_milli,
             row_number() OVER (ORDER BY sum(milli) DESC, doc_id) AS rk
      FROM contrib GROUP BY doc_id
    ) WHERE rk <= {_BM25_TOPK}
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the fixed 3-term query under integer-exact
    Okapi BM25 (constants above). Scale shape: one tf aggregate over
    the query-term filter (the filter reaches the scan — only matching
    tokens survive the explode), a broadcast-sized df/global join, one
    final global top-k. The global row_number over the scored docs is
    the only single-partition step and it sees ≤ |matching docs| rows —
    at web scale replace with an orderBy(...).limit(k) (same result,
    distributed TopK); kept as the window form so rk lands in the gate
    hash."""
    d = load_tables(spark, sf_dir)["documents"]
    n_docs = d.count()
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
        ).alias("t0"),
    ).select("doc_id", F.lower(F.col("t0")).alias("term")).filter(
        F.length("term") > 0
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    total_l = dl.agg(F.sum("dl")).first()[0]
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            F.expr(
                f"(22000 * {n_docs}L * tf * {total_l}L) div "
                f"(df * (10 * tf * {total_l}L + 3 * {total_l}L"
                f" + 9 * dl * {n_docs}L))"
            ).alias("milli"),
        )
    )
    w = Window.orderBy(F.desc("score_milli"), F.asc("doc_id"))
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("milli").alias("score_milli"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _BM25_TOPK)
        .select("doc_id", F.col("score_milli").cast("long"), F.col("rk").cast("int"))
    )


# --------------------------------------------------------------------------
@register(
    "inverted_index_terms",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               string_split_regex(trim(coalesce(text, '')), '\s+'),
               (x, i) -> struct_pack(term := lower(x), pos := i - 1)
             ) AS l
      FROM documents
    ),
    tok AS (
      SELECT doc_id, u.s.term AS term, u.s.pos AS pos
      FROM toks, unnest(l) AS u(s)
    )
    SELECT doc_id, term, count(*) AS tf,
           string_agg(pos, ',' ORDER BY pos) AS positions
    FROM tok
    WHERE term IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}',
                   '{_BM25_TERMS[2]}')
    GROUP BY doc_id, term
    """,
)
def inverted_index_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index postings for the BM25 query terms:
    (doc_id, term, tf, positions) with positions the 0-based token
    offsets, comma-joined in ascending order — the structure a phrase
    or proximity query walks, and the companion artifact to
    ``bm25_search``'s scores. At corpus scale the term filter bounds
    the explode output to matching tokens (filter sits directly on the
    generated column, before the shuffle) and the groupBy shuffles on
    (doc_id, term) — well-spread keys; the full-vocabulary variant is
    the same plan minus the filter, partitioned by term prefix."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id",
        F.posexplode(
            F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
        ).alias("pos", "t0"),
    ).select("doc_id", "pos", F.lower(F.col("t0")).alias("term"))
    return (
        tok.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("pos")),
                    lambda c: c.cast("string"),
                ),
                ",",
            ).alias("positions"),
        )
    )


@register(
    "proximity_pair_docs",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               string_split_regex(trim(coalesce(text, '')), '\s+'),
               (x, i) -> struct_pack(term := lower(x), pos := i - 1)
             ) AS l
      FROM documents
    ),
    tok AS (
      SELECT doc_id, u.s.term AS term, u.s.pos AS pos
      FROM toks, unnest(l) AS u(s)
    ),
    a AS (SELECT doc_id, pos FROM tok WHERE term = '{_BM25_TERMS[0]}'),
    b AS (SELECT doc_id, pos FROM tok WHERE term = '{_BM25_TERMS[1]}')
    SELECT a.doc_id, count(*) AS n_pairs
    FROM a JOIN b ON a.doc_id = b.doc_id
    WHERE abs(a.pos - b.pos) <= 3
    GROUP BY a.doc_id
    """,
)
def proximity_pair_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search: documents where the first two BM25 query
    terms co-occur within 3 tokens, with the qualifying pair count —
    the query shape the positional index exists to serve. The
    positions join is doc_id-keyed (well-spread); the distance
    predicate rides the equi-join."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id",
        F.posexplode(
            F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
        ).alias("pos", "t0"),
    ).select("doc_id", "pos", F.lower(F.col("t0")).alias("term"))
    a = tok.filter(F.col("term") == _BM25_TERMS[0]).select(
        "doc_id", F.col("pos").alias("pa")
    )
    b = tok.filter(F.col("term") == _BM25_TERMS[1]).select(
        "doc_id", F.col("pos").alias("pb")
    )
    return (
        a.join(b, "doc_id")
        .filter(F.abs(F.col("pa") - F.col("pb")) <= 3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
