"""Tokenization-stage operators: sequence packing and BPE merge
statistics — the stages between chunking (operators/curation.py
``doc_chunks``) and the actual trainer.

Reference analog: the reference stops at flat per-article text fields
(schemas.py ``abstract``/``title``; row-wise pandas cleaning in
utils.py:76-98) and never packs sequences — these operators extend the
engine's training-data surface the same way the dedup/quality family
does, re-expressed Spark-first.

Scale posture:
- ``context_packing`` is the concatenate-and-split packing real
  pipelines run: token streams are concatenated in a deterministic
  order and cut every ``PACK_L`` tokens. Packing is inherently
  sequential, so it is parallelized the way a 1000-executor job would:
  documents are hash-sharded (``NSHARDS`` strata), each shard packs
  independently with a window cumsum — ONE exchange on the shard key,
  skew bounded by the hash. At 100 TB, NSHARDS grows with the input
  (it is a parameter, not a constant of the algorithm).
- ``bpe_pair_counts`` is one BPE merge round: adjacent-token pair
  frequencies. Pair explosion is a narrow per-row transform;
  the count is a map-side-combined groupBy (heavy-hitter pairs
  collapse to one row per partition before the shuffle); the top-k is
  a TakeOrdered, never a global sort materialization.

Cross-engine notes: tokenization is the whitespace split used by
``token_counts``/``doc_chunks`` (parity long established by the gate);
window frames are the default RANGE-to-current on a unique orderBy key
(identical on both engines); top-k ordering is the strict total order
(n DESC, pair ASC) so the cut is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from citation_graph_spark.operators import register
from citation_graph_spark.tables import load_tables

# context length and shard count for packing. Fixture docs run 10-99
# whitespace tokens, so L=64 yields multi-doc packs AND docs that span
# pack boundaries — both split cases exercised. NSHARDS=8 keeps several
# packs per shard at sf0.001.
PACK_L = 64
NSHARDS = 8

# BPE statistics: report the TOP_K most frequent adjacent pairs.
BPE_TOP_K = 100


def _toks():
    return F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")


_TOKS_SQL = r"string_split_regex(trim(coalesce(text, '')), '\s+')"


@register(
    "context_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len({_TOKS_SQL}) AS nt,
             doc_id % {NSHARDS} AS shard
      FROM documents
    ),
    c AS (
      SELECT shard, doc_id, nt,
             -- DuckDB windowed sum(BIGINT) yields HUGEINT; range() needs BIGINT
             cast(sum(nt) OVER (PARTITION BY shard ORDER BY doc_id)
                  AS BIGINT) AS cum
      FROM t
    ),
    e AS (
      SELECT shard, doc_id, nt, cum,
             unnest(range((cum - nt) // {PACK_L},
                          ((cum - 1) // {PACK_L}) + 1)) AS pack_id
      FROM c
    )
    SELECT cast(shard AS BIGINT) AS shard,
           cast(pack_id AS BIGINT) AS pack_id,
           doc_id,
           cast(least(cum, (pack_id + 1) * {PACK_L})
                - greatest(cum - nt, pack_id * {PACK_L}) AS BIGINT)
             AS pack_tokens
    FROM e
    """,
)
def context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-split sequence packing: documents are
    hash-sharded, each shard's token streams are concatenated in
    doc_id order and cut every ``PACK_L`` tokens. One output row per
    (document, context) incidence with the token count that document
    contributes to that context — the pack manifest a loader needs.

    Every shard's packs are full (exactly ``PACK_L`` tokens) except
    its last; a long document spans consecutive packs. Deterministic
    at any scale (no rand(); order is the doc_id total order within a
    shard). Physical shape: one exchange on the shard key for the
    window cumsum, then a narrow sequence-explode."""
    d = load_tables(spark, sf_dir)["documents"]
    base = d.select(
        "doc_id",
        F.size(_toks()).alias("nt"),
        F.pmod(F.col("doc_id"), F.lit(NSHARDS)).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    return (
        base.withColumn("cum", F.sum("nt").over(w))
        .withColumn("first_pack", F.expr(f"(cum - nt) div {PACK_L}"))
        .withColumn("last_pack", F.expr(f"(cum - 1) div {PACK_L}"))
        .select(
            "shard",
            "doc_id",
            "nt",
            "cum",
            F.explode(F.sequence("first_pack", "last_pack")).alias("pack_id"),
        )
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.col("pack_id").cast("long").alias("pack_id"),
            "doc_id",
            (
                F.least(F.col("cum"), (F.col("pack_id") + 1) * PACK_L)
                - F.greatest(F.col("cum") - F.col("nt"), F.col("pack_id") * PACK_L)
            )
            .cast("long")
            .alias("pack_tokens"),
        )
    )


@register(
    "bpe_pair_counts",
    oracle=f"""
    WITH t AS (SELECT {_TOKS_SQL} AS toks FROM documents),
    p AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1]))
               AS pair
      FROM t
    )
    SELECT pair, cast(count(*) AS BIGINT) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {BPE_TOP_K}
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge round: the ``BPE_TOP_K`` most frequent adjacent
    whitespace-token pairs across the corpus (strict total order
    (n DESC, pair ASC) so the cut is deterministic on both engines).
    Iterating this — merge the winner, re-split, recount — is exactly
    the BPE training loop; one round is the distributed primitive.

    Physical shape: narrow pair explode → map-side-combined groupBy →
    TakeOrdered top-k (no global sort materialization)."""
    d = load_tables(spark, sf_dir)["documents"]
    base = d.select(_toks().alias("toks"))
    pairs = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(0, size(toks) - 2),"
        " i -> concat(toks[i], ' ', toks[i + 1])) "
        "ELSE array() END"
    )
    return (
        base.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOP_K)
    )


# --------------------------------------------------------------------------
# Full BPE merge-rule LEARNING (Sennrich, Haddow, Birch 2016) — the
# iterative loop bpe_pair_counts is one round of, run to K rules.
_BPE_MERGES = 20


def _sym_lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_learn(words: DataFrame, n_merges: int = _BPE_MERGES) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from a ``(word, count)``
    vocabulary: start from character symbols, each round count
    adjacent symbol pairs weighted by word frequency, merge the most
    frequent pair (ties: lexicographic) left-to-right non-overlapping
    in every word, record the rule. Returns
    ``(rank, left, right, n)`` — the learned merge table.

    Distribution: the state is the (distinct-word, count, symbol
    array) table — orders of magnitude smaller than the corpus — kept
    hash-partitioned and localCheckpoint-ed per round; pair counting
    is an explode + map-side-combined groupBy (ONE shuffle per round);
    the argmax is a 1-row TakeOrdered; the merge itself is a narrow
    per-row ``aggregate()`` fold, no shuffle. Driver sees exactly one
    (pair, count) scalar per round. Stops early when no pair repeats
    (count < 2 learns nothing)."""
    spark = words.sparkSession
    vocab = words.select(
        "count",
        F.expr("split(word, '')").alias("syms"),
    ).localCheckpoint(eager=True)
    rules = []
    for rank in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                "count",
                F.explode(
                    # sequence(0, -1) DESCENDS in Spark — guard 1-char words
                    F.when(
                        F.size("syms") >= 2,
                        F.expr(
                            "transform(sequence(0, size(syms) - 2),"
                            " i -> struct(syms[i] AS l, syms[i + 1] AS r))"
                        ),
                    ).otherwise(F.expr("cast(array() as array<struct<l:string,r:string>>)"))
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("count").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).take(1)
        if not best or best[0]["n"] < 2:
            break
        left, right, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        rules.append((rank, left, right, n))
        la, rb = _sym_lit(left), _sym_lit(right)
        vocab = vocab.select(
            "count",
            F.expr(
                f"""aggregate(syms, cast(array() as array<string>),
                  (acc, x) -> case
                    when size(acc) > 0 and element_at(acc, -1) = {la}
                         and x = {rb}
                    then concat(slice(acc, 1, size(acc) - 1),
                                array(concat({la}, {rb})))
                    else concat(acc, array(x)) end)"""
            ).alias("syms"),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        rules, "rank long, left string, right string, n long"
    )


@register("bpe_learn_merges")
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table over the documents corpus: word
    vocabulary = whitespace tokens with corpus frequencies, 20 merge
    rules. Rows-only for the driver gate (the merge loop is iterative,
    not single-SQL-expressible); exactness is pinned by
    tests/test_tokenization.py's sequential replay of the identical
    schedule."""
    d = load_tables(spark, sf_dir)["documents"]
    words = (
        d.select(F.explode(_toks()).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return bpe_learn(words, _BPE_MERGES)


# --------------------------------------------------------------------------
# BPE ENCODING — apply a learned merge table to the corpus. The learn
# loop above is iterative; encoding is not: the rank-ordered rule chain
# compiles into one nested column expression (one fold per rule), so
# the whole corpus encodes in a single narrow pass — zero shuffles, no
# Python in the row path, trivially parallel at any scale.
def _encode_word_expr(rules: list[tuple[str, str]], inner: str) -> str:
    """Chain one left-to-right non-overlapping merge fold per rule, in
    rank order, around the char-split expression ``inner`` — the exact
    per-round merge semantics of ``bpe_learn``."""
    for i, (left, right) in enumerate(rules):
        la, rb = _sym_lit(left), _sym_lit(right)
        inner = (
            f"aggregate({inner}, cast(array() as array<string>), "
            f"(a{i}, x{i}) -> case "
            f"when size(a{i}) > 0 and element_at(a{i}, -1) = {la} "
            f"and x{i} = {rb} "
            f"then concat(slice(a{i}, 1, size(a{i}) - 1), "
            f"array(concat({la}, {rb}))) "
            f"else concat(a{i}, array(x{i})) end)"
        )
    return inner


def bpe_encode(docs: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Encode ``documents(doc_id, text)`` with a rank-ordered merge
    list: per doc ``(doc_id, n_words, n_chars, n_subwords)`` plus the
    encoded subword array. Rules apply per word (BPE never merges
    across whitespace), each rule left-to-right non-overlapping —
    replaying the training fold exactly, so a corpus encoded with its
    own learned table reproduces the trainer's final symbol state."""
    words_expr = (
        r"filter(split(trim(coalesce(text, '')), '\\s+'),"
        " w -> length(w) > 0)"
    )
    split_chars = "split(w, '')"
    enc = (
        f"transform({words_expr}, "
        f"w -> {_encode_word_expr(rules, split_chars)})"
    )
    return docs.select(
        "doc_id",
        F.expr(f"size({words_expr})").cast("long").alias("n_words"),
        F.expr(f"aggregate({words_expr}, 0L, (s, w) -> s + length(w))")
        .cast("long")
        .alias("n_chars"),
        F.expr(f"size(flatten({enc}))").cast("long").alias("n_subwords"),
        F.expr(f"flatten({enc})").alias("subwords"),
    )


@register("bpe_encode_docs")
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoded with its own learned 20-rule BPE table: per doc
    ``(doc_id, n_words, n_chars, n_subwords, compression_milli)`` —
    the tokenizer-serving stage after ``bpe_learn_merges``. Rows-only
    for the driver gate (the rule table comes from the iterative learn
    loop); exactness is pinned by tests/test_tokenization.py's
    sequential learn+encode replay."""
    d = load_tables(spark, sf_dir)["documents"]
    words = (
        d.select(F.explode(_toks()).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    rules = [
        (r["left"], r["right"])
        for r in bpe_learn(words, _BPE_MERGES).orderBy("rank").collect()
    ]
    enc = bpe_encode(d.select("doc_id", "text"), rules)
    return enc.select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_subwords",
        # chars-per-subword in milli — the compression the table buys
        F.when(
            F.col("n_subwords") > 0,
            F.floor(
                F.col("n_chars") * 1000 / F.col("n_subwords") + F.lit(0.5)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("compression_milli"),
    )
