"""Corpus-curation operators: PII redaction, context-window chunking,
mixture (epoch) weighting — the curation stages a training-data
pipeline runs between dedup/quality filtering and tokenization.

Reference analog: the reference curates its corpus with row-wise
pandas string passes (abstract cleaning in utils.py:76-98, author
normalizers in combine_serp.py:43-58) and fixed CSV snapshots; these
operators are the same curation surface re-expressed as pure Spark
column expressions (JVM-side regex / array ops, whole-stage codegen,
zero Python in the hot path) so they hold at 100 TB: every one is a
narrow per-row transformation — no shuffle at all except the
map-side-combined rollups the caller may add.

Cross-engine notes (the oracle discipline of this registry):
- regexes use the Java-regex ∩ RE2 common subset (character classes,
  bounded repetition, ``\\b``, no lookaround/backrefs) so Spark and
  DuckDB match identically;
- the synthetic fixture text contains no natural PII, so
  ``pii_redaction`` deterministically injects synthetic PII derived
  from ``doc_id`` — identically on both engines — before counting and
  scrubbing; the gate therefore checks the full count+redact pipeline
  with non-trivial hits;
- sampling gates reuse the md5-hex-prefix device of
  operators/sampling.py (engine-independent, recomputable by any
  stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citation_graph_spark.operators import register
from citation_graph_spark.tables import load_tables

# Java-regex ∩ RE2 common subset (see module docstring)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2} \d{3} \d{3} \d{4}"

# context-window chunking: W tokens per chunk, stride S (overlap W-S).
# Fixture docs run 10-99 whitespace tokens, so W=32/S=24 yields 1-4
# chunks per doc and exercises the partial-tail case.
CHUNK_W = 32
CHUNK_S = 24

# mixture weights: lang -> (full epochs, md5-2-hex threshold for one
# extra fractional epoch, or None). '7f' is 128/256 = +0.5 epochs,
# '3f' is 64/256 = +0.25. zh gets 0 full epochs + a 0.5 gate — i.e.
# the same device downsamples and upsamples (temperature-style
# mixture reweighting over language strata).
MIX_WEIGHTS: dict[str, tuple[int, str | None]] = {
    "en": (1, "7f"),  # 1.5 epochs
    "de": (2, "3f"),  # 2.25
    "es": (1, None),  # 1.0
    "fr": (3, None),  # 3.0
    "zh": (0, "7f"),  # 0.5
}


def _enriched_text():
    """coalesce(text,'') + deterministic synthetic PII derived from
    doc_id: one email, one phone, one IPv4 — identical string algebra
    on both engines."""
    did = F.col("doc_id")
    return F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@mail.example.com or +1 415 555 "),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" at 10."),
        (did % 200).cast("string"),
        F.lit("."),
        ((did * 7) % 200).cast("string"),
        F.lit("."),
        (did % 250).cast("string"),
    )


_ENRICH_SQL = (
    "coalesce(text, '') || ' contact user' || cast(doc_id AS VARCHAR)"
    " || '@mail.example.com or +1 415 555 '"
    " || lpad(cast(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' at 10.' || cast(doc_id % 200 AS VARCHAR)"
    " || '.' || cast((doc_id * 7) % 200 AS VARCHAR)"
    " || '.' || cast(doc_id % 250 AS VARCHAR)"
)


@register(
    "pii_redaction",
    oracle=rf"""
    WITH t AS (SELECT doc_id, {_ENRICH_SQL} AS s FROM documents),
    red AS (
      SELECT doc_id, s,
             regexp_replace(
               regexp_replace(
                 regexp_replace(s, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{IPV4_RE}', '<IP>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g') AS r
      FROM t
    )
    SELECT doc_id,
           cast(len(regexp_extract_all(s, '{EMAIL_RE}')) AS BIGINT) AS n_email,
           cast(len(regexp_extract_all(s, '{PHONE_RE}')) AS BIGINT) AS n_phone,
           cast(len(regexp_extract_all(s, '{IPV4_RE}')) AS BIGINT)  AS n_ipv4,
           substr(sha256(r), 1, 16) AS redacted_sha16
    FROM red
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count + scrub emails / phone numbers / IPv4 addresses per
    document (the standard pre-training PII pass). Counts run on the
    pre-redaction text; the redacted content is fingerprinted so the
    gate hashes the exact scrub output, not just the counts. Pure
    regexp column expressions — narrow, shuffle-free, 100 TB-safe."""
    d = load_tables(spark, sf_dir)["documents"]
    s = _enriched_text()
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(s, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(s, F.lit(EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count(s, F.lit(PHONE_RE)).cast("long").alias("n_phone"),
        F.regexp_count(s, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.substring(F.sha2(red, 256), 1, 16).alias("redacted_sha16"),
    )


@register(
    "doc_chunks",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(coalesce(text, '')), '\s+') AS toks,
             len(string_split_regex(trim(coalesce(text, '')), '\s+')) AS nt
      FROM documents
    ),
    c AS (
      SELECT doc_id, nt, toks,
             unnest(range(0, CASE WHEN nt <= {CHUNK_W} THEN 1
                    ELSE ((nt - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S}) + 1
                    END)) AS chunk_idx
      FROM t
    )
    SELECT doc_id,
           cast(chunk_idx AS BIGINT) AS chunk_idx,
           cast(least({CHUNK_W}, nt - chunk_idx * {CHUNK_S}) AS BIGINT)
             AS chunk_tokens,
           substr(sha256(array_to_string(
             list_slice(toks, chunk_idx * {CHUNK_S} + 1,
                        chunk_idx * {CHUNK_S} + {CHUNK_W}), ' ')), 1, 16)
             AS chunk_sha16
    FROM c
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: split each document into
    windows of ``CHUNK_W`` whitespace tokens at stride ``CHUNK_S``
    (overlap ``CHUNK_W - CHUNK_S``); the final partial window is kept.
    This is the sequence-window stage upstream of tokenization/packing.

    Chunk count = 1 if nt ≤ W else ceil((nt − W)/S) + 1, so every token
    lands in ≥1 chunk and the last chunk has ≥1 token. The chunk text
    is fingerprinted (sha256/16) so the gate checks exact window
    boundaries, not just counts.

    Scale shape: one narrow Generate (posexplode of a per-row
    transform) multiplying rows by ~nt/S — no shuffle, no Python;
    at 100 TB this is a map-only stage whose output feeds the
    hash-split / packing stages downstream."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    base = d.select("doc_id", toks.alias("toks")).withColumn(
        "nt", F.size("toks")
    )
    n_chunks = F.when(F.col("nt") <= CHUNK_W, F.lit(1)).otherwise(
        F.expr(f"((nt - {CHUNK_W} + {CHUNK_S} - 1) div {CHUNK_S}) + 1")
    )
    chunks = F.expr(
        f"transform(sequence(0, int(nch) - 1),"
        f" j -> concat_ws(' ', slice(toks, j * {CHUNK_S} + 1, {CHUNK_W})))"
    )
    return (
        base.withColumn("nch", n_chunks)
        .select(
            "doc_id",
            "nt",
            F.posexplode(chunks).alias("chunk_idx", "chunk"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.least(
                F.lit(CHUNK_W), F.col("nt") - F.col("chunk_idx") * CHUNK_S
            )
            .cast("long")
            .alias("chunk_tokens"),
            F.substring(F.sha2(F.col("chunk"), 256), 1, 16).alias(
                "chunk_sha16"
            ),
        )
    )


def _mix_weights_sql() -> str:
    rows = ", ".join(
        f"('{lang}', {base}, {'NULL' if thr is None else repr(thr)})"
        for lang, (base, thr) in sorted(MIX_WEIGHTS.items())
    )
    return f"(VALUES {rows}) AS w(lang, base, thr)"


@register(
    "corpus_mixture",
    oracle=f"""
    WITH c AS (
      SELECT d.doc_id, d.lang,
             w.base + CASE WHEN w.thr IS NOT NULL
                            AND substr(md5(cast(d.doc_id AS VARCHAR) || ':mix'),
                                       1, 2) <= w.thr
                      THEN 1 ELSE 0 END AS copies
      FROM documents d JOIN {_mix_weights_sql()} USING (lang)
    )
    SELECT lang, doc_id, cast(epoch AS BIGINT) AS epoch FROM (
      SELECT lang, doc_id, unnest(generate_series(1, copies)) AS epoch
      FROM c WHERE copies >= 1
    )
    """,
)
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture / epoch weighting over language strata: each document is
    replicated ``floor(weight)`` times, plus one extra copy for the
    md5-gated fraction of documents that realizes the fractional part
    (``MIX_WEIGHTS``; the same hex-prefix device as
    operators/sampling.py, so membership is engine-independent and
    recomputable). Weights < 1 downsample with the identical gate —
    zh at 0.5 emits roughly half its documents once — which is the
    temperature-style mixture reweighting step of a pre-training data
    recipe (fixed per-stratum target epochs, deterministic at any
    scale, no rand()).

    Scale shape: a broadcast 5-row weight join + one narrow explode of
    sequence(1, copies) — no shuffle; output size = Σ weights · rows."""
    d = load_tables(spark, sf_dir)["documents"]
    base = F.lit(None).cast("int")
    thr = F.lit(None).cast("string")
    for lang, (b, t) in sorted(MIX_WEIGHTS.items()):
        base = F.when(F.col("lang") == lang, F.lit(b)).otherwise(base)
        thr = F.when(
            F.col("lang") == lang,
            F.lit(t) if t is not None else F.lit(None).cast("string"),
        ).otherwise(thr)
    gate = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))), 1, 2
    )
    copies = base + F.when(
        thr.isNotNull() & (gate <= thr), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        d.filter(F.col("lang").isin(*MIX_WEIGHTS))
        .withColumn("copies", copies)
        .filter(F.col("copies") >= 1)
        .select(
            "lang",
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("epoch"),
        )
        .withColumn("epoch", F.col("epoch").cast("long"))
    )
