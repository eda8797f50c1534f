"""Queries exercising the scalar-function library surface (SURVEY §2.8)
that the core relational queries don't already cover: JSON extraction
(F11), array element access (F10), and the blocked fuzzy join (J7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from citation_graph_spark.functions import char_bigrams
from citation_graph_spark.operators import register
from citation_graph_spark.tables import load_tables


# --------------------------------------------------------------------------
# F11 — JSON parse of a string property column
@register(
    "props_json_stats",
    oracle="""
    SELECT event_type,
           count(*)                                  AS n,
           cast(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
           max(json_extract(props, '$.k')::BIGINT)   AS max_k
    FROM events GROUP BY event_type
    """,
)
def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (reference F11 json.loads of embedded
    cluster params, neo4j/loader.py:240-259) — Catalyst's get_json_object
    pushes the parse JVM-side; integer sums stay exact."""
    e = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# --------------------------------------------------------------------------
# F12 — MapType column end-to-end: parse → map → explode → aggregate
@register(
    "event_props_exploded",
    oracle="""
    WITH kv AS (
      SELECT event_type, props, unnest(json_keys(props)) AS prop_key
      FROM events
    ),
    vals AS (
      SELECT event_type, prop_key,
             json_extract_string(props, '$.' || prop_key) AS val
      FROM kv
      WHERE prop_key <> 'etype'
    ),
    pairs AS (
      SELECT event_type, prop_key, val FROM vals
      UNION ALL
      SELECT event_type, 'etype' AS prop_key, event_type AS val FROM events
    )
    SELECT event_type, prop_key,
           count(*) AS n,
           count(DISTINCT val) AS n_vals,
           cast(sum(try_cast(val AS BIGINT)) AS BIGINT) AS sum_val
    FROM pairs GROUP BY event_type, prop_key
    """,
)
def event_props_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real ``MapType`` traffic (reference F12: ``clusters`` /
    ``*_clusters`` map fields, schemas.py:86,127-130, exploded to rows
    at neo4j/loader.py:219-237): JSON props parsed to
    ``map<string,string>``, concatenated with a constructed map,
    ``explode``d to (key, value) rows and aggregated. The non-numeric
    value sums null out via try_cast on both engines."""
    e = load_tables(spark, sf_dir)["events"]
    # map_filter drops a JSON 'etype' key before the concat: a props
    # object carrying that key would otherwise hit Spark's duplicate-
    # map-key EXCEPTION policy (and the oracle's UNION ALL would emit
    # both rows) — the constructed column wins by contract.
    # NULL/malformed props parse to NULL; without the coalesce,
    # map_concat(NULL, map) is NULL and explode would drop the whole
    # row — including the constructed 'etype' entry the oracle's
    # UNION ALL branch still emits for every event.
    m = F.map_concat(
        F.map_filter(
            F.coalesce(
                F.from_json("props", "map<string,string>"),
                F.expr("map()").cast("map<string,string>"),
            ),
            lambda k, _v: k != F.lit("etype"),
        ),
        F.create_map(F.lit("etype"), F.col("event_type")),
    )
    kv = e.select("event_type", F.explode(m).alias("prop_key", "val"))
    return kv.groupBy("event_type", "prop_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("val").alias("n_vals"),
        F.sum(F.expr("try_cast(val AS LONG)")).alias("sum_val"),
    )


# --------------------------------------------------------------------------
# F10 — array element extraction (the reference's [x, y] → columns)
@register(
    "embedding_xy",
    oracle="""
    SELECT vec_id,
           cast(floor(cast(embedding[1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x_milli,
           cast(floor(cast(embedding[2] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS y_milli
    FROM embeddings
    """,
)
def embedding_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array→columns projection (reference F10 umap [x,y] coords →
    umap_x/umap_y properties, neo4j/loader.py:77-105)."""
    e = load_tables(spark, sf_dir)["embeddings"]

    def milli(i):
        return (
            F.floor(F.element_at("embedding", i).cast("double") * 1000 + F.lit(0.5))
            .cast("long")
        )

    return e.select("vec_id", milli(1).alias("x_milli"), milli(2).alias("y_milli"))


# --------------------------------------------------------------------------
# J7 — blocked fuzzy join (entity resolution)
@register(
    "fuzzy_part_names",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    grams AS (
      SELECT name,
             string_split(name, ' ')[-1] AS blk,
             unnest(list_distinct(list_transform(
               generate_series(1, length(name) - 1),
               i -> substr(name, i, 2)))) AS g
      FROM names
    ),
    sizes AS (SELECT name, count(*) AS sz FROM grams GROUP BY name),
    cand AS (
      SELECT a.name AS n1, b.name AS n2, count(*) AS c
      FROM grams a JOIN grams b ON a.blk = b.blk AND a.g = b.g AND a.name < b.name
      GROUP BY a.name, b.name
    ),
    scored AS (
      SELECT n1, n2,
             c * 1.0 / (s1.sz + s2.sz - c) AS j
      FROM cand JOIN sizes s1 ON n1 = s1.name JOIN sizes s2 ON n2 = s2.name
      WHERE c * 1.0 / (s1.sz + s2.sz - c) >= 0.4
    )
    SELECT n1 AS name, n2 AS best_match,
           cast(floor(j * 1000000 + 0.5) AS BIGINT) AS sim_micro
    FROM (
      SELECT *, row_number() OVER (PARTITION BY n1 ORDER BY j DESC, n2) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (reference J7 author entity-resolution,
    combine_serp.py:88-141: block on initials/last-name, score with
    rapidfuzz, keep best). Here: block on the last name token, score
    with exact char-bigram Jaccard (portable column algebra), keep the
    best match per name via window rank — the same
    block → score → keep-first shape, sub-quadratic by construction."""
    p = load_tables(spark, sf_dir)["part"]
    names = p.select(F.col("p_name").alias("name")).distinct()
    grams = names.select(
        "name",
        F.element_at(F.split("name", " "), -1).alias("blk"),
        F.explode(char_bigrams(F.col("name"))).alias("g"),
    )
    sizes = grams.groupBy("name").agg(F.count(F.lit(1)).alias("sz"))
    a = grams.select(F.col("name").alias("n1"), "blk", "g")
    b = grams.select(F.col("name").alias("n2"), "blk", "g")
    cand = (
        a.join(b, ["blk", "g"])
        .filter(F.col("n1") < F.col("n2"))
        .groupBy("n1", "n2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = sizes.select(F.col("name").alias("n1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("name").alias("n2"), F.col("sz").alias("sz2"))
    j = F.col("c") / (F.col("sz1") + F.col("sz2") - F.col("c"))
    scored = (
        cand.join(s1, "n1").join(s2, "n2").withColumn("j", j).filter(F.col("j") >= 0.4)
    )
    w = Window.partitionBy("n1").orderBy(F.desc("j"), F.asc("n2"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("n1").alias("name"),
            F.col("n2").alias("best_match"),
            F.floor(F.col("j") * 1000000 + F.lit(0.5)).cast("long").alias("sim_micro"),
        )
    )