"""Relational serving layer — the SURVEY.md §2 operator inventory.

Each query re-expresses one reference operator family over the driver
tables (TPC-H-ish star schema + events/documents). Citations in each
docstring point at the reference behavior being covered
(file:line under /root/reference).

Physical-plan conventions (scale-first):
- dimension tables (region/nation/customer/supplier/part at fact scale)
  are broadcast explicitly — the fact-side scan never shuffles for them;
- aggregations go partial→final automatically (algebraic aggregates);
- top-k is window-rank over the GROUPED result (small), never a global
  sort of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from citation_graph_spark.operators import register
from citation_graph_spark.tables import load_tables


def _cents(col) -> "F.Column":
    """Money column (cent-quantized double) → exact integer cents.

    Cross-engine determinism device: sums over bigint cents are exact in
    any order, so Spark and the DuckDB oracle produce bit-identical
    aggregates; doubles reappear only in a final identical expression.
    (At warehouse scale the engine-native answer is DecimalType —
    this keeps the oracle-checked surface order-insensitive.)"""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


# --------------------------------------------------------------------------
# A6/P3/P9 — scan + filter + wide algebraic aggregate (TPC-H Q1 shape)
@register(
    "pricing_summary",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             cast(floor(l_quantity      * 100 + 0.5) AS BIGINT) AS qty_c,
             cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             cast(floor(l_discount      * 100 + 0.5) AS BIGINT) AS disc_c,
             cast(floor(l_tax           * 100 + 0.5) AS BIGINT) AS tax_c
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           sum(qty_c)   / 100.0                                     AS sum_qty,
           sum(price_c) / 100.0                                     AS sum_base_price,
           floor(sum(price_c * (100 - disc_c)) / 100.0 + 0.5) / 100.0
                                                                    AS sum_disc_price,
           floor(sum(price_c * (100 - disc_c) * (100 + tax_c)) / 10000.0 + 0.5)
             / 100.0                                                AS sum_charge,
           floor(sum(qty_c)   * 100.0 / count(*) + 0.5) / 10000.0   AS avg_qty,
           floor(sum(price_c) * 100.0 / count(*) + 0.5) / 10000.0   AS avg_price,
           count(*)                                                 AS count_order
    FROM c GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide aggregate over the fact table (reference A6 running totals,
    scripts/serp_data_processor.py:69-96; P9 date predicate,
    perspectives 'Articles published between')."""
    li = load_tables(spark, sf_dir)["lineitem"]
    qty_c = _cents(F.col("l_quantity"))
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))
    tax_c = _cents(F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c) / 100.0).alias("sum_qty"),
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (
                F.floor(F.sum(price_c * (100 - disc_c)) / 100.0 + F.lit(0.5))
                / 100.0
            ).alias("sum_disc_price"),
            (
                F.floor(
                    F.sum(price_c * (100 - disc_c) * (100 + tax_c)) / 10000.0
                    + F.lit(0.5)
                )
                / 100.0
            ).alias("sum_charge"),
            (F.floor(F.sum(qty_c) * 100.0 / cnt + F.lit(0.5)) / 10000.0).alias(
                "avg_qty"
            ),
            (F.floor(F.sum(price_c) * 100.0 / cnt + F.lit(0.5)) / 10000.0).alias(
                "avg_price"
            ),
            cnt.alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# A1-threshold — the reference flagship "cited more than $minCitations"
@register(
    "orders_per_customer_min",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) > 15
    """,
)
def orders_per_customer_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree with HAVING threshold (reference A1:
    neo4j/loader.py:376-390 num_articles_cite; perspective
    'Articles cited more than $minCitations')."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 15)
    )


# --------------------------------------------------------------------------
# A2 — conditional-count family + broadcast dim join (J6)
@register(
    "nation_customer_stats",
    oracle="""
    SELECT n_name,
           count(*)                                         AS n_customers,
           count(CASE WHEN c_acctbal > 0 THEN 1 END)        AS n_positive_bal,
           floor(sum(cast(floor(c_acctbal * 100 + 0.5) AS BIGINT)) * 1.0
                 / count(*) + 0.5) / 100.0                  AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def nation_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group conditional counts (reference A2 ten-query family,
    neo4j/loader.py:359-444,529-632 — count with pre-filter =
    count(when(cond,1)))."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.count(F.when(F.col("c_acctbal") > 0, 1)).alias("n_positive_bal"),
            (
                F.floor(
                    F.sum(_cents(F.col("c_acctbal"))) * 1.0 / F.count(F.lit(1))
                    + F.lit(0.5)
                )
                / 100.0
            ).alias("avg_bal"),
        )
    )


# --------------------------------------------------------------------------
# A8 — grouped top-k via window rank
@register(
    "brand_top_parts",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, rk FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rk
      FROM part
    ) WHERE rk <= 3
    """,
)
def brand_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (reference A8 'Top $x keywords per year',
    perspectives/topics.json:1 — ORDER BY + COLLECT[0..x] becomes
    window row_number <= k)."""
    p = load_tables(spark, sf_dir)["part"]
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rk")
    )


# --------------------------------------------------------------------------
# A10 — argmax per group (latest flag)
@register(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-per-group (reference A10 latest affiliation → current=true,
    neo4j/loader.py:689-704)."""
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


# --------------------------------------------------------------------------
# J10 — temporal as-of join (window-over-join form)
@register(
    "asof_view_before_purchase",
    oracle="""
    SELECT purchase_id, view_id,
           strftime(view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts
    FROM (
      SELECT p.event_id AS purchase_id, v.event_id AS view_id, v.ts AS view_ts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM events p JOIN events v
        ON v.user_id = p.user_id AND v.ts <= p.ts AND v.event_type = 'view'
      WHERE p.event_type = 'purchase'
    ) WHERE rn = 1
    """,
)
def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's most recent view
    at-or-before it (reference J10 closest-affiliation-by-time,
    neo4j/loader.py:635-660 — ORDER BY time distance COLLECT[0]
    becomes window rank over the keyed range join). Scale path: the
    range join shuffles both sides on user_id; skewed users split by
    AQE."""
    e = load_tables(spark, sf_dir)["events"]
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
    )
    joined = p.join(v, (F.col("vu") == F.col("pu")) & (F.col("vts") <= F.col("pts")))
    w = Window.partitionBy("purchase_id").orderBy(F.desc("vts"), F.desc("view_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "view_id",
            F.date_format("vts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        )
    )


# --------------------------------------------------------------------------
# J12 — anti-pattern join
@register(
    "customers_without_big_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (reference J12 authorless articles, perspective
    '(Debug) Find an article without an author') — customers with no
    order above 400k."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return t["customer"].join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# J5 — semi-join membership
@register(
    "brands_with_supply",
    oracle="""
    SELECT p_brand, count(*) AS n_parts FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    GROUP BY p_brand
    """,
)
def brands_with_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join membership check (reference J5 isin referential checks,
    data_checks/test_article_cites_article.py:9-16)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# --------------------------------------------------------------------------
# J9 — 2-hop derived edges (multi-join star)
@register(
    "nation_trade_pairs",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           count(*) AS n_items,
           sum(cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
             AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    GROUP BY cn.n_name, sn.n_name
    """,
)
def nation_trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop derived edge table (reference J9 AUTHOR_CITES_ARTICLE,
    neo4j/loader.py:490-503): customer-nation ⇄ supplier-nation flow."""
    t = load_tables(spark, sf_dir)
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# J11 — wedge self-join (coauthor pattern)
@register(
    "co_suppliers",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS shared_parts
    FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY a.l_suppkey, b.l_suppkey
    HAVING count(*) >= 120
    """,
)
def co_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wedge self-join (reference J11 coauthors:
    (a)-[:WROTE]->(p)<-[:WROTE]-(b), a<>b — perspective
    'Find coauthors of $person_name')."""
    li = load_tables(spark, sf_dir)["lineitem"]
    ps = li.select("l_partkey", "l_suppkey").distinct()
    a = ps.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("s1"))
    b = ps.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("s2"))
    return (
        a.join(b, "pk")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared_parts"))
        .filter(F.col("shared_parts") >= 120)
    )


# --------------------------------------------------------------------------
# U1 — UNION ALL with provenance tag
@register(
    "segment_union_tagged",
    oracle="""
    SELECT tag, count(*) AS n,
           sum(cast(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0
             AS total_bal FROM (
      SELECT 'building' AS tag, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT 'negative' AS tag, c_acctbal FROM customer WHERE c_acctbal < 0
    ) GROUP BY tag
    """,
)
def segment_union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of overlapping subsets (reference U1 concat of
    published + wip + theses, scripts/gather_articles.py:159-170)."""
    c = load_tables(spark, sf_dir)["customer"]
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.lit("building").alias("tag"), "c_acctbal"
    )
    negative = c.filter(F.col("c_acctbal") < 0).select(
        F.lit("negative").alias("tag"), "c_acctbal"
    )
    return (
        building.unionByName(negative)
        .groupBy("tag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("total_bal"),
        )
    )


# --------------------------------------------------------------------------
# U2 — EXCEPT (difference)
@register(
    "building_without_1996_orders",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def building_without_1996_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (reference U2 missing-embeddings = articles −
    embedded_ids, embed/openai.py:271-281) — expressed as anti join,
    which is the scalable physical form."""
    t = load_tables(spark, sf_dir)
    o96 = t["orders"].filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(o96, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey")
    )


# --------------------------------------------------------------------------
# U3 — INTERSECT (membership both ways)
@register(
    "customers_ordering_and_active",
    oracle="""
    SELECT DISTINCT o_custkey AS c_custkey FROM orders
    INTERSECT
    SELECT DISTINCT user_id AS c_custkey FROM events
    """,
)
def customers_ordering_and_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersection membership (reference U3 embeddings↔articles
    bijection, data_checks/test_embeddings.py:4-14) via double semi-join."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .join(
            t["events"].select(F.col("user_id").alias("c_custkey")).distinct(),
            "c_custkey",
            "left_semi",
        )
    )


# --------------------------------------------------------------------------
# J1/J2 — full-outer join + coalesce/greatest conflict resolution
@register(
    "order_event_totals",
    oracle="""
    WITH o AS (SELECT o_custkey AS k, count(*) AS n_orders,
                      sum(cast(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                            / 100.0 AS order_total
               FROM orders GROUP BY o_custkey),
         e AS (SELECT user_id AS k, count(*) AS n_events,
                      sum(cast(floor(value * 100 + 0.5) AS BIGINT))
                            / 100.0 AS event_total
               FROM events GROUP BY user_id)
    SELECT coalesce(o.k, e.k)            AS ckey,
           coalesce(n_orders, 0)         AS n_orders,
           coalesce(n_events, 0)         AS n_events,
           coalesce(order_total, 0.0)    AS order_total,
           coalesce(event_total, 0.0)    AS event_total,
           greatest(coalesce(order_total, 0.0), coalesce(event_total, 0.0)) AS best_total
    FROM o FULL OUTER JOIN e ON o.k = e.k
    """,
)
def order_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer merge with column-expression conflict resolution
    (reference J1 merge on normalized_title, combine_serp.py:239-245;
    J2 row-loop precedence/max resolution :250-311 — here one select of
    coalesce/greatest, no loop)."""
    t = load_tables(spark, sf_dir)
    o = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("order_total"),
        )
    )
    e = (
        t["events"]
        .groupBy(F.col("user_id").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_cents(F.col("value"))) / 100.0).alias("event_total"),
        )
    )
    j = o.join(e, "k", "full_outer")
    return j.select(
        F.col("k").alias("ckey"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("order_total", F.lit(0.0)).alias("order_total"),
        F.coalesce("event_total", F.lit(0.0)).alias("event_total"),
        F.greatest(
            F.coalesce("order_total", F.lit(0.0)),
            F.coalesce("event_total", F.lit(0.0)),
        ).alias("best_total"),
    )


# --------------------------------------------------------------------------
# A3 — dedup-by-subset with keep-latest semantics
@register(
    "latest_event_per_user_type",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_duplicates(keep='last') semantics (reference A3,
    embed/openai.py:297-299) — window rank, never first()/dropDuplicates
    whose keep-order is partitioning-dependent."""
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# --------------------------------------------------------------------------
# P10/F8 — conditional label rewrite (CASE WHEN bands)
@register(
    "order_price_bands",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'mid'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'xl' END AS band,
           count(*) AS n,
           sum(cast(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM orders GROUP BY band
    """,
)
def order_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional relabeling (reference P10 BBP_Thesis/Unpublished/Book
    rewrite, neo4j/loader.py:194-210)."""
    o = load_tables(spark, sf_dir)["orders"]
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "mid")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("xl")
    )
    return (
        o.withColumn("band", band)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# F1 — normalize-then-group (the reference's join-key normalizer)
@register(
    "normalized_part_names",
    oracle="""
    SELECT nkey, n, rk FROM (
      SELECT nkey, n, row_number() OVER (ORDER BY n DESC, nkey) AS rk FROM (
        SELECT lower(substr(regexp_replace(p_name, '[^A-Za-z]', '', 'g'), 1, 30)) AS nkey,
               count(*) AS n
        FROM part GROUP BY nkey
      )
    ) WHERE rk <= 20
    """,
)
def normalized_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalize_title parity (reference F1, utils.py:76-98: strip
    non-alpha, collapse/remove spaces, lower, truncate 30) as a pure
    column expression feeding a group key — exactly how the reference
    uses it as a merge key (combine_serp.py:239-245)."""
    from citation_graph_spark.functions import normalize_title

    p = load_tables(spark, sf_dir)["part"]
    nkey = normalize_title(F.col("p_name"))
    grouped = p.groupBy(nkey.alias("nkey")).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("nkey"))
    return (
        grouped.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("nkey", "n", "rk")
    )


# --------------------------------------------------------------------------
# F2 — content-hash uid
@register(
    "customer_uid_sha",
    oracle="""
    SELECT c_custkey, substr(sha256(c_name), 1, 8) AS uid FROM customer
    """,
)
def customer_uid_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha-fallback uid (reference F2 generate_unique_id,
    utils.py:56-73: sha256(name)[:8])."""
    from citation_graph_spark.functions import generate_uid

    c = load_tables(spark, sf_dir)["customer"]
    return c.select("c_custkey", generate_uid(F.col("c_name")).alias("uid"))


# --------------------------------------------------------------------------
# P9 — date-range predicate + month rollup
@register(
    "orders_by_month_1996",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           count(*) AS n_orders,
           sum(cast(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY month
    """,
)
def orders_by_month_1996(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range filter (reference P9 'Articles published between',
    perspectives) + calendar rollup. The range predicate is
    partition-prunable when the table is date-partitioned."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00"))
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# P8 — case-insensitive CONTAINS
@register(
    "docs_mentioning_spark",
    oracle="""
    SELECT lang, count(*) AS n_docs FROM documents
    WHERE contains(lower(coalesce(text, '')), 'spark')
    GROUP BY lang
    """,
)
def docs_mentioning_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive containment (reference P8 'Articles mentioning
    $Z': toLower(coalesce(abstract,'')) CONTAINS toLower($Z),
    perspectives/bbp_or_not_perspective.json:1)."""
    d = load_tables(spark, sf_dir)["documents"]
    return (
        d.filter(F.lower(F.coalesce(F.col("text"), F.lit(""))).contains("spark"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# P5 — negated-substring filter (multi-pattern exclusion)
@register(
    "docs_without_boilerplate",
    oracle="""
    SELECT lang, count(*) AS n_docs FROM documents
    WHERE NOT regexp_matches(lower(coalesce(text, '')),
                             'checkpoint|broadcast|salt')
    GROUP BY lang
    """,
)
def docs_without_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negated multi-pattern substring filter (reference P5: drop rows
    whose affiliation text contains any of 6 'unknown/not available'
    markers, extract_affiliations_from_papers.py:128-134) — a single
    negated rlike, pushed into the scan's data filters."""
    d = load_tables(spark, sf_dir)["documents"]
    return (
        d.filter(
            ~F.lower(F.coalesce(F.col("text"), F.lit(""))).rlike(
                "checkpoint|broadcast|salt"
            )
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# top-k join query — revenue leaderboard (J6 + A1 + O4)
@register(
    "top_revenue_customers",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             floor(sum(cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - cast(floor(l_discount * 100 + 0.5) AS BIGINT)))
                   / 100.0 + 0.5) / 100.0 AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, revenue, rk FROM (
      SELECT c_custkey, c_name, revenue,
             row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rk
      FROM rev JOIN customer ON c_custkey = o_custkey
    ) WHERE rk <= 10
    """,
)
def top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join + broadcast dim + global top-k on the small
    aggregated result (reference O3 best-match top-1,
    combine_serp.py:108-113, generalized)."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            (
                F.floor(
                    F.sum(
                        _cents(F.col("l_extendedprice"))
                        * (100 - _cents(F.col("l_discount")))
                    )
                    / 100.0
                    + F.lit(0.5)
                )
                / 100.0
            ).alias("revenue")
        )
    )
    # global top-k as orderBy+limit (TakeOrderedAndProject: per-partition
    # partial top-k, no all-rows-to-one-partition window shuffle); the
    # total (revenue, c_custkey) order keeps it deterministic, and the
    # rank window then runs over only the k survivors
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
        .withColumn("rk", F.row_number().over(w))
    )


# --------------------------------------------------------------------------
# sessionization — gap-based, pure window algebra (no state UDF needed)
@register(
    "event_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, cast(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via lag + conditional sum — the batch
    analog of stateful stream sessionization; interval arithmetic stays
    timezone-free (TIMESTAMP_NTZ both engines)."""
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
    flagged = e.withColumn(
        "new_sess",
        F.when(F.lag("ts").over(w).isNull() | gap, 1).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_sess").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


# --------------------------------------------------------------------------
# quantiles — exact percentile family (sort-based, both engines linear
# interpolation); the missing OLAP aggregate family in the reference
@register(
    "brand_price_quantiles",
    oracle="""
    SELECT p_brand,
           count(*) AS n,
           cast(floor(quantile_cont(cast(floor(p_retailprice * 100 + 0.5) AS BIGINT),
                                    0.5) + 0.5) AS BIGINT) AS median_cents,
           cast(floor(quantile_cont(cast(floor(p_retailprice * 100 + 0.5) AS BIGINT),
                                    0.9) + 0.5) AS BIGINT) AS p90_cents
    FROM part GROUP BY p_brand
    """,
)
def brand_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group, interpolated over
    INTEGER cents: order statistics are then exact in double, so the
    two engines' (algebraically equal, differently-associated)
    interpolation formulas agree — interpolating raw cent-quantized
    doubles would land exactly on half-cent midpoints where a 1-ulp
    difference flips the rounding. (The approximate path at warehouse
    scale is approx_percentile / t-digest; exact-sorted here for the
    oracle.)"""
    p = load_tables(spark, sf_dir)["part"].withColumn(
        "price_c", _cents(F.col("p_retailprice"))
    )

    def cents_q(q):
        return F.floor(F.expr(f"percentile(price_c, {q})") + F.lit(0.5)).cast("long")

    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        cents_q(0.5).alias("median_cents"),
        cents_q(0.9).alias("p90_cents"),
    )


# --------------------------------------------------------------------------
# A4 — set aggregation with deterministic ordering
@register(
    "segments_per_nation",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|')
             AS segments,
           count(DISTINCT c_mktsegment) AS n_segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def segments_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set aggregation (reference A4 distinct-pair collection,
    combine_serp.py:73-79; cluster keyword union,
    process_keywords.py:171-176). collect_set order is partitioning-
    dependent → array_sort makes the result order-insensitive
    (SURVEY §7.2(c) determinism rule applied to collections)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias(
                "segments"
            ),
            F.count_distinct("c_mktsegment").alias("n_segments"),
        )
    )


# --------------------------------------------------------------------------
# OLAP rollup — multi-level grouping-sets aggregate (region > nation >
# grand total) in ONE pass, the cube/report shape every warehouse
# serving layer needs. Generalizes the reference's per-level report
# loops (scripts/serp_data_processor.py:69-96 recomputes each rollup
# level with a separate pandas pass) into a single grouping-sets scan.
@register(
    "revenue_rollup",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           cast(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS lvl,
           count(*) AS n_orders,
           sum(cast(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
             AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count + exact-cents revenue by region, by (region,
    nation), and the grand total — one ``rollup()`` scan instead of
    three groupBys. ``lvl`` is built from per-column ``grouping()``
    bits (order-explicit on both engines; raw GROUPING_ID bit order is
    engine-defined) and rolled-up keys are coalesced to a sentinel so
    the hash never compares engine NULL encodings.

    Scale shape: Catalyst expands rollup into a single Expand +
    hash-aggregate — each input row fans out to its 3 grouping sets
    map-side and partially aggregates before the one shuffle; the dims
    (nation, region) broadcast. At 100 TB this is one fact-table scan
    + one small shuffle of per-(set, key) partials."""
    t = load_tables(spark, sf_dir)
    joined = (
        t["orders"]
        .join(
            # customer scales with the fact side — shuffle join (AQE
            # may still broadcast at small SF); only the true dims
            # below get the explicit broadcast
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_regionkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            (F.grouping("r_name") * 2 + F.grouping("n_name"))
            .cast("long")
            .alias("lvl"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "lvl",
            "n_orders",
            "revenue",
        )
    )
