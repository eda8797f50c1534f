"""Behavioral analytics over the ``events`` stream table: ordered
funnels, transition matrices, retention cohorts.

Reference analog: the reference's event-shaped data is its citation
fetch logs and per-article metrics dashboards (scripts/
serp_fetch_citations.py:59-64 rate-limited request stream); it has no
ordered-sequence analytics at all — these are the standard
product-analytics operators any engine serving an event table must
run, built on the same window/aggregate primitives as
``event_sessions`` (operators/relational.py).

Cross-engine notes: all ordering is the strict (ts, event_id) total
order; interval-free arithmetic (timestamps compared directly,
calendar math on DATE + integer day indices) — no timezone exposure
(TIMESTAMP_NTZ both engines).

Scale posture: every shuffle is keyed on ``user_id`` (funnel passes,
transition lag window, cohort firsts) or on a low-cardinality group
key (stage / type-pair / cohort-week rollups, map-side combined).
The funnel is a fixed number of sequential user-keyed passes — stage
count is a constant, never data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from citation_graph_spark.operators import register
from citation_graph_spark.tables import load_tables

# ordered funnel stages over the synthetic event stream
_FUNNEL = ["signup", "view", "click", "purchase"]
_EPOCH = "2024-01-01"  # cohort week origin (events fixture starts here)


@register(
    "event_funnel",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = '{_FUNNEL[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = '{_FUNNEL[1]}' AND e.ts > s1.t
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = '{_FUNNEL[2]}' AND e.ts > s2.t
      GROUP BY e.user_id
    ),
    s4 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s3 ON e.user_id = s3.user_id
      WHERE e.event_type = '{_FUNNEL[3]}' AND e.ts > s3.t
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS stage, '{_FUNNEL[0]}' AS stage_name,
             (SELECT count(*) FROM s1) AS n_users
      UNION ALL SELECT 2, '{_FUNNEL[1]}', (SELECT count(*) FROM s2)
      UNION ALL SELECT 3, '{_FUNNEL[2]}', (SELECT count(*) FROM s3)
      UNION ALL SELECT 4, '{_FUNNEL[3]}', (SELECT count(*) FROM s4)
    )
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel signup → view → click → purchase: a user
    reaches stage k when an event of stage-k type occurs STRICTLY
    after their first completion of stage k-1 (first-touch semantics,
    the standard product-analytics definition). Returns one row per
    stage with the surviving user count.

    Physical shape: 4 sequential user-keyed min-aggregates, each
    joined (user-keyed, shrinking survivor set) with the event scan —
    stage count is a compile-time constant."""
    e = load_tables(spark, sf_dir)["events"]
    counts = []
    prev = None
    for stage, etype in enumerate(_FUNNEL, start=1):
        ev = e.filter(F.col("event_type") == etype)
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(
                    prev.select("user_id", F.col("t").alias("pt")),
                    "user_id",
                )
                .filter(F.col("ts") > F.col("pt"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        cur = cur.localCheckpoint(eager=True)
        counts.append((stage, etype, cur.count()))
        prev = cur
    return spark.createDataFrame(
        counts, "stage int, stage_name string, n_users long"
    )


@register(
    "event_transitions",
    oracle="""
    SELECT from_type, to_type, count(*) AS n FROM (
      SELECT lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
             event_type AS to_type
      FROM events
    ) WHERE from_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    of each user ((ts, event_id) total order): the behavioral
    fingerprint matrix. One user-keyed window pass + one
    map-side-combined rollup over |types|² keys."""
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "event_retention_cohorts",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id,
             date_diff('day', DATE '{_EPOCH}', min(CAST(ts AS DATE))) // 7
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) // 7
               AS week
      FROM events
    )
    SELECT f.cohort_week,
           a.week - f.cohort_week AS week_offset,
           count(*) AS n_users
    FROM act a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, a.week - f.cohort_week
    """,
)
def event_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-event week
    (the cohort), counted in every later week they return
    (week_offset 0 = the cohort week itself). Integer calendar math on
    a fixed epoch — no timezone or interval arithmetic anywhere.

    Physical shape: one user-keyed min-aggregate, one distinct over
    (user, week), one user-keyed join, one tiny rollup."""
    e = load_tables(spark, sf_dir)["events"]
    week = F.expr(f"datediff(CAST(ts AS DATE), DATE '{_EPOCH}') div 7")
    firsts = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    act = e.select("user_id", week.alias("week")).distinct()
    return (
        act.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --------------------------------------------------------------------------
@register(
    "event_view_purchase_attr",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id AS view_id, ts AS view_ts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id, view_id, purchase_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
    FROM v JOIN p ON v.user_id = p.user_id
      AND purchase_ts >= view_ts
      AND purchase_ts <= view_ts + INTERVAL 1 HOUR
    """,
)
def event_view_purchase_attr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution join, batch form: purchases matched to the same
    user's views in the preceding hour — the SAME plan
    ``streaming/events.py view_purchase_attribution`` runs as a
    watermarked stream-stream join (tests prove streamed == batch).
    The range predicate rides the user_id equi-join; at stream scale
    the watermark + horizon bound the join state."""
    from citation_graph_spark.streaming import view_purchase_attribution

    e = load_tables(spark, sf_dir)["events"]
    return view_purchase_attribution(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
    )
