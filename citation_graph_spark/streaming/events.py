"""Structured Streaming ingestion for the events table.

The reference is pure batch (SURVEY §2.10 — its closest analogs are
file-level checkpoint/resume, carried over in checkpointing.py). This
module adds the streaming surface a continuously-fed link-graph
pipeline needs: watermarked event-time windows over an append-only
event source, with exactly the aggregates the batch serving layer
exposes — so streaming results are testable against the batch engine
on identical data (tests/test_streaming.py asserts equality).

Scale posture: source = file/Kafka stream partitioned by arrival;
state = windowed partial aggregates bounded by the watermark; sink =
append-mode parquet/Iceberg. The aggregation is algebraic, so state
per (window, key) is O(1) — no per-event state growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def read_event_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Append-only parquet directory → streaming DataFrame.

    ``maxFilesPerTrigger`` is the ingestion throttle (the pattern the
    reference implements by hand as HTTP rate limiting,
    scripts/serp_fetch_citations.py:62-64)."""
    reader = spark.readStream.schema(EVENT_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def windowed_event_stats(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregate per event type.

    The drop-late-rows / evict-state semantics of the watermark only
    take effect in *append* output mode (``stream_event_counts_append``);
    ``stream_event_counts`` runs complete mode, where Spark keeps all
    window state and late rows still land — the trade-off is append
    only emits a window once the watermark passes its end. Both are the
    streaming analog of the batch ``orders_by_month`` rollup
    (operators/relational.py).

    Watermarks require zoned TIMESTAMP; the NTZ source column is cast
    in-session (UTC in tests), identically on the batch comparator."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sliding_event_rates(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING-window rate per event type — the moving-
    average serving surface (each event lands in window/slide
    overlapping windows; state is still O(1) per open (window, key)
    because the aggregate is algebraic). Same schema as the tumbling
    variant so sinks are interchangeable."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def stream_event_rates_sliding(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """availableNow run of the sliding aggregate over ``source_dir``
    (complete mode, memory sink) — the moving-rate dashboard query."""
    stats = sliding_event_rates(
        read_event_stream(spark, source_dir), window, slide
    )
    q = (
        stats.writeStream.format("memory")
        .queryName("event_rates_sliding")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("event_rates_sliding")


def stream_event_counts(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
) -> DataFrame:
    """Run the windowed aggregation over everything currently in
    ``source_dir`` with availableNow (batch-like, but through the full
    streaming engine: state store, watermarks, checkpointing), write to
    an in-memory sink, return the result table."""
    stats = windowed_event_stats(read_event_stream(spark, source_dir), window)
    q = (
        stats.writeStream.format("memory")
        .queryName("event_stats")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("event_stats")


def stream_event_counts_append(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Append-mode variant: the production posture for an unbounded
    feed. The watermark genuinely drops late rows and evicts window
    state (bounded memory); a window is emitted exactly once, when the
    watermark passes its end — so windows later than
    ``max(ts) - watermark`` are still open at end-of-input and absent
    from the result (tests compare against the batch rollup restricted
    to closed windows)."""
    stats = windowed_event_stats(
        read_event_stream(spark, source_dir), window, watermark
    )
    q = (
        stats.writeStream.format("memory")
        .queryName("event_stats_append")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("event_stats_append")


def stream_dedup_events(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication on event_id —
    ``dropDuplicatesWithinWatermark`` keys the state store on the id
    and evicts each key once the watermark passes, so state stays
    bounded by (dup horizon × arrival rate) instead of growing with
    the full history. This is the streaming rung of the dedup ladder
    (operators/dedup.py): at-least-once upstream delivery (retried
    fetches, replayed batches — the failure mode the reference's
    checkpoint loop tolerates by re-merging, integrate_batch.py) is
    collapsed to exactly-once rows at ingest time.

    Duplicates of an event arriving within ``watermark`` of the first
    copy are guaranteed dropped; re-deliveries later than the horizon
    are out of contract (tests keep dups inside it, matching batch
    dropDuplicates).
    """
    events = read_event_stream(spark, source_dir)
    deduped = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("events_deduped")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("events_deduped")


def view_purchase_attribution(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join — the attribution query:
    each purchase matched to the same user's views in the preceding
    ``horizon``. The event-time range condition is what lets the
    engine evict join state (a view older than watermark + horizon can
    never match again); without it a stream-stream join's state grows
    unboundedly. Inner-join results emit as soon as both sides arrive,
    so an availableNow run equals the identical batch join exactly.

    Works identically on batch inputs (same plan, no watermark
    needed) — the tests run it both ways on the same rows."""
    v = (
        views.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")
        ),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.floor(F.col("purchase_value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("value_cents"),
    )


def stream_view_purchase_attribution(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    horizon: str = "1 hour",
) -> DataFrame:
    """availableNow run of the stream-stream attribution join over the
    event feed in ``source_dir`` (views and purchases read as two
    streams from the same source), append mode, memory sink."""
    ev = read_event_stream(spark, source_dir)
    out = view_purchase_attribution(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        horizon,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("view_purchase_attr")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("view_purchase_attr")


def stream_events_exactly_once(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_path: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """foreachBatch sink with exactly-once delivery over plain
    parquet: every micro-batch lands in its own deterministic
    ``batch_id=<id>`` directory with mode=overwrite, so a batch
    REPLAYED after a crash (Structured Streaming's at-least-once
    foreachBatch contract) rewrites its own directory instead of
    duplicating rows — idempotence is the sink's, not the engine's.
    The same recipe with an Iceberg/Delta table is a MERGE keyed on
    batch id; this is the dependency-free form, and the read side is
    just ``spark.read.parquet(out_path)`` (batch_id is a partition
    column, pruned like any other)."""
    ev = read_event_stream(spark, source_dir, max_files_per_trigger)

    def sink(bdf: DataFrame, bid: int) -> None:
        bdf.write.mode("overwrite").parquet(f"{out_path}/batch_id={bid}")

    q = (
        ev.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
