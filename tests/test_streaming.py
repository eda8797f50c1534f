"""Streaming ⟷ batch equivalence for the windowed event aggregates.

The streaming path (file source → watermark → windowed state → memory
sink) must produce exactly the batch engine's answer on the same data —
the streaming analog of the DuckDB oracle contract.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from citation_graph_spark.streaming import stream_event_counts, windowed_event_stats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def stream_dirs(tmp_path):
    src = tmp_path / "events_in"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    yield str(src), str(ckpt)
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_windowed_stats_match_batch(spark, stream_dirs):
    src_dir, ckpt_dir = stream_dirs
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # feed the stream in three arrival chunks (out of event-time order)
    target = os.path.join(src_dir, "stream")
    for part in (0, 1, 2):
        chunk = events.filter(F.col("event_id") % 3 == part)
        chunk.write.mode("append").parquet(target)

    streamed = stream_event_counts(spark, target, ckpt_dir)
    batch = (
        windowed_event_stats(events)  # same plan, batch source
        .collect()
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch))
    assert streamed.count() > 0


def test_append_mode_emits_exactly_closed_windows(spark, stream_dirs):
    """Append mode = the production posture: the watermark evicts state
    and a window is emitted exactly once, when the watermark passes its
    end. Result must equal the batch rollup restricted to windows
    closed at end-of-input (window_end <= max(ts) - watermark)."""
    from citation_graph_spark.streaming.events import stream_event_counts_append

    src_dir, ckpt_dir = stream_dirs
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    target = os.path.join(src_dir, "stream")
    for part in (0, 1, 2):
        events.filter(F.col("event_id") % 3 == part).write.mode("append").parquet(
            target
        )

    streamed = stream_event_counts_append(
        spark, target, ckpt_dir, window="1 hour", watermark="2 hours"
    )
    cutoff = events.agg(
        (F.max(F.col("ts").cast("timestamp")) - F.expr("INTERVAL 2 HOURS")).alias("c")
    ).collect()[0]["c"]
    batch = [
        tuple(r)
        for r in windowed_event_stats(events, "1 hour", "2 hours")
        .filter(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(cutoff))
        .collect()
    ]
    got = sorted(map(tuple, streamed.collect()))
    assert got == sorted(batch)
    assert 0 < len(got) < events.count()


def test_stateful_sessionizer_matches_batch(spark, stream_dirs):
    """applyInPandasWithState carry across micro-batches == batch
    window-algebra sessionization, when chunks arrive in event-time
    order (maxFilesPerTrigger=1 → one chunk per trigger)."""
    from citation_graph_spark.operators import QUERIES, load_all
    from citation_graph_spark.streaming.stateful import run_sessionizer

    load_all()
    src_dir, ckpt_dir = stream_dirs
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bounds = events.selectExpr(
        "percentile_approx(ts, 0.33) as t1", "percentile_approx(ts, 0.66) as t2"
    ).collect()[0]
    target = os.path.join(src_dir, "stream")
    chunks = [
        events.filter(F.col("ts") <= bounds["t1"]),
        events.filter((F.col("ts") > bounds["t1"]) & (F.col("ts") <= bounds["t2"])),
        events.filter(F.col("ts") > bounds["t2"]),
    ]
    # one file per chunk so trigger order == event-time order
    for c in chunks:
        c.coalesce(1).write.mode("append").parquet(target)

    streamed = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in run_sessionizer(spark, target, ckpt_dir).collect()
    }
    batch = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in QUERIES["event_sessions"](spark, SF_DIR).collect()
    }
    assert streamed == batch


def test_stream_dedup_matches_batch_dropduplicates(spark, stream_dirs):
    from citation_graph_spark.streaming.events import stream_dedup_events

    src_dir, ckpt_dir = stream_dirs
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").filter(
        F.col("event_id") < 2000
    )
    target = os.path.join(src_dir, "stream")
    # feed every event once, a third of them twice, some three times —
    # duplicate arrivals land in a later chunk but inside the watermark
    events.write.mode("append").parquet(target)
    events.filter(F.col("event_id") % 3 == 0).write.mode("append").parquet(target)
    events.filter(F.col("event_id") % 9 == 0).write.mode("append").parquet(target)

    deduped = stream_dedup_events(spark, target, ckpt_dir)
    assert deduped.count() == events.count()
    assert sorted(r["event_id"] for r in deduped.select("event_id").collect()) == sorted(
        r["event_id"] for r in events.select("event_id").collect()
    )


def test_sliding_windows_match_batch_and_multiplicity(spark, stream_dirs):
    """Sliding-window rates: the streamed result equals the same plan
    run batch, and every event lands in exactly window/slide = 4
    overlapping windows (1h window, 15m slide)."""
    from citation_graph_spark.streaming import (
        sliding_event_rates,
        stream_event_rates_sliding,
    )

    src_dir, ckpt_dir = stream_dirs
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    target = os.path.join(src_dir, "stream")
    for part in (0, 1, 2):
        events.filter(F.col("event_id") % 3 == part).write.mode(
            "append"
        ).parquet(target)

    streamed = stream_event_rates_sliding(spark, target, ckpt_dir)
    batch = sliding_event_rates(events).collect()
    rows = streamed.collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch))
    assert sum(r["n_events"] for r in rows) == 4 * events.count()


def test_stream_stream_attribution_matches_batch(spark, stream_dirs):
    """Watermarked stream-stream inner join == the identical batch
    join on the same rows (inner results emit eagerly; the watermark
    only bounds state)."""
    from citation_graph_spark.streaming import (
        stream_view_purchase_attribution,
        view_purchase_attribution,
    )

    src_dir, ckpt_dir = stream_dirs
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    target = os.path.join(src_dir, "stream")
    for part in (0, 1, 2):
        events.filter(F.col("event_id") % 3 == part).write.mode(
            "append"
        ).parquet(target)

    streamed = stream_view_purchase_attribution(spark, target, ckpt_dir)
    batch = view_purchase_attribution(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
    ).collect()
    assert len(batch) > 0  # the fixture genuinely exercises the join
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch)
    )


def test_foreachbatch_sink_exactly_once(spark, stream_dirs, tmp_path):
    """The foreachBatch parquet sink delivers every source row exactly
    once across multi-batch runs, incremental restarts, AND a full
    replay after the checkpoint is lost (each batch overwrites its own
    batch_id directory — the idempotent-sink half of exactly-once)."""
    import shutil as _sh

    from citation_graph_spark.streaming import stream_events_exactly_once

    src_dir, ckpt_dir = stream_dirs
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    target = os.path.join(src_dir, "stream")
    out = str(tmp_path / "out")
    for part in (0, 1):
        events.filter(F.col("event_id") % 3 == part).write.mode(
            "append"
        ).parquet(target)
    # multi-batch first run (1 file per trigger)
    stream_events_exactly_once(spark, target, ckpt_dir, out, 1)
    n01 = events.filter(F.col("event_id") % 3 != 2).count()
    assert spark.read.parquet(out).count() == n01
    # incremental restart: only the new chunk lands
    events.filter(F.col("event_id") % 3 == 2).write.mode("append").parquet(
        target
    )
    stream_events_exactly_once(spark, target, ckpt_dir, out, 1)
    assert spark.read.parquet(out).count() == events.count()
    # checkpoint lost → full replay → batch ids restart at 0 and
    # overwrite their own directories: still exactly once
    _sh.rmtree(ckpt_dir)
    stream_events_exactly_once(spark, target, ckpt_dir, out, 1)
    got = spark.read.parquet(out)
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()
