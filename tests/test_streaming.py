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
