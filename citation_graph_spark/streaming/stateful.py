"""Custom stateful streaming operator — per-user session tracking via
``applyInPandasWithState``.

The batch engine sessionizes with window algebra
(operators/relational.py event_sessions: lag + conditional cumsum).
That needs the whole history per key; a continuously-fed pipeline
instead carries O(1) state per user — (last event time, sessions so
far) — across micro-batches. This is the ``applyInPandasWithState``
shape: grouped Arrow batches in, explicit GroupState holding the
carry, deterministic output per key per trigger.

tests/test_streaming.py asserts the streamed totals equal the batch
window-algebra answer when chunks arrive in event-time order (the
state machine's correctness precondition; out-of-order feeds are the
watermarked-window operator's job, streaming/events.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 30 * 60

_OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
_STATE_SCHEMA = "last_ts double, n_sessions long, n_events long"


def _track_sessions(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = (None, 0, 0)
    import numpy as np

    for pdf in batches:
        if pdf.empty:
            continue
        ts = np.sort(pdf["ts"].astype("int64").to_numpy()) / 1e9  # epoch s
        first_gap = ts[0] - last_ts if last_ts is not None else float("inf")
        # vectorized session-boundary detection: no per-row Python
        n_sessions += int(first_gap > SESSION_GAP_SECONDS) + int(
            (np.diff(ts) > SESSION_GAP_SECONDS).sum()
        )
        n_events += len(ts)
        last_ts = float(ts[-1])
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user running (n_sessions, n_events)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_sessions,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_sessionizer(
    spark: SparkSession, source_dir: str, checkpoint_dir: str
) -> DataFrame:
    """availableNow drive of the stateful sessionizer over a parquet
    directory; returns the final per-user state table (update mode →
    last emission per key wins)."""
    from citation_graph_spark.streaming.events import read_event_stream

    stream = read_event_stream(spark, source_dir, max_files_per_trigger=1)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("session_state")
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per key per trigger; keep the latest
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    raw = spark.table("session_state").withColumn(
        "_ord", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("_ord"))
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_sessions", "n_events")
    )
