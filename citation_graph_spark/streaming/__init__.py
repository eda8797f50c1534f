from citation_graph_spark.streaming.events import (
    EVENT_SCHEMA,
    stream_event_counts,
    windowed_event_stats,
)
from citation_graph_spark.streaming.incremental import (
    ingest_reference_stream,
    refresh_pagerank,
    resolve_edges,
)

__all__ = [
    "EVENT_SCHEMA",
    "stream_event_counts",
    "windowed_event_stats",
    "ingest_reference_stream",
    "refresh_pagerank",
    "resolve_edges",
]
