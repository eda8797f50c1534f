from citation_graph_spark.streaming.events import (
    EVENT_SCHEMA,
    sliding_event_rates,
    stream_event_counts,
    stream_event_rates_sliding,
    stream_events_exactly_once,
    stream_view_purchase_attribution,
    view_purchase_attribution,
    windowed_event_stats,
)
from citation_graph_spark.streaming.incremental import (
    ingest_reference_stream,
    refresh_pagerank,
    resolve_edges,
)

__all__ = [
    "EVENT_SCHEMA",
    "sliding_event_rates",
    "stream_event_counts",
    "stream_event_rates_sliding",
    "stream_events_exactly_once",
    "stream_view_purchase_attribution",
    "view_purchase_attribution",
    "windowed_event_stats",
    "ingest_reference_stream",
    "refresh_pagerank",
    "resolve_edges",
]
