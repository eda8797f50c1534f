from citation_graph_spark.streaming.events import (
    EVENT_SCHEMA,
    stream_event_counts,
    windowed_event_stats,
)

__all__ = ["EVENT_SCHEMA", "stream_event_counts", "windowed_event_stats"]
