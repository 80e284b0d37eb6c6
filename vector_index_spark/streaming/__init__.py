from vector_index_spark.streaming.events import (
    hourly_event_stats,
    session_windows,
    stream_hourly_event_stats,
)

__all__ = ["hourly_event_stats", "session_windows", "stream_hourly_event_stats"]
