from nyc_bikeshare_datawarehouse_spark.streaming.events import (
    stream_events,
    tumbling_counts,
    sliding_counts,
    session_window_stats,
    run_available_now,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_window_stats",
    "run_available_now",
]
