from nyc_bikeshare_datawarehouse_spark.streaming.events import (
    stream_events,
    tumbling_counts,
    sliding_counts,
    session_window_stats,
    stream_to_parquet,
    stream_foreach_batch,
    run_available_now,
)
from nyc_bikeshare_datawarehouse_spark.streaming.stateful import running_user_totals

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_window_stats",
    "stream_to_parquet",
    "stream_foreach_batch",
    "run_available_now",
    "running_user_totals",
]
