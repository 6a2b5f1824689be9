from nyc_bikeshare_datawarehouse_spark.streaming.events import (
    stream_events,
    tumbling_counts,
    sliding_counts,
    session_window_stats,
    stream_stream_interval_join,
    enrich_stream,
    drop_late_rows,
    dedup_stream,
    stream_to_parquet,
    stream_foreach_batch,
    run_available_now,
)
from nyc_bikeshare_datawarehouse_spark.streaming.sketches import (
    countmin_stream,
    histogram_stream,
    hll_stream,
    kmv_stream,
)
from nyc_bikeshare_datawarehouse_spark.streaming.stateful import (
    running_user_totals,
    running_user_totals_tws,
)

__all__ = [
    "countmin_stream",
    "histogram_stream",
    "hll_stream",
    "kmv_stream",
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_window_stats",
    "stream_stream_interval_join",
    "enrich_stream",
    "drop_late_rows",
    "dedup_stream",
    "stream_to_parquet",
    "stream_foreach_batch",
    "run_available_now",
    "running_user_totals",
    "running_user_totals_tws",
]
