from nyc_bikeshare_datawarehouse_spark.operators.series import timestamp_series
from nyc_bikeshare_datawarehouse_spark.operators.unpivot import unpivot, decode_onehot_flags, pivot_flags
from nyc_bikeshare_datawarehouse_spark.operators.sessionize import sessionize
from nyc_bikeshare_datawarehouse_spark.operators.windows import top_k, deterministic_id, with_date_parts
from nyc_bikeshare_datawarehouse_spark.operators.skew import salted_join, two_phase_agg
from nyc_bikeshare_datawarehouse_spark.operators.asof import asof_join
from nyc_bikeshare_datawarehouse_spark.operators.merge import merge_upsert, changed_rows, scd2_history
from nyc_bikeshare_datawarehouse_spark.operators.sampling import (
    hash_sample,
    mixture_upsample,
    shard_assign,
    split,
    stratified_hash_sample,
    weighted_hash_sample,
)
from nyc_bikeshare_datawarehouse_spark.operators.incremental import incremental_refresh
from nyc_bikeshare_datawarehouse_spark.operators.bloom import bloom_build, bloom_prefilter
from nyc_bikeshare_datawarehouse_spark.operators.layout import write_zordered, zvalue
from nyc_bikeshare_datawarehouse_spark.operators.skew import skew_topk
from nyc_bikeshare_datawarehouse_spark.operators.interval import (
    concurrent_interval_counts,
    interval_overlap_join,
)

__all__ = [
    "scd2_history",
    "hash_sample",
    "stratified_hash_sample",
    "split",
    "incremental_refresh",
    "asof_join",
    "merge_upsert",
    "changed_rows",
    "timestamp_series",
    "unpivot",
    "decode_onehot_flags",
    "pivot_flags",
    "sessionize",
    "top_k",
    "deterministic_id",
    "with_date_parts",
    "salted_join",
    "two_phase_agg",
    "skew_topk",
    "weighted_hash_sample",
    "mixture_upsample",
    "shard_assign",
    "bloom_build",
    "bloom_prefilter",
    "zvalue",
    "write_zordered",
    "interval_overlap_join",
    "concurrent_interval_counts",
]
