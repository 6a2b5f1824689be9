from nyc_bikeshare_datawarehouse_spark.functions import (
    contamination,
    dedup,
    drift,
    fuzzy,
    multimodal,
    similarity,
    sketches,
    text,
)

__all__ = [
    "contamination",
    "dedup",
    "drift",
    "fuzzy",
    "multimodal",
    "similarity",
    "sketches",
    "text",
]
