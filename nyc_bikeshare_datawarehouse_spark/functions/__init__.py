from nyc_bikeshare_datawarehouse_spark.functions import (
    contamination,
    dedup,
    multimodal,
    similarity,
    sketches,
    text,
)

__all__ = ["contamination", "dedup", "multimodal", "similarity", "sketches", "text"]
