from nyc_bikeshare_datawarehouse_spark.functions import text, similarity, dedup, multimodal

__all__ = ["text", "similarity", "dedup", "multimodal"]
