from nyc_bikeshare_datawarehouse_spark.warehouse import builders, quality

__all__ = ["builders", "quality"]
