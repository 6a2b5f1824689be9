from nyc_bikeshare_datawarehouse_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv,
    read_parquet,
    literal_frame,
    empty_frame,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "read_parquet",
    "literal_frame",
    "empty_frame",
]
