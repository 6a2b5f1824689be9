from nyc_bikeshare_datawarehouse_spark.sources.readers import (
    load_table,
    load_tables,
    read_binary_files,
    read_csv,
    read_parquet,
    read_text,
    literal_frame,
    empty_frame,
)
from nyc_bikeshare_datawarehouse_spark.sources.sinks import (
    write_csv,
    write_jsonl,
    write_parquet,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_binary_files",
    "read_csv",
    "read_parquet",
    "read_text",
    "literal_frame",
    "empty_frame",
    "write_csv",
    "write_jsonl",
    "write_parquet",
]
