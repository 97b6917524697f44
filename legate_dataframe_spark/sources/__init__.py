from legate_dataframe_spark.sources.parquet import parquet_read, parquet_write, parquet_read_array
from legate_dataframe_spark.sources.csv import csv_read, csv_write
from legate_dataframe_spark.sources.json import json_read

__all__ = [
    "parquet_read", "parquet_write", "parquet_read_array",
    "csv_read", "csv_write", "json_read",
]
