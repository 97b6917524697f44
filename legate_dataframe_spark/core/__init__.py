from legate_dataframe_spark.core.table import LogicalTable

__all__ = ["LogicalTable"]
