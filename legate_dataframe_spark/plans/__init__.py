from legate_dataframe_spark.plans.registry import QUERIES, ORACLES, load_table

__all__ = ["QUERIES", "ORACLES", "load_table"]
