from legate_dataframe_spark.core.table import LogicalTable
from legate_dataframe_spark.core.partitioning import widen_partitions
from legate_dataframe_spark.core.skew import salted_join, salted_groupby
from legate_dataframe_spark.core.bucketing import write_bucketed, read_bucketed

__all__ = ["LogicalTable", "widen_partitions", "salted_join",
           "salted_groupby", "write_bucketed", "read_bucketed"]
