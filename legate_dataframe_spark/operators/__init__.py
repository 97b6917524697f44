from legate_dataframe_spark.operators.join import join, JoinType, BroadcastInput
from legate_dataframe_spark.operators.groupby import groupby_aggregation
from legate_dataframe_spark.operators.reduction import reduce as reduce_column
from legate_dataframe_spark.operators.sort import sort
from legate_dataframe_spark.operators.stream_compaction import (
    apply_boolean_mask,
    distinct,
)
from legate_dataframe_spark.operators.copying import concatenate, copy_if_else, slice as slice_table
from legate_dataframe_spark.operators.filling import sequence
from legate_dataframe_spark.operators.replace import replace_nulls
from legate_dataframe_spark.operators.search import contains
from legate_dataframe_spark.operators.asof import asof_join

__all__ = [
    "join", "JoinType", "BroadcastInput", "groupby_aggregation",
    "reduce_column", "sort", "apply_boolean_mask", "distinct",
    "concatenate", "copy_if_else", "slice_table", "sequence",
    "replace_nulls", "contains", "asof_join",
]
