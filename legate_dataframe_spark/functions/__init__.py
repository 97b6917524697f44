from legate_dataframe_spark.functions.binaryop import binary_operation, BINARY_OPS
from legate_dataframe_spark.functions.unaryop import unary_operation, UNARY_OPS, cast, round_column
from legate_dataframe_spark.functions.boolean import is_in, is_null, is_not_null, is_nan, not_, is_between
from legate_dataframe_spark.functions.strings import string_function, STRING_OPS
from legate_dataframe_spark.functions.timestamps import to_timestamps, extract_timestamp_component

__all__ = [
    "binary_operation", "BINARY_OPS", "unary_operation", "UNARY_OPS",
    "cast", "round_column", "is_in", "is_null", "is_not_null", "is_nan",
    "not_", "is_between", "string_function", "STRING_OPS",
    "to_timestamps", "extract_timestamp_component",
]
