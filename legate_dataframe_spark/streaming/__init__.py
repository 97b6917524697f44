from legate_dataframe_spark.streaming.windows import (
    tumbling_window_agg,
    sliding_window_agg,
    sessionize,
)
from legate_dataframe_spark.streaming.etl import incremental_etl

__all__ = ["tumbling_window_agg", "sliding_window_agg", "sessionize",
           "incremental_etl"]
