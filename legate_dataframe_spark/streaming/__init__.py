from legate_dataframe_spark.streaming.windows import (
    tumbling_window_agg,
    sliding_window_agg,
    sessionize,
)

__all__ = ["tumbling_window_agg", "sliding_window_agg", "sessionize"]
