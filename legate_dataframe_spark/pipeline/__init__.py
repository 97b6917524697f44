from legate_dataframe_spark.pipeline import dedup, similarity, text, multimodal
from legate_dataframe_spark.pipeline.components import (
    connected_components,
    keep_canonical,
)
from legate_dataframe_spark.pipeline.custom import grouped_task
from legate_dataframe_spark.pipeline.sampling import split_by_hash

__all__ = ["dedup", "similarity", "text", "multimodal",
           "connected_components", "keep_canonical", "grouped_task",
           "split_by_hash"]
