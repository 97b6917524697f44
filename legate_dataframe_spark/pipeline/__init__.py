from legate_dataframe_spark.pipeline import dedup, similarity, text, multimodal
from legate_dataframe_spark.pipeline.components import (
    connected_components,
    keep_canonical,
)

__all__ = ["dedup", "similarity", "text", "multimodal",
           "connected_components", "keep_canonical"]
