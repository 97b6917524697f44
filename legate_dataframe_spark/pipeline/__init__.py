from legate_dataframe_spark.pipeline import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]
