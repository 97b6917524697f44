"""legate_dataframe_spark — a PySpark-native analytics engine.

A brand-new implementation of the query & data-processing capabilities of
rapidsai/legate-dataframe (the reference), re-expressed Spark-first:

- the reference's task-level operators (`/root/reference/cpp/include/
  legate_dataframe/core/library.hpp:28-59`, 28 opcodes) map onto
  `pyspark.sql` DataFrame primitives (``operators/``, ``functions/``,
  ``sources/``);
- the reference's Polars-LazyFrame query layer maps onto Catalyst — we
  declare logical plans with the DataFrame/SQL API and let Catalyst/AQE
  choose the physical strategy (broadcast vs shuffle join, partial aggs,
  top-k pushdown, range-partitioned sort);
- beyond the reference: LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) in ``pipeline/`` and
  event-stream windowing in ``streaming/``.

Nothing here is a port: no Legate/Legion machinery, no C++ translation.
"""

from legate_dataframe_spark.session import get_session
from legate_dataframe_spark.core.table import LogicalTable

__version__ = "0.1.0"

__all__ = ["get_session", "LogicalTable", "__version__"]
