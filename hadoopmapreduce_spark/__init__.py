"""hadoopmapreduce_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query & data-processing
capabilities of the reference repo ``kmushegi/HadoopMapReduce`` (a two-stage
Hadoop MapReduce pipeline computing click-through rate per (referrer, adId);
see ``/root/reference/ClickThru.java``), widened to a full relational operator
library plus LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Design principles (see SURVEY.md):
  * DataFrame/SQL first — declare the logical plan, let Catalyst + AQE pick
    physical strategy (broadcast vs sort-merge, skew splitting, partition
    coalescing).
  * No RDDs in the public surface; Python UDFs only where built-ins cannot
    express the semantics, and then always Arrow-vectorized.
  * Every operator has a DuckDB-oracle SQL twin where SQL-expressible, so the
    driver can differentially verify results.
"""

from hadoopmapreduce_spark.session import get_spark
from hadoopmapreduce_spark.catalog import TABLES, load_table, register_views
from hadoopmapreduce_spark.registry import QUERIES, ORACLES, query

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
    "QUERIES",
    "ORACLES",
    "query",
]

__version__ = "0.1.0"
