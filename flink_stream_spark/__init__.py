"""flink_stream_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference CDC/lakehouse pipeline (thanminh24/Flink-Stream): raw-JSON
event ingest, Debezium-style CDC apply with keyed upserts, a general
relational query surface (the layer the reference delegates to
Flink SQL / Trino), and large-scale training-data-pipeline operators
(dedup, similarity search, text analysis).

Everything is expressed Spark-first: DataFrame / Spark SQL plans that
Catalyst + Tungsten optimize, Structured Streaming for unbounded
inputs, Pandas UDFs only where built-ins cannot express the semantics.
"""

from flink_stream_spark.session import get_spark
from flink_stream_spark.catalog import load_tables, table_path, TABLES

__all__ = ["get_spark", "load_tables", "table_path", "TABLES"]
__version__ = "0.1.0"
