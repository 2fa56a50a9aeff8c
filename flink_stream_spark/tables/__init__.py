from flink_stream_spark.tables.format import TableCatalog, TableHandle
from flink_stream_spark.tables.managed import ManagedTable, Warehouse

__all__ = ["ManagedTable", "TableCatalog", "TableHandle", "Warehouse"]
