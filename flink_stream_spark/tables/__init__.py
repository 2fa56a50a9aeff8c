from flink_stream_spark.tables.managed import ManagedTable, Warehouse

__all__ = ["ManagedTable", "Warehouse"]
