"""Minimal table-format interface: the seam between the engine and a
concrete table format.

Everything upstream (CDC apply, ingest sinks, IVM refresh, pipelines)
needs only this narrow contract — versioned commits with keyed upsert,
append, delete and snapshot expiry under a catalog that can create,
list, drop and expose tables as SQL views. Two implementations ship:

- :class:`flink_stream_spark.tables.managed.ManagedTable` /
  ``Warehouse`` — the self-contained parquet + JSON-manifest format
  (bucketed layout, zone maps, Z-order, CDF, time travel). Default;
  zero dependencies beyond Spark itself.
- :class:`flink_stream_spark.tables.iceberg.IcebergTable` /
  ``IcebergWarehouse`` — the same contract driven through a REAL
  Apache Iceberg catalog when iceberg-spark runtime jars are on the
  classpath (mirrors the reference's Iceberg catalog DDL,
  flink/jobs/flink_json_to_iceberg.py:28-45, and its v2 upsert tables,
  :61-71). Env-gated: ``iceberg_available(spark)`` probes the jar.

The protocols are ``runtime_checkable`` so conformance is testable
without instantiating either side against a live catalog
(``isinstance`` checks method presence — see
tests/test_iceberg_adapter.py). They intentionally cover only the
shared surface; format-specific extras (zone-map pruned ``read(where=)``,
``zorder``, ``changes``) remain on the concrete classes.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession


@runtime_checkable
class TableHandle(Protocol):
    """One versioned table: every write returns the committed version
    (monotonically increasing; 0 = not yet created)."""

    def exists(self) -> bool: ...

    def current_version(self) -> int: ...

    def read(self, spark: SparkSession) -> DataFrame: ...

    def overwrite(self, df: DataFrame) -> int: ...

    def append(self, df: DataFrame, token: str | None = None) -> int: ...

    def merge(
        self,
        upserts: DataFrame,
        keys: list[str] | None = None,
        deletes: DataFrame | None = None,
    ) -> int: ...

    def expire_snapshots(
        self, retain_last: int = 1, older_than_s: float | None = None
    ) -> int: ...


@runtime_checkable
class TableCatalog(Protocol):
    """A database of :class:`TableHandle`\\ s (the reference's
    CREATE CATALOG / CREATE DATABASE / SHOW TABLES surface)."""

    def table(self, name: str, key_columns: list[str] | None = None) -> TableHandle: ...

    def list_tables(self) -> list[str]: ...

    def drop_table(self, name: str) -> None: ...

    def register_views(self, spark: SparkSession, prefix: str = "") -> list[str]: ...

    def expire_all(
        self, retain_last: int = 1, older_than_s: float | None = None
    ) -> dict: ...
