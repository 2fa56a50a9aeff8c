"""Apache Iceberg implementation of the table-format seam.

Drives a REAL Iceberg catalog through iceberg-spark when the runtime
jars are on the classpath, exposing the exact
:class:`flink_stream_spark.tables.format.TableCatalog` /
``TableHandle`` contract the parquet+manifest ``Warehouse`` implements
— so every pipeline stage written against the seam (CDC apply, ingest
sinks, IVM) runs unchanged over Iceberg tables.

Mirrors the reference's production path: an Iceberg catalog created
via DDL (flink/jobs/flink_json_to_iceberg.py:28-45 — CREATE CATALOG
... type iceberg + CREATE DATABASE) holding format-version-2 upsert
tables keyed on primary keys (:61-71), with snapshot maintenance via
the catalog's expire procedure (snapshot_mgmt.py:13-19).

Env-gated by :func:`iceberg_available` — this sandbox ships no Iceberg
jars (and has no network to fetch them; dated note in README), so the
integration smoke in tests/test_iceberg_adapter.py skips there, while
the interface-conformance checks always run. On a cluster:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> ...
    wh = IcebergWarehouse(spark, "s3://bucket/warehouse")   # or local path
    t = wh.table("account", key_columns=["user_id"])
    t.merge(upserts, deletes=deleted_keys)                   # v2 row-level ops
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _q(ident: str) -> str:
    """Backtick-quote each dot-separated identifier part."""
    return ".".join(f"`{p}`" for p in ident.split("."))


def merge_on_clause(keys: list[str]) -> str:
    return " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)


def merge_upsert_sql(ident: str, src_view: str, keys: list[str]) -> str:
    """The v2 row-level upsert statement (reference's upsert-enabled
    table semantics, flink_json_to_iceberg.py:61-71). Unit-testable
    without jars — the statement text is the contract."""
    return (
        f"MERGE INTO {_q(ident)} t USING {src_view} s "
        f"ON {merge_on_clause(keys)} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def merge_delete_sql(ident: str, src_view: str, keys: list[str]) -> str:
    """Equality-delete via MERGE (Iceberg v2 delete-file semantics)."""
    return (
        f"MERGE INTO {_q(ident)} t USING {src_view} s "
        f"ON {merge_on_clause(keys)} "
        "WHEN MATCHED THEN DELETE"
    )


class IcebergTable:
    """One Iceberg v2 table under an :class:`IcebergWarehouse`.

    Versions are snapshot ordinals (count of committed snapshots), so
    ``current_version`` grows by one per commit exactly like
    ``ManagedTable``; 0 = table absent or empty of snapshots.
    """

    def __init__(
        self,
        spark: SparkSession,
        catalog: str,
        namespace: str,
        name: str,
        key_columns: list[str] | None = None,
    ):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.name = name
        self.key_columns = key_columns
        self.ident = f"{catalog}.{namespace}.{name}"

    # -- introspection -------------------------------------------------
    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.ident)

    def current_version(self) -> int:
        if not self.exists():
            return 0
        return self.spark.table(f"{self.ident}.snapshots").count()

    def snapshots(self, spark: SparkSession | None = None) -> DataFrame:
        """The $snapshots metadata table (native Iceberg)."""
        return (spark or self.spark).table(f"{self.ident}.snapshots")

    def files(self, spark: SparkSession | None = None) -> DataFrame:
        """The $files metadata table (native Iceberg)."""
        return (spark or self.spark).table(f"{self.ident}.files")

    def committed_tokens(self) -> set[str]:
        """Idempotency tokens recorded in snapshot summaries (the
        at-least-once replay guard ``ManagedTable`` implements with
        manifest fields; here a ``graft-token`` snapshot property)."""
        if not self.exists():
            return set()
        rows = (
            self.spark.table(f"{self.ident}.snapshots")
            .select("summary")
            .collect()
        )
        return {
            r["summary"]["graft-token"]
            for r in rows
            if r["summary"] and r["summary"].get("graft-token")
        }

    # -- reads ---------------------------------------------------------
    def read(self, spark: SparkSession | None = None) -> DataFrame:
        return (spark or self.spark).table(self.ident)

    # -- writes (each returns the committed version) -------------------
    def _writer(self, df: DataFrame, token: str | None):
        w = df.writeTo(self.ident).using("iceberg").tableProperty(
            "format-version", "2"
        )
        if token is not None:
            w = w.option("snapshot-property.graft-token", token)
        return w

    def overwrite(self, df: DataFrame) -> int:
        self._writer(df, None).createOrReplace()
        return self.current_version()

    def append(self, df: DataFrame, token: str | None = None) -> int:
        if token is not None and token in self.committed_tokens():
            return self.current_version()
        if not self.exists():
            self._writer(df, token).create()
        else:
            self._writer(df, token).append()
        return self.current_version()

    def merge(
        self,
        upserts: DataFrame,
        keys: list[str] | None = None,
        deletes: DataFrame | None = None,
        validate_unique_keys: bool = True,  # parity arg; Iceberg MERGE
        token: str | None = None,  #          enforces this natively
    ) -> int:
        """Keyed upsert + optional delete via Iceberg v2 MERGE INTO —
        the reference's upsert-enabled table write
        (flink_json_to_iceberg.py:61-71). ``upserts`` must carry at
        most one row per key (Iceberg raises on a multi-match MERGE —
        the same contract ``ManagedTable.merge`` enforces explicitly).

        One snapshot for the upsert MERGE plus one for the delete
        MERGE when ``deletes`` is given (Iceberg cannot combine two
        source frames in one commit; ``ManagedTable`` does it in one).
        """
        keys = keys or self.key_columns
        if not keys:
            raise ValueError(f"merge into {self.name} requires key columns")
        if token is not None and token in self.committed_tokens():
            return self.current_version()
        if not self.exists():
            empty = upserts.limit(0)
            self._writer(empty, None).create()
        # temp views are session-global: a fixed name would let two
        # concurrent merges on the same table clobber each other's
        # source view mid-MERGE (silently merging the wrong rows) —
        # suffix with uuid4 like managed.py's staging dirs
        run = uuid.uuid4().hex
        src = f"__graft_merge_src_{self.name}_{run}"
        upserts.createOrReplaceTempView(src)
        try:
            self.spark.sql(merge_upsert_sql(self.ident, src, keys))
        finally:
            self.spark.catalog.dropTempView(src)
        if deletes is not None:
            dsrc = f"__graft_merge_del_{self.name}_{run}"
            deletes.select(*keys).createOrReplaceTempView(dsrc)
            try:
                self.spark.sql(merge_delete_sql(self.ident, dsrc, keys))
            finally:
                self.spark.catalog.dropTempView(dsrc)
        return self.current_version()

    def delete_where(self, spark: SparkSession, where_sql: str) -> int:
        """Predicate delete (retention) — Iceberg row-level DELETE."""
        (spark or self.spark).sql(
            f"DELETE FROM {_q(self.ident)} WHERE {where_sql}"
        )
        return self.current_version()

    # -- maintenance ---------------------------------------------------
    def expire_snapshots(
        self, retain_last: int = 1, older_than_s: float | None = None
    ) -> int:
        """Expire old snapshots via the catalog procedure
        (reference snapshot_mgmt.py:13-19). Returns snapshots removed."""
        if not self.exists():
            return 0
        before = self.current_version()
        cutoff_ms = int((time.time() - (older_than_s or 0.0)) * 1000)
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{self.namespace}.{self.name}', "
            f"older_than => {cutoff_ms}L, "
            f"retain_last => {int(retain_last)})"
        )
        return before - self.current_version()


class IcebergWarehouse:
    """A namespace of Iceberg tables behind the ``TableCatalog`` seam.

    Configures a Hadoop-type Iceberg catalog on the LIVE session
    (Spark resolves ``spark.sql.catalog.*`` lazily on first reference,
    so no session restart is needed) and creates the namespace —
    the runtime equivalent of the reference's CREATE CATALOG +
    CREATE DATABASE DDL (flink_json_to_iceberg.py:28-57).
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        catalog: str = "graft",
        namespace: str = "db",
    ):
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark runtime jars are not on the classpath; "
                "launch with --packages org.apache.iceberg:"
                "iceberg-spark-runtime-<spark>_<scala>:<ver> "
                "(see README 'Optional connectors')"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.conf.set(
            f"spark.sql.catalog.{catalog}",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        spark.conf.set(f"spark.sql.catalog.{catalog}.type", "hadoop")
        spark.conf.set(f"spark.sql.catalog.{catalog}.warehouse", warehouse_dir)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def table(
        self, name: str, key_columns: list[str] | None = None
    ) -> IcebergTable:
        return IcebergTable(
            self.spark, self.catalog, self.namespace, name, key_columns
        )

    def list_tables(self) -> list[str]:
        rows = self.spark.sql(
            f"SHOW TABLES IN {self.catalog}.{self.namespace}"
        ).collect()
        return sorted(r["tableName"] for r in rows)

    def drop_table(self, name: str) -> None:
        self.spark.sql(
            f"DROP TABLE IF EXISTS {_q(f'{self.catalog}.{self.namespace}.{name}')}"
        )

    def register_views(
        self, spark: SparkSession, prefix: str = ""
    ) -> list[str]:
        names = []
        for t in self.list_tables():
            (spark or self.spark).table(
                f"{self.catalog}.{self.namespace}.{t}"
            ).createOrReplaceTempView(f"{prefix}{t}")
            names.append(f"{prefix}{t}")
        return names

    def expire_all(
        self, retain_last: int = 1, older_than_s: float | None = None
    ) -> dict:
        return {
            t: self.table(t).expire_snapshots(retain_last, older_than_s)
            for t in self.list_tables()
        }
