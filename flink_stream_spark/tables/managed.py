"""Versioned parquet-backed managed tables with MERGE semantics.

The lakehouse layer of the engine: the Spark-first stand-in for the
reference's Iceberg v2 upsert tables (`format-version=2`,
`write.upsert.enabled=true`, PRIMARY KEY NOT ENFORCED — reference
flink/jobs/flink_json_to_iceberg.py:61-87) and its snapshot-retention
maintenance job (reference snapshot_mgmt.py:9-19).

Design:
- every commit writes a NEW immutable version directory
  (``v_00000001/``, Iceberg-snapshot-style MVCC) and then atomically
  flips a single pointer file (``_meta/CURRENT``); readers always see
  a complete version, and old versions remain readable (time travel)
  until expired;
- MERGE is read-modify-write expressed as a DataFrame plan:
  ``target LEFT ANTI JOIN changes ON keys`` (survivors) unioned with
  the upsert rows — one shuffle on the merge key (or a broadcast when
  the change-set is small, which AQE picks automatically). No data is
  ever collected to the driver, so the same plan runs against a
  1000-executor cluster; on real deployments this class is swapped
  for Iceberg/Delta ``MERGE INTO`` (same call sites, foreachBatch).
- schema evolution on write: new columns in incoming data are added
  to the table (existing rows get NULL) via unionByName —
  mirroring the sink's ``evolve-schema-enabled``
  (reference kafka/config/connect-iceberg-sink.json:13-14).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ManagedTable:
    """One keyed, versioned table under ``root/name``."""

    def __init__(self, root: str, name: str, key_columns: list[str] | None = None):
        self.root = root
        self.name = name
        self.dir = os.path.join(root, name)
        self.meta_dir = os.path.join(self.dir, "_meta")
        self.key_columns = key_columns or []
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- version bookkeeping -------------------------------------------------

    def _current_pointer(self) -> str:
        return os.path.join(self.meta_dir, "CURRENT")

    def current_version(self) -> int:
        try:
            with open(self._current_pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.dir, f"v_{v:08d}")

    def versions(self) -> list[dict]:
        """Commit log (the `snapshots` metadata table equivalent)."""
        log = os.path.join(self.meta_dir, "commits.jsonl")
        if not os.path.exists(log):
            return []
        with open(log) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _commit(self, staged: str, operation: str) -> int:
        """Atomically publish a staged directory as the next version."""
        new_v = self.current_version() + 1
        os.rename(staged, self._version_dir(new_v))
        with open(os.path.join(self.meta_dir, "commits.jsonl"), "a") as f:
            f.write(
                json.dumps(
                    {"version": new_v, "operation": operation, "committed_at": time.time()}
                )
                + "\n"
            )
        tmp = self._current_pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, self._current_pointer())  # atomic pointer flip
        return new_v

    def _stage(self, df: DataFrame) -> str:
        staged = os.path.join(self.dir, f"_staged_{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staged)
        return staged

    # -- reads ---------------------------------------------------------------

    def exists(self) -> bool:
        return self.current_version() > 0

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v == 0:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        return spark.read.parquet(self._version_dir(v))

    # -- writes --------------------------------------------------------------

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(self._stage(df), "overwrite")

    def append(self, df: DataFrame) -> int:
        spark = df.sparkSession
        if self.exists():
            cur = self.read(spark)
            df = _evolve_union(cur, df)
        return self._commit(self._stage(df), "append")

    def merge(
        self,
        upserts: DataFrame,
        keys: list[str] | None = None,
        deletes: DataFrame | None = None,
        validate_unique_keys: bool = True,
    ) -> int:
        """Keyed upsert + optional delete — one MERGE commit.

        ``upserts`` must contain at most one row per key (reduce a CDC
        batch with :func:`flink_stream_spark.cdc.last_per_key` first);
        each row replaces-or-inserts its key. ``deletes`` (key columns
        only) removes keys — Iceberg v2 equality-delete equivalent.
        The plan is LEFT ANTI on the touched-key set + union: one
        shuffle on the key (or broadcast of a small change-set under
        AQE); nothing is collected to the driver.

        The at-most-one-row-per-key contract is ENFORCED (a duplicate
        key would otherwise anti-join away every old row for the key
        and then union in every incoming copy, silently breaking the
        primary-key invariant). The check is one extra aggregate over
        the change batch — small next to the table rewrite; pass
        ``validate_unique_keys=False`` only for inputs already reduced
        by ``last_per_key``.
        """
        keys = keys or self.key_columns
        if not keys:
            raise ValueError(f"merge into {self.name} requires key columns")
        spark = upserts.sparkSession

        if validate_unique_keys:
            dup = (
                upserts.groupBy(*keys)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                kv = {k: dup[0][k] for k in keys}
                raise ValueError(
                    f"merge into {self.name}: upserts contain >1 row for key "
                    f"{kv}; reduce with cdc.last_per_key first"
                )

        if not self.exists():
            return self._commit(self._stage(upserts), "merge")

        cur = self.read(spark)
        touched = upserts.select(*keys)
        if deletes is not None:
            touched = touched.unionByName(deletes.select(*keys))
        # survivors: current rows whose key is not touched by this batch
        survivors = cur.join(touched, on=keys, how="left_anti")
        merged = _evolve_union(survivors, upserts)
        return self._commit(self._stage(merged), "merge")

    # -- maintenance (reference snapshot_mgmt.py equivalent) ------------------

    def expire_snapshots(self, retain_last: int = 1, older_than_s: float | None = None) -> int:
        """Drop old version directories; keep the newest ``retain_last``
        and anything newer than ``older_than_s`` seconds ago."""
        cur = self.current_version()
        removed = 0
        now = time.time()
        ages = {c["version"]: c.get("committed_at", now) for c in self.versions()}
        for v in range(1, cur):
            if v > cur - retain_last:
                continue
            if older_than_s is not None and now - ages.get(v, now) < older_than_s:
                continue
            d = self._version_dir(v)
            if os.path.exists(d):
                shutil.rmtree(d)
                removed += 1
        return removed


def _evolve_union(base: DataFrame, incoming: DataFrame) -> DataFrame:
    """Union with schema evolution: columns present on one side only are
    NULL-filled on the other (sink auto-evolution, reference
    connect-iceberg-sink.json:13-14)."""
    return base.unionByName(incoming, allowMissingColumns=True)


class Warehouse:
    """A database of managed tables + catalog introspection.

    Mirrors the reference's catalog/database DDL surface
    (CREATE CATALOG / CREATE DATABASE / USE / SHOW TABLES —
    flink_json_to_iceberg.py:28-57, snapshot_mgmt.py:13-14)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._keys_path = os.path.join(root, "_table_keys.json")

    def _load_keys(self) -> dict:
        if os.path.exists(self._keys_path):
            with open(self._keys_path) as f:
                return json.load(f)
        return {}

    def _save_keys(self, keys: dict) -> None:
        tmp = self._keys_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(keys, f)
        os.replace(tmp, self._keys_path)

    def table(self, name: str, key_columns: list[str] | None = None) -> ManagedTable:
        reg = self._load_keys()
        if key_columns is not None:
            reg[name] = key_columns
            self._save_keys(reg)
        return ManagedTable(self.root, name, reg.get(name))

    def list_tables(self) -> list[str]:
        out = []
        for d in sorted(os.listdir(self.root)):
            if os.path.isdir(os.path.join(self.root, d)) and not d.startswith("_"):
                out.append(d)
        return out

    def drop_table(self, name: str) -> None:
        d = os.path.join(self.root, name)
        if os.path.exists(d):
            shutil.rmtree(d)

    def expire_all(self, retain_last: int = 1, older_than_s: float | None = None) -> dict:
        """Fleet-wide snapshot expiry (reference snapshot_mgmt.py:13-19
        loops information_schema tables the same way)."""
        return {
            t: self.table(t).expire_snapshots(retain_last, older_than_s)
            for t in self.list_tables()
        }
