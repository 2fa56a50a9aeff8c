"""Real Apache Iceberg metadata engine, driven through iceberg-core's
Java API (no iceberg-spark-runtime / DSv2 needed).

The sandbox has no network and no iceberg-spark jars, but iceberg-core
/ api / data / parquet jars ARE discoverable (the reference deployment
bundles the public artifacts for its Kafka-Connect sink; any local
copy works — override with ICEBERG_CORE_JARS). This smoke drives the
genuine library end to end in a SUBPROCESS (driver.extraClassPath must
be set before JVM start):

  create (HadoopCatalog DDL -> v1.metadata.json) -> append a
  Spark-written parquet file WITH parquet field IDs (so Iceberg's
  schema-by-id readers accept it) -> second append -> snapshot lineage
  + summary checks -> file-level DELETE -> expire old snapshots ->
  live file set re-read by Spark equals the expected rows.

This is the real-catalog counterpart of tests/test_iceberg_adapter.py's
jar-gated DSv2 round-trip (which still skips here) and of
ManagedTable's snapshot/expiry scenario tests.
"""

from __future__ import annotations

import glob
import os
import subprocess
import textwrap

import pytest


def _iceberg_jars() -> list[str]:
    env = os.environ.get("ICEBERG_CORE_JARS")
    if env:
        return [p for p in env.split(":") if os.path.exists(p)]
    # ONLY the iceberg artifacts: the bundle's parquet/avro/hadoop jars
    # would shadow Spark's own (extraClassPath is prepended) and break
    # Spark's parquet writer with NoSuchMethodError version skew.
    # Iceberg's own shaded deps live in iceberg-bundled-guava.
    jars = sorted(
        j
        for j in glob.glob(
            "/root/reference/kafka/plugins/iceberg-kafka-connect/iceberg-*.jar"
        )
        if "kafka-connect" not in os.path.basename(j)
    )
    caffeine = glob.glob(
        os.path.expanduser("~/.cache/coursier/**/caffeine-2*.jar"), recursive=True
    ) or glob.glob(os.path.expanduser("~/.sbt/**/caffeine-2*.jar"), recursive=True)
    if jars and not caffeine:
        return []  # HadoopTableOperations needs caffeine at commit time
    return jars + caffeine[:1]


pytestmark = pytest.mark.skipif(
    not any("iceberg-core" in j for j in _iceberg_jars()),
    reason="no iceberg-core jars discoverable (set ICEBERG_CORE_JARS)",
)


def test_iceberg_core_create_append_delete_expire(tmp_path):
    wh = tmp_path / "wh"
    script = textwrap.dedent(
        f"""
        import sys, time, os
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        from pyspark.sql import types as T
        spark = (SparkSession.builder.master("local[2]")
                 .appName("iceberg-core-e2e")
                 .config("spark.driver.extraClassPath", {":".join(_iceberg_jars())!r})
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.parquet.fieldId.write.enabled", "true")
                 .getOrCreate())
        jvm = spark._jvm
        Types = jvm.org.apache.iceberg.types.Types
        NF = Types.NestedField
        schema = jvm.org.apache.iceberg.Schema([
            NF.required(1, "id", Types.LongType.get()),
            NF.optional(2, "v", Types.StringType.get()),
        ])
        conf = jvm.org.apache.hadoop.conf.Configuration()
        cat = jvm.org.apache.iceberg.hadoop.HadoopCatalog(conf, {str(wh)!r})
        tid = jvm.org.apache.iceberg.catalog.TableIdentifier.parse("db.t")
        table = cat.createTable(tid, schema)
        assert os.path.exists({str(wh)!r} + "/db/t/metadata/v1.metadata.json")

        # Spark writes the data files WITH parquet field IDs (matching
        # the Iceberg schema ids), so Iceberg's readers accept them
        def fields():
            m1 = {{"parquet.field.id": 1}}
            m2 = {{"parquet.field.id": 2}}
            return T.StructType([
                T.StructField("id", T.LongType(), False, metadata=m1),
                T.StructField("v", T.StringType(), True, metadata=m2),
            ])

        def write_file(rows, name):
            df = spark.createDataFrame(rows, fields()).coalesce(1)
            d = {str(wh)!r} + "/stage_" + name
            df.write.mode("overwrite").parquet(d)
            part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
            return d + "/" + part, len(rows)

        def append(path, n):
            df = (jvm.org.apache.iceberg.DataFiles.builder(table.spec())
                  .withPath(path)
                  .withFormat("PARQUET")
                  .withFileSizeInBytes(os.path.getsize(path))
                  .withRecordCount(n)
                  .build())
            # py4j maps the fluent appendFile overload to void; the
            # builder mutates in place, so split the chain
            ap = table.newAppend()
            ap.appendFile(df)
            ap.commit()
            return df

        def jiter(obj):
            it = obj.iterator()
            while it.hasNext():
                yield it.next()

        f1, n1 = write_file([(1, "a"), (2, "b"), (3, "c")], "one")
        d1 = append(f1, n1)
        s1 = table.currentSnapshot()
        assert s1 is not None
        assert s1.summary().get("total-records") == "3", s1.summary()

        f2, n2 = write_file([(10, "x"), (11, "y")], "two")
        append(f2, n2)
        s2 = table.currentSnapshot()
        assert s2.parentId() == s1.snapshotId()  # real snapshot lineage
        assert s2.summary().get("total-records") == "5"

        # live file set drives a Spark read: contents must match
        paths = [t.file().location() for t in jiter(table.newScan().planFiles())]
        got = sorted(map(tuple, spark.read.parquet(*paths).collect()))
        assert got == [(1,"a"),(2,"b"),(3,"c"),(10,"x"),(11,"y")], got

        # file-level delete (the MERGE/compaction primitive); pass the
        # DataFile OBJECT — py4j misresolves the CharSequence overload
        # (same fluent-chain quirk as appendFile: split the calls)
        dl = table.newDelete()
        dl.deleteFile(d1)
        dl.commit()
        paths = [t.file().location() for t in jiter(table.newScan().planFiles())]
        got = sorted(map(tuple, spark.read.parquet(*paths).collect()))
        assert got == [(10, "x"), (11, "y")], got
        assert table.currentSnapshot().summary().get("total-records") == "2"

        # expire everything older than now: one snapshot survives
        n_before = sum(1 for _ in jiter(table.snapshots()))
        table.expireSnapshots().expireOlderThan(
            int(time.time() * 1000)).retainLast(1).commit()
        n_after = sum(1 for _ in jiter(table.snapshots()))
        assert n_before == 3 and n_after == 1, (n_before, n_after)
        print("ICEBERG_CORE_OK")
        spark.stop()
        """
    )
    res = subprocess.run(
        ["python", "-c", script],
        capture_output=True,
        text=True,
        timeout=400,
        cwd="/root/repo",
    )
    assert "ICEBERG_CORE_OK" in res.stdout, res.stdout[-3000:] + res.stderr[-3000:]
