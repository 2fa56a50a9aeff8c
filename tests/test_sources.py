"""Source connector layer: file formats batch+stream, graceful
degradation for connectors whose jars aren't in this image."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_stream_spark.sources import kafka_available, open_stream, read_batch


@pytest.fixture(scope="module")
def sample(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("src")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v"), F.lit("x").alias("tag")
    )
    df.write.mode("overwrite").parquet(str(root / "p"))
    df.write.mode("overwrite").option("header", "true").csv(str(root / "c"))
    df.write.mode("overwrite").json(str(root / "j"))
    df.write.mode("overwrite").orc(str(root / "o"))
    return root


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_read_batch_formats(spark, sample, fmt):
    sub = {"parquet": "p", "csv": "c", "json": "j", "orc": "o"}[fmt]
    df = read_batch(spark, f"{fmt}:{sample}/{sub}", schema="id long, v long, tag string"
                    if fmt in ("csv", "json") else None)
    assert df.count() == 100
    assert {f.name for f in df.schema.fields} == {"id", "v", "tag"}


def test_stream_json_source(spark, sample):
    s = open_stream(spark, f"json:{sample}/j", schema="id long, v long, tag string")
    q = s.groupBy().count().writeStream.format("memory").queryName("t_src").outputMode(
        "complete"
    ).start()
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT * FROM t_src").collect()[0]["count"] == 100


def test_kafka_unavailable_is_clear(spark):
    if kafka_available(spark):
        pytest.skip("kafka connector present")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        open_stream(spark, "kafka:localhost:9092/topic")


def test_rate_stream_source(spark):
    """Built-in rate source: the Kafka stand-in for throughput tests
    (§2C 'Rate/replayed stream source')."""
    s = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .load()
        .select("timestamp", "value")
    )
    q = s.writeStream.format("memory").queryName("t_rate").outputMode("append").start()
    try:
        import time

        deadline = time.time() + 15
        n = 0
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.sql("SELECT count(*) AS n FROM t_rate").collect()[0]["n"]
            if n > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert n > 0


def test_bad_scheme(spark):
    with pytest.raises(ValueError, match="unsupported"):
        read_batch(spark, "ftp:/tmp/x")


def test_avro_unavailable_is_clear(spark):
    from flink_stream_spark.sources import avro_available

    if avro_available(spark):
        df = read_batch(spark, "avro:/nonexistent-path-ok-to-fail")
        assert df is not None
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_batch(spark, "avro:/tmp/x.avro")


# ---------------------------------------------------------------------------
# optional-jar integration smokes: run for real when the optional jars
# (and, for kafka/jdbc, a live endpoint) are provided; skip cleanly in
# jar-free containers. See README "Optional connectors" for the
# --packages lines.
# ---------------------------------------------------------------------------


def test_kafka_raw_json_roundtrip_when_available(spark, tmp_path):
    """With the spark-sql-kafka jar AND a broker (env
    SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port), round-trip a raw-JSON topic
    exactly like the reference source table (earliest offsets, value as
    raw string — flink_json_to_iceberg.py:95-108)."""
    import json
    import os
    import uuid

    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka jar not on the classpath")
    bootstrap = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("no broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port")
    topic = f"fss_smoke_{uuid.uuid4().hex[:8]}"
    rows = [{"user_id": i, "email": f"u{i}@x"} for i in range(10)]
    # produce via the batch kafka sink (same jar)
    src = spark.createDataFrame([(json.dumps(r),) for r in rows], "value string")
    (
        src.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    stream = open_stream(spark, f"kafka:{bootstrap}/{topic}")
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 10
    assert got.columns == ["raw_data"]


def test_avro_roundtrip_when_available(spark, tmp_path):
    """With the spark-avro module present, write+read an avro dataset
    through the URI interface (no external service needed)."""
    from flink_stream_spark.sources import avro_available

    if not avro_available(spark):
        pytest.skip("spark-avro module not on the classpath")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    path = str(tmp_path / "roundtrip.avro")
    df.write.format("avro").save(path)
    got = read_batch(spark, f"avro:{path}")
    assert sorted(map(tuple, got.collect())) == [(1, "a"), (2, "b")]


def test_jdbc_roundtrip_when_available(spark):
    """With a JDBC driver jar and SPARK_GRAFT_JDBC_URL (e.g. a Postgres
    instance mirroring the reference's source database), read a table
    through the URI interface."""
    import os

    url = os.environ.get("SPARK_GRAFT_JDBC_URL")
    table = os.environ.get("SPARK_GRAFT_JDBC_TABLE", "(SELECT 1 AS one) t")
    if not url:
        pytest.skip("no JDBC endpoint: set SPARK_GRAFT_JDBC_URL")
    got = read_batch(spark, f"jdbc:{url}#{table}")
    assert got.count() >= 1


def test_python_datasource_jsonl_dir(spark, tmp_path):
    """PySpark 4 Python Data Source API: one input partition per file,
    lax-JSON null semantics, bad lines yield NULL rows not task death."""
    import json as _json

    from flink_stream_spark.sources.python_datasource import JsonlDirDataSource

    d = tmp_path / "topic"
    d.mkdir()
    for i, rows in enumerate(
        [
            [{"user_id": 1, "email": "a@x"}, {"user_id": 2}],
            [{"user_id": 3, "email": "c@x", "extra": "ignored"}],
            [],
        ]
    ):
        with open(d / f"part{i}.jsonl", "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
            if i == 2:
                f.write("not json at all\n")

    spark.dataSource.register(JsonlDirDataSource)
    df = (
        spark.read.format("jsonl_dir")
        .schema("user_id int, email string")
        .option("path", str(d))
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one per file
    rows = {tuple(r) for r in df.collect()}
    assert rows == {(1, "a@x"), (2, None), (3, "c@x"), (None, None)}


def test_python_datasource_streaming_offsets(spark, tmp_path):
    """Streaming side of the Python data source: file-count offsets,
    each file delivered exactly once across micro-batches and across a
    checkpointed restart (foreachBatch sink, which supports
    recovery)."""
    import json as _json

    from flink_stream_spark.sources.python_datasource import JsonlDirDataSource

    d = tmp_path / "topic"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(JsonlDirDataSource)

    def write(fname, ids):
        with open(d / fname, "w") as f:
            for i in ids:
                f.write(_json.dumps({"user_id": i}) + "\n")

    def start():
        def sink(batch, epoch_id):
            if batch.count():
                batch.write.mode("append").parquet(out)

        return (
            spark.readStream.format("jsonl_dir")
            .schema("user_id int")
            .option("path", str(d))
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    write("f0.jsonl", [1, 2])
    q = start()
    q.processAllAvailable()
    write("f1.jsonl", [3])
    q.processAllAvailable()
    q.stop()
    got = sorted(r["user_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]

    # restart from the checkpoint: only NEW files are delivered, no
    # replay of f0/f1 (exactly-once over the offset log)
    write("f2.jsonl", [4, 5])
    q = start()
    q.processAllAvailable()
    q.stop()
    got2 = sorted(r["user_id"] for r in spark.read.parquet(out).collect())
    assert got2 == [1, 2, 3, 4, 5]


def test_python_datasource_stream_writer_two_phase_commit(spark, tmp_path):
    """Custom streaming sink: staged-file two-phase commit, atomic
    publish per epoch, replayed batchIds no-op (commit log)."""
    import json as _json

    from flink_stream_spark.sources.python_datasource import JsonlDirDataSource

    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(JsonlDirDataSource)

    with open(src / "f0.jsonl", "w") as f:
        for i in range(5):
            f.write(_json.dumps({"user_id": i}) + "\n")

    q = (
        spark.readStream.format("jsonl_dir")
        .schema("user_id int")
        .option("path", str(src))
        .load()
        .writeStream.format("jsonl_dir")
        .option("path", str(out))
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    import os

    published = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    rows = []
    for f in published:
        with open(out / f) as fh:
            rows += [_json.loads(line)["user_id"] for line in fh if line.strip()]
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert (out / "_commits.log").exists()
    assert not any(os.scandir(out / "_staged")), "staged files must be cleaned"
