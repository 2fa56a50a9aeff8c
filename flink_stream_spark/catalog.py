"""Table registry over the driver fixture warehouse.

The reference registers sources/sinks in an Iceberg REST catalog
(reference: flink/jobs/flink_json_to_iceberg.py:28-57). Here the
equivalent is a lightweight registry that binds the parquet fixture
tables of a scale-factor directory into the Spark session catalog as
temp views, so both DataFrame code and spark.sql() queries see the
same names the DuckDB oracle sees.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark can't scan
    them natively; we read them as raw int64 nanos and convert.

    Handles both single-file parquet (the fixtures) and directory
    layout (anything Spark wrote)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return []
        path = parts[0]
    out = []
    for field in pq.read_schema(path):
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            out.append(field.name)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/column pruning
    into this scan for every downstream query.

    Parquet TIMESTAMP(NANOS) columns (Spark cannot scan them) are read
    as int64 nanos via the legacy conf and converted to TimestampType
    with exact integer µs arithmetic — a projection on top of the scan,
    so pushdown/pruning on every other column is unaffected.
    """
    path = table_path(sf_dir, name)
    # determinism-critical session confs, set defensively because the
    # external driver constructs its own SparkSession: timestamps must
    # be UTC to line up with DuckDB's naive-UTC parquet reads, and NTZ
    # inference must be off — the fixtures are naive-µs parquet, which
    # a default Spark 4 session reads as TIMESTAMP_NTZ (breaking
    # unix_millis/window and diverging from the oracle's naive-UTC)
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        try:  # runtime-settable; the external driver's session needs it too
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(path)
    for c in ns_cols:
        # backticks: the column name is an identifier, not parse text.
        # floor-to-µs via pmod (DIV truncates toward zero, which would
        # round pre-epoch nanos the wrong way vs DuckDB's exact values)
        df = df.withColumn(
            c,
            F.expr(
                f"timestamp_micros(CAST((`{c}` - pmod(`{c}`, 1000)) DIV 1000 AS BIGINT))"
            ),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; return the frames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
