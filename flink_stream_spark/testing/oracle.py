"""DuckDB twin-runner: the local mirror of the driver's correctness gate.

Runs a Spark DataFrame and an ANSI-SQL oracle over the same parquet
fixtures, canonicalizes both results (columns sorted by name, rows
sorted, doubles rounded to 6 dp, timestamps at ms precision) and
compares row count, column names, and an order-insensitive value hash.

This reproduces the reference's verification idea — run the pipeline,
then check the final table state against an independent reader
(reference: test_cdc.py:123-141 checks Postgres vs the downstream
tables by hand) — but as an automated, hash-checked gate.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from flink_stream_spark.catalog import TABLES, table_path


def duckdb_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connect(sf_dir)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_cell(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, decimal.Decimal):
        return _canon_cell(float(v))
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        r = round(v, 6)
        if r == 0:
            r = 0.0  # normalize -0.0
        return f"{r:.6f}"
    if isinstance(v, (pd.Timestamp,)):
        return v.floor("ms").isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ",".join(_canon_cell(x) for x in v.tolist()) + "]"
        if isinstance(v, np.floating):
            return _canon_cell(float(v))
        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.bool_):
            return str(bool(v))
    except ImportError:
        pass
    if v is pd.NaT:
        return "∅"
    return str(v)


def canonical_hash(df: pd.DataFrame) -> str:
    """Order-insensitive value hash: columns sorted by name, each row
    rendered canonically, row strings sorted, sha256 over the result."""
    cols = sorted(df.columns)
    rows = ["\x1f".join(_canon_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    rows.sort()
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()


@dataclass
class CompareResult:
    name: str
    rows_match: bool
    cols_match: bool
    hash_match: bool
    spark_rows: int
    duck_rows: int
    spark_cols: tuple
    duck_cols: tuple
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.rows_match and self.cols_match and self.hash_match


def compare_query(name, spark_df, oracle_sql: str | None, sf_dir: str) -> CompareResult:
    spdf = spark_df.toPandas()
    if oracle_sql is None:
        return CompareResult(
            name, True, True, True, len(spdf), -1, tuple(sorted(spdf.columns)), (),
            detail="rows-only (no oracle)",
        )
    ddf = run_duckdb(oracle_sql, sf_dir)
    s_cols, d_cols = tuple(sorted(spdf.columns)), tuple(sorted(ddf.columns))
    rows_match = len(spdf) == len(ddf)
    cols_match = s_cols == d_cols
    hash_match = False
    detail = ""
    if rows_match and cols_match:
        h1, h2 = canonical_hash(spdf), canonical_hash(ddf)
        hash_match = h1 == h2
        if not hash_match:
            # surface a small diff for debugging
            merged = _first_diff(spdf, ddf)
            detail = f"hash mismatch; first diff: {merged}"
    return CompareResult(
        name, rows_match, cols_match, hash_match, len(spdf), len(ddf), s_cols, d_cols, detail
    )


def _first_diff(a: pd.DataFrame, b: pd.DataFrame) -> str:
    cols = sorted(a.columns)
    ra = sorted("\x1f".join(_canon_cell(r[c]) for c in cols) for _, r in a[cols].iterrows())
    rb = sorted("\x1f".join(_canon_cell(r[c]) for c in cols) for _, r in b[cols].iterrows())
    for i, (x, y) in enumerate(zip(ra, rb)):
        if x != y:
            return f"row {i}: spark={x!r} duck={y!r} (cols={cols})"
    return f"length tail: {len(ra)} vs {len(rb)}"
