"""UDF surface (SURVEY §2C): scalar Pandas UDF + grouped applyInPandas.

The engine's rule is built-ins on the hot path; these operators
exist to prove the Arrow-vectorized escape hatch works end-to-end
(schema contracts, batch shapes, grouped semantics) with results a
SQL oracle can check. Each UDF computes something deliberately
SQL-expressible so the DuckDB twin validates the plumbing.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.registry import register


@F.pandas_udf(LongType())
def _discounted_price_scaled(ext: pd.Series, disc: pd.Series) -> pd.Series:
    """Vectorized (Arrow batch) scalar computation in exact integers:
    price-cents × discount-complement-percent (both 2dp fixtures)."""
    cents = (ext * 100).round().astype("int64")
    pct = ((1.0 - disc) * 100).round().astype("int64")
    return cents * pct


@register(
    "udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS BIGINT)
             AS disc_price_scaled
    FROM lineitem
    WHERE l_quantity > 45
    ORDER BY l_orderkey, l_linenumber
    """,
    group="udf",
    doc="Scalar pandas_udf (Arrow-vectorized): the slow-path contract "
    "— per-batch Series in/out, no per-row Python; exact integer "
    "output so the oracle comparison has no rounding-mode boundary.",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _discounted_price_scaled("l_extendedprice", "l_discount").alias(
            "disc_price_scaled"
        ),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "udf_grouped_apply",
    """
    WITH cents AS (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders)
    SELECT o_custkey, o_orderkey,
           CAST(c * COUNT(*) OVER (PARTITION BY o_custkey)
                - SUM(c) OVER (PARTITION BY o_custkey) AS BIGINT) AS dev_scaled_cents
    FROM cents
    ORDER BY o_custkey, o_orderkey
    """,
    group="udf",
    doc="Grouped applyInPandas (per-group pandas DataFrame in/out): "
    "scaled demeaning within customer in exact integer cents "
    "(n·x − Σx), checked against a window-function oracle. One "
    "shuffle on the group key, Arrow both ways, no float rounding "
    "boundary between engines.",
)
def udf_grouped_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def demean_scaled(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["o_totalprice"] * 100).round().astype("int64")
        out = pdf[["o_custkey", "o_orderkey"]].copy()
        out["dev_scaled_cents"] = cents * len(cents) - cents.sum()
        return out

    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(
            demean_scaled,
            schema="o_custkey bigint, o_orderkey bigint, dev_scaled_cents bigint",
        )
        .orderBy("o_custkey", "o_orderkey")
    )
