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


try:
    from pyspark.sql.functions import udtf as _udtf_deco

    @_udtf_deco(returnType="idx int, sentence string, n_chars bigint")
    class _SentenceSplit:
        """Python UDTF (Spark 4 table function): one input row ->
        many output rows. Row-at-a-time Python — deliberately NOT a
        hot-path operator; it exists to prove the lateral table-
        function API surface with an oracle-checkable computation
        (sentence segmentation with per-sentence stats)."""

        def eval(self, text: str):
            for i, s in enumerate(text.split(". ")):
                yield i + 1, s, len(s)

    _HAVE_UDTF = True
except ImportError:  # pragma: no cover - pyspark < 4
    _HAVE_UDTF = False


@register(
    "udtf_sentence_split",
    """
    WITH s AS (
      SELECT doc_id, string_split(text, '. ') AS ss
      FROM documents WHERE doc_id < 50),
    ex AS (
      SELECT doc_id, unnest(ss) AS sentence,
             generate_subscripts(ss, 1) AS idx
      FROM s)
    SELECT doc_id, CAST(idx AS INTEGER) AS idx, sentence,
           CAST(LENGTH(sentence) AS BIGINT) AS n_chars
    FROM ex
    ORDER BY doc_id, idx
    """,
    group="udf",
    doc="Python UDTF via LATERAL join: sentence segmentation of each "
    "document (1 row -> N rows) with per-sentence stats. The lateral "
    "apply is narrow — each input partition expands locally, no "
    "shuffle before the presentation sort.",
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    if not _HAVE_UDTF:  # pragma: no cover
        raise RuntimeError("Python UDTFs need pyspark >= 4")
    spark.udtf.register("sentence_split", _SentenceSplit)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, f.idx, f.sentence, f.n_chars
        FROM _udtf_docs d, LATERAL sentence_split(d.text) f
        ORDER BY d.doc_id, f.idx
        """
    )
