"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never consumed whole: pipelines carve reproducible
subsets (smoke-test slices, eval holdouts, train/val/test splits,
per-language quotas). Random sampling (``df.sample``) is
seed-and-partitioning dependent — a repartition or executor loss
changes the sample. These operators derive membership from a
content-stable hash (md5 of the key, the same construction as
operators/text.py's token hash), so the sample is a pure function of
the data: identical across engines, runs, partitionings and retries,
and cheap — membership is a narrow per-row predicate the scan
evaluates (no shuffle at all for the bernoulli form).

Reference parity: the reference has no sampling surface at all (its
largest exercised workload is 100 rows/table, test_cdc.py:79-88);
these are north-star extensions per SURVEY §2C NS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.registry import register
from flink_stream_spark.operators.text import _tok_hash_spark, tok_hash_duck


def hash_bucket(col, buckets: int = 100):
    """Stable [0, buckets) bucket of any key column — md5-derived, so
    identical in Spark and DuckDB and independent of partitioning."""
    return _tok_hash_spark(col.cast("string")) % buckets


def _bucket_duck(expr: str, buckets: int = 100) -> str:
    return f"{tok_hash_duck(f'CAST({expr} AS VARCHAR)')} % {buckets}"


@register(
    "sample_hash_bernoulli",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_bucket_duck('doc_id')} < 10
    ORDER BY doc_id
    """,
    group="sampling",
    doc="Deterministic 10% bernoulli sample by md5 hash-bucket of the "
    "key: membership is a per-row scan predicate — no shuffle, no "
    "seed, stable under repartition/retry at any scale.",
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(hash_bucket(F.col("doc_id")) < 10)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@register(
    "sample_stratified_quota",
    f"""
    SELECT lang, doc_id
    FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_bucket_duck('doc_id', 1000000007)}, doc_id) AS rn
      FROM documents) t
    WHERE rn <= 20
    ORDER BY lang, doc_id
    """,
    group="sampling",
    doc="Stratified fixed-quota sample: 20 docs per language, chosen "
    "by hash order (a deterministic shuffle) with doc_id tie-break. "
    "One shuffle on the stratum key; per-stratum top-k never "
    "materializes the full stratum on one node beyond the heap-k "
    "window buffer.",
)
def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        hash_bucket(F.col("doc_id"), 1000000007).asc(), F.col("doc_id").asc()
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


@register(
    "sample_train_split",
    f"""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN {_bucket_duck('doc_id')} < 80 THEN 'train'
                  WHEN {_bucket_duck('doc_id')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM assigned
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    group="sampling",
    doc="Hash-based train/val/test assignment (80/10/10) with "
    "per-(split, lang) counts: the split is a pure function of "
    "doc_id, so train/test never leak into each other across "
    "pipeline runs or engine versions.",
)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split", "lang")
    )


@register(
    "sample_mixture_weights",
    """
    WITH per_source AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    m AS (SELECT MIN(n_docs) AS m_min FROM per_source)
    SELECT source, n_docs,
           CAST((1000000 * m_min) // n_docs AS BIGINT) AS rate_ppm,
           CAST(n_docs * ((1000000 * m_min) // n_docs) // 1000000
                AS BIGINT) AS expected_docs
    FROM per_source CROSS JOIN m
    ORDER BY source
    """,
    group="sampling",
    doc="Mixture-weight solving: per-source downsampling rates that "
    "equalize the source mixture at the largest achievable scale "
    "(capped by the smallest source; no upsampling). The rate table "
    "is |sources| rows from one map-side-combined count — at 100 TB "
    "the rates then drive the hash-bernoulli predicate per source "
    "(sample_hash_bernoulli), so the actual resample is a map-only "
    "scan. Exact integer ppm arithmetic on both engines.",
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    m = per_source.agg(F.min("n_docs").alias("m_min"))
    return (
        per_source.crossJoin(F.broadcast(m))
        .withColumn("rate_ppm", F.expr("(1000000 * m_min) div n_docs").cast("bigint"))
        .select(
            "source",
            "n_docs",
            "rate_ppm",
            F.expr("n_docs * rate_ppm div 1000000").cast("bigint").alias("expected_docs"),
        )
        .orderBy("source")
    )


# Priority sampling (Duffield, Lund & Thorup 2007): a one-pass
# weighted-without-replacement sample. Each item gets priority
# q_i = w_i / u_i with u_i uniform in (0,1]; the sample is the top-k
# by priority. Deterministic here because u_i is the md5 hash of the
# key mapped into (0,1] — a pure function of the data — and q_i is a
# SINGLE IEEE division of exact integers, so both engines compute
# bit-identical priorities. Mergeable: top-k of a union is the top-k
# of per-partition top-ks, which is exactly Spark's TakeOrdered.
PRIORITY_K = 200
_U_DENOM = 1 << 60  # hash is 60 bits (15 hex chars); u in (0, 1]


@register(
    "sample_priority_weighted",
    f"""
    WITH w AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
             ({tok_hash_duck("'pri:' || CAST(doc_id AS VARCHAR)")} + 1) AS h
      FROM documents),
    pri AS (
      SELECT doc_id, weight,
             CAST(weight AS DOUBLE) * {_U_DENOM} / h AS priority
      FROM w)
    SELECT doc_id, weight, CAST(ROUND(priority, 6) AS DOUBLE) AS priority
    FROM pri
    ORDER BY priority DESC, doc_id
    LIMIT {PRIORITY_K}
    """,
    group="sampling",
    doc=f"Priority sampling (Duffield-Lund-Thorup 2007): top-{PRIORITY_K} "
    "documents by priority w/u with u = md5-hash of the key mapped "
    "into (0,1] — a deterministic weighted-without-replacement sample "
    "(weight = token count) that is a pure function of the data. "
    "Scale: one narrow scan pass computing a single IEEE division per "
    "row, then TakeOrderedAndProject — per-partition top-k merged on "
    "the driver, never a global sort; identical under any "
    "partitioning because priorities are bit-identical and ties break "
    "on doc_id.",
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = _tok_hash_spark(
        F.concat(F.lit("pri:"), F.col("doc_id").cast("string"))
    ) + F.lit(1)
    weight = F.size(F.split("text", " ")).cast("bigint")
    # two-step select so weight/hash are named once (no duplicated
    # md5 subtrees in the priority expression)
    pri = (
        d.select("doc_id", weight.alias("__w"), h.alias("__h"))
        .select(
            "doc_id",
            F.col("__w").alias("weight"),
            (
                F.col("__w").cast("double") * F.lit(float(_U_DENOM)) / F.col("__h")
            ).alias("priority"),
        )
    )
    return (
        pri.orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(PRIORITY_K)
        .select("doc_id", "weight", F.round("priority", 6).alias("priority"))
    )
