"""Streaming twins of the corpus-scoring operators.

The reference's dataflow program is a Structured-Streaming-style job
(PyFlink streaming SQL, flink/jobs/flink_json_to_iceberg.py); the
batch corpus operators whose state is bounded by construction get
streaming twins so the same pipeline runs over a live document feed:

- DSIR (operators/sampling.py): the hashed-bigram bucket LMs are
  <= 2 x DSIR_BUCKETS rows at ANY corpus size — a streaming aggregate
  with no watermark needed, exactly like the count-min sketch
  (streaming/rollup.py). Scoring a batch against the LM-so-far is one
  broadcast join in a foreachBatch tail.
- Gopher rule battery (operators/quality.py): a stateless map-only
  projection — applies to a stream unchanged.

Parity contract (tests/test_streaming_scoring.py): after the stream
drains, the streaming LM cells equal the batch LM cells, streaming
Gopher rows equal batch rows, and the state-store row count never
exceeds the 2 x DSIR_BUCKETS bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_stream_spark.operators.quality import gopher_score
from flink_stream_spark.operators.sampling import (
    DSIR_BUCKETS,
    dsir_bigram_buckets,
)

_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the documents table as an unbounded stream (Kafka
    stand-in, earliest-offset semantics) — the document-feed analogue
    of streaming/windows.py::stream_events."""
    return (
        spark.readStream.format("parquet")
        .schema(_DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def gopher_rules_stream(docs: DataFrame) -> DataFrame:
    """Streaming Gopher battery: the identical map-only projection the
    batch query runs — stateless, append-mode, no watermark. Narrow at
    any scale (the per-token HOF is bounded by tokens-per-doc)."""
    return gopher_score(docs)


def dsir_lm_stream(docs: DataFrame) -> DataFrame:
    """Streaming DSIR bucket-LM build: hashed-bigram occurrence counts
    per (is_target, bucket). State is BOUNDED BY CONSTRUCTION — at most
    2 x DSIR_BUCKETS rows however long the stream runs or how large the
    key space grows — so no watermark is needed and complete/update
    output is safe, the same argument as the streaming CMS
    (streaming/rollup.py::cms_cells_stream). Cells are counts, so the
    state merges incrementally exactly like the batch partial
    aggregation."""
    return (
        dsir_bigram_buckets(docs)
        .groupBy("is_target", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_score_batch(raw_docs: DataFrame, lm_cells: DataFrame) -> DataFrame:
    """Score one batch of raw documents against LM cells (is_target, b,
    c) — e.g. the current streaming LM state: the same add-1-smoothed
    micro-quantized log-ratio arithmetic as the batch query, so scores
    from a drained stream equal sample_dsir_importance exactly. The LM
    side is <= 2 x DSIR_BUCKETS rows, hence broadcast."""
    big = dsir_bigram_buckets(raw_docs).filter(~F.col("is_target"))
    tf = big.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("tf"))
    # rename the join key on the target side: both frames derive from
    # the SAME lm_cells plan, and a self-join on a shared column name
    # is an ambiguous-reference error
    ct = lm_cells.filter("is_target").select(
        F.col("b").alias("bt"), F.col("c").alias("ct")
    )
    cr = lm_cells.filter("NOT is_target").select("b", F.col("c").alias("cr"))
    tot = ct.agg(F.sum("ct").alias("nt")).crossJoin(
        cr.agg(F.sum("cr").alias("nr"))
    )
    lr = (
        cr.join(ct, F.col("b") == F.col("bt"), "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.floor(
                F.log(
                    (
                        (F.coalesce("ct", F.lit(0)) + 1).cast("double")
                        * (F.col("nr") + DSIR_BUCKETS)
                    )
                    / ((F.col("cr") + 1).cast("double") * (F.col("nt") + DSIR_BUCKETS))
                )
                * 1_000_000.0
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lr_micro"),
        )
    )
    return (
        tf.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("lr_micro")).cast("bigint").alias(
                "score_micro"
            ),
            # mirror the batch query exactly: half-up at micro
            # precision in exact integers, then one int->double
            # division (operators/exactmath.py — ROUND(double, 6)
            # diverges between engines on half-boundaries)
            (
                F.floor(
                    F.sum(F.col("tf") * F.col("lr_micro")).cast("double")
                    / F.sum("tf").cast("double")
                    + F.lit(0.5)
                ).cast("bigint")
                / F.lit(1_000_000.0)
            ).alias("avg_log_ratio"),
        )
    )
