"""Incremental streaming SEMANTIC near-dedup (SemDeDup) against an
accumulated per-cluster index of kept embeddings.

The semantic twin completing the streaming-dedup family (text:
``dedup_stream.py``, bloom-prefiltered exact: ``bloom_dedup_stream.py``,
images: ``image_dedup_stream.py``, audio: ``audio_dedup_stream.py``,
video: ``video_dedup_stream.py``): embeddings arrive in micro-batches;
each batch is assigned to its nearest centroid (the SAME exact
scaled-int64 argmin as the batch ``dedup_semdedup_cluster`` kernel),
probed against the accumulated index of previously KEPT vectors in the
same cluster with an exact cosine >= SEMDEDUP_TAU verify, and flagged
keep-or-duplicate. Kept vectors join the index; duplicates never do —
keep-FIRST semantics in stream order, matching every other twin.

Centroid model: PINNED at deploy time (the production semantic-dedup
pattern — a k-means model is trained once on a seed corpus, then
applied online; FAISS-style). The batch query's corpus-adaptive
K = max(64, n // 256) is its re-clustering story for full-corpus
passes; an online stream cannot re-derive K per batch without
re-assigning — and therefore re-pairing — everything already indexed.
``centroids`` is the (K, d) int64 scaled-centroid matrix with its id
vector, exactly the shape ``dedup_semdedup_cluster`` collects
driver-side (bounded: K rows, never corpus rows).

Cluster blocking bounds probe cost to |batch| x cluster-population —
the index is stored WITH its cluster key, so the probe is a cluster-
keyed equi-join, never batch x index. Within-batch duplicate
resolution reuses the generic DataFrame-side greedy fixpoint.

Replay safety: every commit carries an ``epoch:<id>`` idempotency
token, and the probe excludes self-pairs, so an at-least-once
foreachBatch re-delivery recomputes the identical flag set and no-ops
on commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.operators.similarity import (
    SEMDEDUP_TAU,
    _scaled_expr,
    _sdot,
)
from flink_stream_spark.streaming.dedup_stream import _resolve_greedy_keep_first
from flink_stream_spark.tables.managed import ManagedTable


def scale_and_assign(batch: DataFrame, cent_ids, C) -> DataFrame:
    """(vec_id, embedding) -> (vec_id, cl, s, nrm): exact scaled-int
    vectors, cluster by int64 argmin distance — identical arithmetic
    to the batch kernel (products <= 1e12, 64-term sums <= 6.4e13, all
    exact in int64/float64)."""
    import numpy as np
    import pandas as pd

    cc = (C * C).sum(axis=1)

    def assign(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["s"].to_numpy()).astype("int64")
            score = cc[None, :] - 2 * (x @ C.T)  # exact int64
            cl = cent_ids[np.argmin(score, axis=1)]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cl": cl,
                    "s": pdf["s"],
                    "nrm": pdf["nrm"],
                }
            )

    scaled = batch.select(
        "vec_id", _scaled_expr(F.col("embedding")).alias("s")
    ).withColumn("nrm", F.sqrt(_sdot(F.col("s"), F.col("s"))))
    return scaled.mapInPandas(
        assign, "vec_id long, cl long, s array<double>, nrm double"
    )


def _verified_dup_pairs(cand: DataFrame) -> DataFrame:
    """Exact cosine verify over cluster-blocked candidate pairs carrying
    both scaled vectors; same threshold arithmetic as the batch kernel."""
    cos = _sdot(F.col("s_new"), F.col("s_old")) / (
        F.col("nrm_new") * F.col("nrm_old")
    )
    return cand.filter(cos >= F.lit(SEMDEDUP_TAU)).select("new_doc", "old_doc")


def process_semdedup_batch(
    batch: DataFrame,
    cent_ids,
    C,
    index_table: ManagedTable,
    flags_table: ManagedTable,
    epoch_id: "int | None" = None,
) -> None:
    """Admit one micro-batch of (vec_id, embedding array<float>) against
    the per-cluster kept-vector index. Stream order within a batch is
    vec_id order (the replay contract)."""
    spark = batch.sparkSession
    token = None if epoch_id is None else f"epoch:{epoch_id}"
    new = scale_and_assign(batch, cent_ids, C).localCheckpoint(eager=True)

    n_side = new.select(
        F.col("vec_id").alias("new_doc"),
        F.col("cl").alias("cl_n"),
        F.col("s").alias("s_new"),
        F.col("nrm").alias("nrm_new"),
    )
    if index_table.exists():
        idx = index_table.read(spark)
        i_side = idx.select(
            F.col("vec_id").alias("old_doc"),
            F.col("cl").alias("cl_i"),
            F.col("s").alias("s_old"),
            F.col("nrm").alias("nrm_old"),
        )
        cand_idx = n_side.join(
            i_side,
            (F.col("cl_n") == F.col("cl_i"))
            & (F.col("new_doc") != F.col("old_doc")),
        )
        flagged = (
            _verified_dup_pairs(cand_idx)
            .groupBy("new_doc")
            .agg(F.min("old_doc").alias("dup_of"))
        )
    else:
        flagged = spark.createDataFrame([], "new_doc bigint, dup_of bigint")
    flagged = flagged.localCheckpoint(eager=True)

    # within-batch: same cluster blocking, smaller vec_id is "old"
    b_side = new.select(
        F.col("vec_id").alias("old_doc"),
        F.col("cl").alias("cl_i"),
        F.col("s").alias("s_old"),
        F.col("nrm").alias("nrm_old"),
    )
    cand_local = n_side.join(
        b_side,
        (F.col("cl_n") == F.col("cl_i"))
        & (F.col("old_doc") < F.col("new_doc")),
    )
    dup_local = _verified_dup_pairs(cand_local).localCheckpoint(eager=True)
    local_flagged = _resolve_greedy_keep_first(
        batch.select(F.col("vec_id").alias("doc_id")), dup_local, flagged
    )
    flagged = flagged.unionByName(local_flagged)

    flags = (
        batch.select(F.col("vec_id").alias("doc_id"))
        .join(flagged, F.col("doc_id") == F.col("new_doc"), "left")
        .select(
            "doc_id",
            F.col("dup_of"),
            F.col("dup_of").isNotNull().alias("is_dup"),
        )
        .localCheckpoint(eager=True)
    )
    flags_table.append(flags, token=token)

    kept = flags.filter(~F.col("is_dup")).select(F.col("doc_id").alias("vec_id"))
    index_table.append(new.join(kept, "vec_id"), token=token)

    for t in (flags_table, index_table):
        t.maybe_compact(spark)


def start_incremental_semdedup(
    spark: SparkSession,
    source_dir: str,
    cent_ids,
    C,
    index_table: ManagedTable,
    flags_table: ManagedTable,
    checkpoint_dir: str,
):
    """File-replayed embedding stream → per-batch incremental semantic
    dedup. One file per trigger keeps batch boundaries deterministic
    for the parity tests; a Kafka/object-store source swaps in behind
    the same foreachBatch."""
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        process_semdedup_batch(
            batch, cent_ids, C, index_table, flags_table, epoch_id=epoch_id
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
