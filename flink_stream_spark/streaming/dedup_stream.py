"""Incremental streaming near-dedup against an accumulated corpus.

The streaming form of the MinHash-LSH near-dedup pipeline
(operators/dedup.py): documents arrive in micro-batches; each batch is
signed (K=32 minhashes → 8 bands), probed against the accumulated
band index of all previously KEPT documents, exact-Jaccard verified,
and flagged keep-or-duplicate. Kept documents' bands and shingle sets
join the index; duplicates never do (keep-FIRST semantics in stream
order, matching a curation pipeline that admits a document only if
nothing like it was admitted before).

This is the reference's keyed-upsert-sink machinery
(flink/jobs/flink_json_to_iceberg.py:61-71) carrying a dedup index
instead of a mirror table. Scale posture: per batch, the probe join is
on (band, sig) buckets — the index side is |kept docs|×8 short rows,
the shuffle is bucket-keyed, and no stage compares a batch doc against
the whole corpus. State (band index + shingle sets) lives in managed
tables, not executor memory, so a 100 TB backfill streams through in
bounded batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.operators.dedup import (
    banded_frame,
    minhash_wide,
    shingled_docs,
)
from flink_stream_spark.tables.managed import ManagedTable

JACCARD_THRESHOLD = 0.5


def banded_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig) — shared banding layout (dedup.banded_frame),
    so the streaming index can never drift from the batch pipeline."""
    return banded_frame(minhash_wide(docs))


def _verified_dup_pairs(
    new_shingles: DataFrame, index_shingles: DataFrame, cand: DataFrame
) -> DataFrame:
    """Exact-Jaccard verify of candidate (new_doc, old_doc) pairs."""
    sa = new_shingles.select(
        F.col("doc_id").alias("new_doc"), F.col("shingles").alias("sh_new")
    )
    sb = index_shingles.select(
        F.col("doc_id").alias("old_doc"), F.col("shingles").alias("sh_old")
    )
    shared = F.size(F.array_intersect(F.col("sh_new"), F.col("sh_old")))
    jac = shared.cast("double") / (
        F.size(F.col("sh_new")) + F.size(F.col("sh_old")) - shared
    )
    return (
        cand.join(sa, "new_doc")
        .join(sb, "old_doc")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("new_doc", "old_doc")
    )


def process_batch(
    batch: DataFrame,
    bands_table: ManagedTable,
    shingles_table: ManagedTable,
    flags_table: ManagedTable,
) -> None:
    """Admit one micro-batch of (doc_id, text) against the index.

    Within the batch, stream order is doc_id order (the replay
    contract); a batch doc can be a duplicate of an earlier KEPT batch
    doc, resolved greedily in doc_id order.
    """
    spark = batch.sparkSession
    sh_new = shingled_docs(batch).localCheckpoint(eager=True)
    bands_new = banded_signatures(batch).localCheckpoint(eager=True)

    if bands_table.exists():
        idx_bands = bands_table.read(spark)
        idx_shingles = shingles_table.read(spark)
        cand_idx = (
            bands_new.alias("n")
            .join(
                idx_bands.alias("i"),
                (F.col("n.band") == F.col("i.band"))
                & (F.col("n.sig") == F.col("i.sig")),
            )
            .select(
                F.col("n.doc_id").alias("new_doc"),
                F.col("i.doc_id").alias("old_doc"),
            )
            .distinct()
        )
        dup_vs_index = _verified_dup_pairs(sh_new, idx_shingles, cand_idx)
        flagged = dup_vs_index.groupBy("new_doc").agg(
            F.min("old_doc").alias("dup_of")
        )
    else:
        flagged = spark.createDataFrame([], "new_doc bigint, dup_of bigint")

    # within-batch greedy (doc_id order): candidates among batch docs,
    # resolved iteratively so a doc flagged as duplicate cannot itself
    # shadow a later doc. Batch-local candidate sets are small (LSH's
    # contract); the loop runs on the driver over pair COUNTS only.
    cand_local = (
        bands_new.alias("a")
        .join(
            bands_new.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("b.doc_id").alias("new_doc"), F.col("a.doc_id").alias("old_doc")
        )
        .distinct()
    )
    dup_local = _verified_dup_pairs(sh_new, sh_new, cand_local)
    local_pairs = [(r["new_doc"], r["old_doc"]) for r in dup_local.collect()]
    already = {r["new_doc"] for r in flagged.select("new_doc").collect()}
    greedy: dict[int, int] = {}
    for new_doc, old_doc in sorted(local_pairs, key=lambda p: (p[0], p[1])):
        if new_doc in already or new_doc in greedy:
            continue
        if old_doc in already or old_doc in greedy:
            continue  # duplicate-of-a-duplicate: the earlier doc is gone
        greedy[new_doc] = old_doc
    if greedy:
        flagged = flagged.unionByName(
            spark.createDataFrame(
                [(k, v) for k, v in greedy.items()], "new_doc bigint, dup_of bigint"
            )
        )

    flags = (
        batch.select("doc_id")
        .join(flagged, batch.doc_id == flagged.new_doc, "left")
        .select(
            "doc_id",
            F.col("dup_of"),
            F.col("dup_of").isNotNull().alias("is_dup"),
        )
        .localCheckpoint(eager=True)
    )
    flags_table.append(flags)

    kept = flags.filter(~F.col("is_dup")).select("doc_id")
    bands_table.append(bands_new.join(kept, "doc_id"))
    shingles_table.append(sh_new.join(kept, "doc_id"))


def start_incremental_dedup(
    spark: SparkSession,
    source_dir: str,
    bands_table: ManagedTable,
    shingles_table: ManagedTable,
    flags_table: ManagedTable,
    checkpoint_dir: str,
):
    """File-replayed document stream → per-batch incremental dedup.
    One file per trigger keeps batch boundaries deterministic for the
    parity test; a Kafka source swaps in behind the same foreachBatch.
    """
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        process_batch(batch, bands_table, shingles_table, flags_table)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
