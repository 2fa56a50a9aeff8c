"""Incremental streaming IMAGE near-dedup against an accumulated index.

The image twin of ``streaming/dedup_stream.py`` — the shape a daily
multimodal crawl runs: media arrives in micro-batches; each batch is
dHashed (PNG payloads decode to real pixels via operators/png.py,
everything else byte-resamples — the identical ladder as the batch
query), probed against the accumulated dHash index of all previously
KEPT images via Hamming-LSH banding, exact-Hamming verified (≤
``DHASH_HAMMING_MAX`` over the full 64 bits), and flagged
keep-or-duplicate. Kept images' RAW 8-byte-band hashes join the index
(16 bytes/doc); duplicates never do — keep-FIRST semantics in stream
order, matching the text twin.

Because the index stores the raw byte-bands (not pre-exploded band
values), the corpus-adaptive band tier is re-derived per batch from
ONE scalar count of index+batch and both sides re-block
algebraically (``dhash_band_vals`` is a pure column expression over
the stored hash) — the index never needs rewriting when the corpus
crosses a tier boundary, the property that makes the adaptive
banding usable in an always-on stream. The batch query's hot-band
cap is deliberately NOT applied on the probe side: the cap is a
batch-global recall/cost trade, and an incremental probe joining
new-batch rows (small) against a capped index would silently drop
true dups as buckets heat up over epochs; the probe join cost is
|batch|×bucket, bounded by the batch size. Within-batch duplicate
resolution reuses the generic DataFrame-side greedy fixpoint
(``_resolve_greedy_keep_first``) — no pair ever reaches the driver.

Replay safety: every index commit carries an ``epoch:<id>``
idempotency token (at-least-once foreachBatch re-deliveries no-op),
and the probe excludes self-pairs so a replay against a
partially-committed epoch computes the identical flag set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.operators.multimodal import (
    DHASH_HAMMING_MAX,
    dhash_band_vals,
    dhash_bands,
    dhash_hamming,
    dhash_num_bands,
)
from flink_stream_spark.streaming.dedup_stream import _resolve_greedy_keep_first
from flink_stream_spark.tables.managed import ManagedTable


def _explode_bands(hashes: DataFrame, nb: int) -> DataFrame:
    return hashes.select(
        "doc_id", F.posexplode(dhash_band_vals(nb)).alias("band_idx", "band_val")
    )


def _verified_dup_pairs(
    new_hashes: DataFrame, index_hashes: DataFrame, cand: DataFrame
) -> DataFrame:
    """Exact-Hamming verify of candidate (new_doc, old_doc) pairs —
    the same 8 codegen'd bit_count(xor) terms as the batch query."""
    ha = new_hashes.select(
        F.col("doc_id").alias("new_doc"), F.col("bands").alias("h_new")
    )
    hb = index_hashes.select(
        F.col("doc_id").alias("old_doc"), F.col("bands").alias("h_old")
    )
    return (
        cand.join(ha, "new_doc")
        .join(hb, "old_doc")
        .filter(dhash_hamming(F.col("h_new"), F.col("h_old")) <= DHASH_HAMMING_MAX)
        .select("new_doc", "old_doc")
    )


def process_image_batch(
    batch: DataFrame,
    index_table: ManagedTable,
    flags_table: ManagedTable,
    epoch_id: "int | None" = None,
) -> None:
    """Admit one micro-batch of (doc_id, payload binary) against the
    dHash index. Within the batch, stream order is doc_id order (the
    replay contract); a batch image can be a duplicate of an earlier
    KEPT batch image, resolved greedily DataFrame-side."""
    spark = batch.sparkSession
    token = None if epoch_id is None else f"epoch:{epoch_id}"
    hashes_new = dhash_bands(batch).localCheckpoint(eager=True)

    if index_table.exists():
        idx = index_table.read(spark)
        # adaptive tier from ONE scalar count over index + batch; the
        # raw stored hash re-blocks at any tier without rewriting
        nb = dhash_num_bands(idx.count() + hashes_new.count())
        e_new = _explode_bands(hashes_new, nb)
        e_idx = _explode_bands(idx, nb)
        cand_idx = (
            e_new.alias("n")
            .join(
                e_idx.alias("i"),
                (F.col("n.band_idx") == F.col("i.band_idx"))
                & (F.col("n.band_val") == F.col("i.band_val"))
                & (F.col("n.doc_id") != F.col("i.doc_id")),
            )
            .select(
                F.col("n.doc_id").alias("new_doc"),
                F.col("i.doc_id").alias("old_doc"),
            )
            .distinct()
        )
        dup_vs_index = _verified_dup_pairs(hashes_new, idx, cand_idx)
        flagged = dup_vs_index.groupBy("new_doc").agg(
            F.min("old_doc").alias("dup_of")
        )
    else:
        nb = dhash_num_bands(hashes_new.count())
        e_new = _explode_bands(hashes_new, nb)
        flagged = spark.createDataFrame([], "new_doc bigint, dup_of bigint")
    flagged = flagged.localCheckpoint(eager=True)

    # within-batch: same banding, smaller-id side is the "old" doc
    cand_local = (
        e_new.alias("a")
        .join(
            e_new.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("b.doc_id").alias("new_doc"), F.col("a.doc_id").alias("old_doc")
        )
        .distinct()
    )
    dup_local = _verified_dup_pairs(hashes_new, hashes_new, cand_local).localCheckpoint(
        eager=True
    )
    local_flagged = _resolve_greedy_keep_first(
        batch.select("doc_id"), dup_local, flagged
    )
    flagged = flagged.unionByName(local_flagged)

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
    flags_table.append(flags, token=token)

    kept = flags.filter(~F.col("is_dup")).select("doc_id")
    index_table.append(hashes_new.join(kept, "doc_id"), token=token)

    # small-files maintenance (threshold-triggered, post-commit — same
    # rationale as the text twin)
    for t in (flags_table, index_table):
        t.maybe_compact(spark)


def start_incremental_image_dedup(
    spark: SparkSession,
    source_dir: str,
    index_table: ManagedTable,
    flags_table: ManagedTable,
    checkpoint_dir: str,
):
    """File-replayed media stream → per-batch incremental image dedup.
    One file per trigger keeps batch boundaries deterministic for the
    parity test; a Kafka/object-store source swaps in behind the same
    foreachBatch."""
    stream = (
        spark.readStream.schema("doc_id bigint, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        process_image_batch(batch, index_table, flags_table, epoch_id=epoch_id)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
