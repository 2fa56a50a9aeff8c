"""Streaming-twin parity for the round-4 scoring operators (DSIR, the
Gopher battery): bounded-state streaming builds must converge to the
exact cells/rows the batch operators produce — the same contract the
streaming CMS carries (tests/test_streaming.py::test_cms_stream_matches_batch_cells).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators import REGISTRY
import flink_stream_spark.operators.quality  # noqa: F401
import flink_stream_spark.operators.sampling  # noqa: F401
from flink_stream_spark.operators.sampling import (
    DSIR_BUCKETS,
    dsir_bigram_buckets,
)
from flink_stream_spark.streaming.scoring import (
    dsir_lm_stream,
    dsir_score_batch,
    gopher_rules_stream,
    stream_documents,
)


def _drain(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    progress = q.lastProgress
    q.stop()
    return progress


def test_gopher_stream_rows_equal_batch(spark, sf_small):
    _drain(gopher_rules_stream(stream_documents(spark, sf_small)), "t_gopher", "append")
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM t_gopher").collect()
    )
    want = sorted(
        tuple(r)
        for r in REGISTRY["quality_gopher_rules"].build(spark, sf_small).collect()
    )
    assert got == want and len(got) > 0


def test_dsir_lm_stream_cells_equal_batch_and_state_bounded(spark, sf_small):
    progress = _drain(
        dsir_lm_stream(stream_documents(spark, sf_small)), "t_dsir_lm", "complete"
    )
    got = {
        (r["is_target"], r["b"]): r["c"]
        for r in spark.sql("SELECT * FROM t_dsir_lm").collect()
    }
    want = {
        (r["is_target"], r["b"]): r["c"]
        for r in dsir_bigram_buckets(load_table(spark, sf_small, "documents"))
        .groupBy("is_target", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == want and len(got) > 0
    # bounded-by-construction state: never more rows than 2 x buckets,
    # regardless of stream length — read from the state store metrics
    state_rows = sum(
        op["numRowsTotal"] for op in (progress or {}).get("stateOperators", [])
    )
    assert 0 < state_rows <= 2 * DSIR_BUCKETS


def test_dsir_scores_from_drained_stream_equal_batch_query(spark, sf_small):
    """End-to-end: LM built by the STREAM, scores computed against it
    batch-side, must equal sample_dsir_importance exactly (same add-1
    smoothing, same micro-quantization)."""
    _drain(
        dsir_lm_stream(stream_documents(spark, sf_small)), "t_dsir_lm2", "complete"
    )
    lm = spark.sql("SELECT * FROM t_dsir_lm2")
    raw = load_table(spark, sf_small, "documents")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score_micro"], r["avg_log_ratio"])
        for r in dsir_score_batch(raw, lm).collect()
    }
    want = {
        r["doc_id"]: (r["n_bigrams"], r["score_micro"], r["avg_log_ratio"])
        for r in REGISTRY["sample_dsir_importance"].build(spark, sf_small).collect()
    }
    assert got == want and len(got) > 0


def test_hourly_rollup_merge_on_read_with_autocompact(spark, sf_small, tmp_path):
    """The reference's literal production shape: streaming upsert into
    a merge-on-read table (Flink -> Iceberg v2 equality deletes), with
    threshold auto-compaction folding the tombstones. Final state must
    equal the copy-on-write run AND the batch aggregate."""
    from flink_stream_spark.streaming.rollup import start_hourly_rollup
    from flink_stream_spark.tables.managed import Warehouse

    states = {}
    for mode in ("cow", "mor"):
        wh = Warehouse(str(tmp_path / f"wh_{mode}"))
        table = wh.table(f"rollup_{mode}", key_columns=["h_ms", "event_type"])
        q = start_hourly_rollup(
            spark,
            sf_small,
            table,
            str(tmp_path / f"ckpt_{mode}"),
            trigger_seconds=1,
            merge_mode=mode,
            autocompact_files_per_bucket=4 if mode == "mor" else None,
        )
        q.processAllAvailable()
        q.stop()
        states[mode] = {
            (r["h_ms"], r["event_type"]): (r["n"], r["cents"])
            for r in table.read(spark).collect()
        }
        if mode == "mor":
            # after a drained replay the table must be readable cheaply:
            # auto-compaction bounded the per-bucket file count
            manifest = table._load_manifest(table.current_version())
            dels = manifest.get("deletes", {})
            worst = max(
                len(ps) + len(dels.get(b, []))
                for b, ps in manifest["buckets"].items()
            )
            assert worst <= 4 + 1  # threshold + the trigger that tripped it
    assert states["mor"] == states["cow"] and len(states["cow"]) > 0
