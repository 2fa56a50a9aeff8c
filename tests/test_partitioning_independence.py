"""Results must be pure functions of the data, not the partitioning.

The determinism contract (FIXTURES rules, SURVEY §2C) says every
declared query returns identical rows under any parallelism — retries,
executor loss, AQE re-plans, cluster resizes. This re-runs the most
partitioning-sensitive operators (hash sampling, float aggregation,
LSH banding, fold-based EWMA, IVF argmax) under a different shuffle
width and requires byte-identical results.
"""

from __future__ import annotations

import pytest

from flink_stream_spark.operators import REGISTRY
import flink_stream_spark.operators.corpus_ops  # noqa: F401
import flink_stream_spark.operators.dedup  # noqa: F401
import flink_stream_spark.operators.events_analytics  # noqa: F401
import flink_stream_spark.operators.misc  # noqa: F401
import flink_stream_spark.operators.sampling  # noqa: F401
import flink_stream_spark.operators.similarity  # noqa: F401
import flink_stream_spark.operators.text_rank  # noqa: F401
import flink_stream_spark.operators.asof  # noqa: F401
import flink_stream_spark.operators.cdc  # noqa: F401
import flink_stream_spark.operators.graph  # noqa: F401
import flink_stream_spark.operators.multimodal  # noqa: F401

SENSITIVE = [
    "sample_temperature_resample",
    "dedup_minhash_lsh_pairs",
    "events_ewma",
    "text_vocab_coverage",
    "simsearch_ivf_topk",
    "agg_salted_two_phase",
    # round 3: global-cumsum packing (range-partition offsets must not
    # depend on partition count), k-means argmin, CEP window compile
    "corpus_pack_sequences",
    "embedding_kmeans_assign",
    "events_match_recognize",
    "events_asof_join",
    "cdc_scd2_history",
    "dedup_cluster_assign",
    # round 4: span-merge windows, argmin packing, greedy survivor
    # rule, micro-quantized LM scores, weighted top-k
    "dedup_exact_substr_spans",
    "text_winnowing_fingerprints",
    "dedup_semdedup_cluster",
    "sample_dsir_importance",
    "sample_priority_weighted",
    "text_line_dedup",
    # round 7: bloom bit-fold, held-out LM micro-quantized scores,
    # hash-derived projection matrix
    "dedup_incremental_bloom",
    "text_bigram_logppl",
    "embedding_jl_project",
    # round 7 (cont.): two-level K-smallest selection, persisted
    # fingerprint self-join, checkpointed oriented-edge joins
    "agg_kmv_distinct_sketch",
    "multimodal_audio_fingerprint_pairs",
    "graph_triangle_count",
    "agg_kmv_set_ops",
    "graph_local_clustering_topk",
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_independent_of_shuffle_width(spark, sf_small, name):
    base = [tuple(r) for r in REGISTRY[name].build(spark, sf_small).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        narrow = [tuple(r) for r in REGISTRY[name].build(spark, sf_small).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert narrow == base, name
