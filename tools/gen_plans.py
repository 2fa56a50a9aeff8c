#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the headline
operators with scale-reasoning notes."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_stream_spark import get_spark  # noqa: E402
from flink_stream_spark.operators import REGISTRY  # noqa: E402
from flink_stream_spark.plans import explain_str  # noqa: E402
import flink_stream_spark.operators.relational  # noqa: F401,E402
import flink_stream_spark.operators.dedup  # noqa: F401,E402
import flink_stream_spark.operators.similarity  # noqa: F401,E402
import flink_stream_spark.operators.events  # noqa: F401,E402
import flink_stream_spark.operators.tpch_extra  # noqa: F401,E402
import flink_stream_spark.operators.text_rank  # noqa: F401,E402
import flink_stream_spark.operators.sampling  # noqa: F401,E402
import flink_stream_spark.operators.misc  # noqa: F401,E402
import flink_stream_spark.operators.corpus_ops  # noqa: F401,E402
import flink_stream_spark.operators.events_analytics  # noqa: F401,E402
import flink_stream_spark.operators.multimodal  # noqa: F401,E402
import flink_stream_spark.operators.cdc  # noqa: F401,E402
import flink_stream_spark.operators.quality  # noqa: F401,E402
import flink_stream_spark.operators.pipeline  # noqa: F401,E402
import flink_stream_spark.operators.graph  # noqa: F401,E402

NOTES = {
    "q1_pricing_summary": (
        "Filter and the 7-column projection reach the parquet scan "
        "(PushedFilters / ReadSchema); partial+final HashAggregate around one "
        "exchange. Money terms are exact scaled-long arithmetic "
        "(operators/money.py): the partial_sum inputs are long multiplies cast "
        "to compact DECIMAL(18,0) — no BigDecimal in the per-row loop, all "
        "inside whole-stage codegen."
    ),
    "q5_local_supplier_volume": (
        "The three dimension tables broadcast (BroadcastHashJoin, no shuffle of "
        "the fact side for them); only the customer⋈orders⋈lineitem chain "
        "shuffles, on its join keys. At 1000 executors the dims still broadcast "
        "and AQE re-plans the fact shuffles from runtime sizes."
    ),
    "q18_large_volume_customer": (
        "The HAVING subquery becomes an aggregate feeding a LEFT SEMI join; "
        "top-k is TakeOrderedAndProject — no global sort at any scale."
    ),
    "sort_limit_topk": (
        "TakeOrderedAndProject: per-partition heaps + driver merge of k rows; "
        "at 100 TB this moves k rows per partition, never the table."
    ),
    "dedup_minhash_lsh_pairs": (
        "Shingle explode → md5 hash → groupBy(doc) with 32 codegen'd MIN aggs "
        "(map-side partial: the shuffle is |docs|×32 ints, independent of doc "
        "length) → band explode → bucket groupBy → in-bucket pair expansion "
        "(no self-join, no cartesian) → exact-Jaccard verify via two doc_id "
        "joins on the candidate set."
    ),
    "simsearch_bruteforce_topk": (
        "Query set broadcast (BroadcastNestedLoopJoin over 5 rows); the corpus "
        "is scanned once, cosine computed in-line, per-query top-k via window. "
        "The only shuffled data is |queries|×k result rows."
    ),
    "events_sessionize": (
        "One shuffle on user_id shared by both window functions (lag + running "
        "sum) and the final aggregate — Catalyst reuses the partitioning across "
        "all three stateful ops."
    ),
    "text_tfidf_topk": (
        "Token explode is narrow; tf aggregates on (doc_id, term) with map-side "
        "partials; the derived document-frequency table joins back (AQE picks "
        "broadcast when the vocab fits); per-doc top-k runs as WindowGroupLimit "
        "— bounded heaps, no full sort of the term table."
    ),
    "sample_hash_bernoulli": (
        "Sampling is a pure per-row predicate on the scan output — no shuffle, "
        "no seed, no sampler operator; only the final presentation sort "
        "exchanges data. At 100 TB membership is decided entirely map-side."
    ),
    "embedding_label_centroids": (
        "posexplode is narrow; one (label, dim) aggregate with map-side partial "
        "sums of exact scaled integers — the shuffle carries |labels|×|dims| "
        "partial sums, never embedding vectors."
    ),
    "text_decontaminate_overlap": (
        "Both sides tokenize once and explode distinct 5-grams; the eval-set "
        "side is BroadcastHashJoin'd (an eval corpus is tiny next to 100 TB of "
        "training data), so the train side never shuffles its n-grams — the "
        "only exchange is the per-doc overlap count, one long per doc."
    ),
    "text_chunk_windows": (
        "Tokenize once, sequence+explode the window offsets, slice per chunk — "
        "a narrow pipeline whose only exchanges are the deliberate spread "
        "repartition (the small fixture arrives as one split; a 100 TB corpus "
        "arrives pre-split) and the presentation sort. Chunking itself is "
        "embarrassingly parallel at scan parallelism."
    ),
    "sample_temperature_resample": (
        "The per-source rate table (a few rows) broadcasts; corpus membership "
        "is a map-side md5-bucket predicate against the broadcast rate — one "
        "scan of the corpus, no row-level shuffle. Integer ppm arithmetic "
        "keeps the rates bit-identical under any aggregation order."
    ),
    "text_vocab_coverage": (
        "Token counting is one map-side-combined aggregate; the running-total "
        "window runs over the vocabulary (bounded, ~10^5-10^6 terms at any "
        "corpus size), not the corpus — the single-partition window warning "
        "applies to that bounded table only."
    ),
    "events_funnel": (
        "Three stage aggregates all hash on user_id — AQE reuses one shuffle "
        "partitioning across every stage join; stage outputs are one row per "
        "user and the final result is three scalar counts."
    ),
    "events_time_weighted_avg": (
        "lead() and the final aggregate share the user_id partitioning; "
        "weights are exact integers (cents × µs durations), so partial-agg "
        "order can't change the result — one shuffle total."
    ),
    "events_anomaly_zscore": (
        "Per-user moments aggregate once (map-side partials, exact integer "
        "sums), then join back on the same user_id key — partitioning reused, "
        "no division or sqrt in the flag predicate."
    ),
    "events_multires_rollup": (
        "Continuous-aggregate shape: daily derives from the HOURLY partial "
        "aggregate (counts + exact integer cent sums re-aggregate "
        "losslessly), so coarser resolutions never rescan raw events. The "
        "streaming twin (streaming/rollup.py) maintains the hourly table "
        "incrementally via keyed MERGE."
    ),
    "events_topk_per_window": (
        "The count aggregate combines map-side into |windows|×|types| rows; "
        "the per-window rank is WindowGroupLimit over that bounded table — "
        "one scan of the raw stream, bounded everything after."
    ),
    "simsearch_ivf_topk": (
        "Centroids broadcast for assignment (one corpus pass); probing "
        "touches NPROBE/NLIST of the data — the partition-pruned ANN path. "
        "All cosine arithmetic is ×1e6 scaled integers in float64, exact "
        "under any order, so the argmax assignment is reproducible."
    ),
    "simsearch_recall_at_k": (
        "The evaluation loop: exact side broadcasts only the query vectors "
        "over one corpus scan; IVF side reuses the index plan. Shuffled data "
        "is |queries|×k id pairs on both sides."
    ),
    "agg_salted_two_phase": (
        "Skew pattern: 3 hot keys → phase 1 aggregates on (key, "
        "content-derived salt) into 48 even groups, phase 2 combines the "
        "partials. Exact DECIMAL partials make the re-aggregation lossless; "
        "the salt is xxhash64 of row content, so retries reproduce it."
    ),
    "multimodal_feature_extract": (
        "Arrow-batched mapInPandas producing a fixed-width vector per "
        "payload — narrow (no shuffle before the presentation sort); the UDF "
        "body swaps for a real encoder with identical plumbing."
    ),
    "text_pii_redact": (
        "Map-only regex pass: detection counts + placeholder rewrite all "
        "inside one projection over the scan; no exchange before the "
        "presentation sort."
    ),
    "events_window_cumulate": (
        "CUMULATE (Flink FLIP-145) as sequence+explode over the span's "
        "remaining step boundaries — a constant ≤span/step fan-out inside "
        "the projection, then one map-side-combining aggregate on "
        "(span, window_end). No UDF, no per-row state."
    ),
    "embedding_kmeans_assign": (
        "Lloyd iteration: centroids broadcast for assignment (one corpus "
        "scan, no corpus shuffle); the update explodes to (cluster, dim) "
        "partial sums — k×dim keys, so the combined shuffle is KBs at any "
        "corpus size. Exact integer means keep the argmin reproducible."
    ),
    "cdc_temporal_join": (
        "Temporal (FOR SYSTEM_TIME AS OF) join: versions and probes hash "
        "on user_id; the validity-interval containment evaluates inside "
        "the co-partitioned SortMergeJoin — no range explosion, at most "
        "one version matches per probe."
    ),
    "quality_classifier_score": (
        "Model inference as whole-stage-codegen projection: every feature "
        "and the scaled-logit threshold evaluate inside one map stage over "
        "the scan — the 100 TB posture is a single pass with no exchange "
        "before the presentation sort."
    ),
    "pipeline_pretraining_batch": (
        "The full pretraining pipeline in one plan: classifier gate is a "
        "scan-local filter, exact dedup shuffles 32-byte hashes, the "
        "mixture rate table broadcasts (|sources| rows), and packing's "
        "global cumsum range-partitions with broadcast offsets — no "
        "stage reads document bodies after the dedup join."
    ),
    "text_bpe_pair_merges": (
        "Bounded per-word explode → 26²-key histogram with map-side "
        "partials → TakeOrderedAndProject top-k: the per-merge-round scan "
        "of a distributed BPE trainer, shuffling KBs regardless of corpus "
        "size."
    ),
    "agg_percentile_approx": (
        "GK/KLL sketch: partial percentile_approx + the exact reference "
        "percentiles combine map-side around ONE exchange of fixed-size "
        "sketch state — at 100 TB nothing resembling a global sort of "
        "the value column exists in the plan; the tolerance contract "
        "evaluates as a scalar projection on 3 aggregate rows."
    ),
    "events_histogram_width_bucket": (
        "width_bucket is a codegen'd arithmetic expression, so the whole "
        "histogram is partial+final HashAggregate over ≤12 keys: shuffle "
        "volume is O(buckets), independent of row count. Exact-cents sums "
        "keep the hash float-order-insensitive."
    ),
    "graph_pagerank_bipartite": (
        "Shown: the top-k segment over the CHECKPOINTED final rank "
        "vector (Scan ExistingRDD → TakeOrderedAndProject) — checkpoint "
        "truncation is the point: every iteration's segment is one join "
        "of the rank vector to the materialized edge list on the node "
        "key plus one map-side-combining SUM, and lineage depth stays "
        "constant across rounds instead of re-deriving the distinct-edge "
        "scan 2× per iteration (the unrolled form measured 10 redundant "
        "scans). Per-iteration shuffle is O(|edges|) 16-byte rows."
    ),
    "dedup_exact_substr_spans": (
        "ExactSubstr span detection: the positional-gram explode is narrow "
        "(no shuffle); grams shuffle ONCE as 60-bit hashes for the frequency "
        "count (partial/final HashAggregate); the duplicate-filter join back "
        "is 1:1 per position; span merging is a doc_id-partitioned window "
        "bounded by tokens-per-doc. No stage quadratic in corpus size — the "
        "scan-based alternative to the paper's suffix array."
    ),
    "text_winnowing_fingerprints": (
        "Winnowing (MOSS): the rightmost-min-per-window argmin is ONE "
        "doc-partitioned MIN window pass over a packed integer key "
        "h*2^20+(2^20-1-i) — no nested window functions, no self-join; "
        "selections decode with exact integer div/mod and fingerprints "
        "shuffle as 40-bit ints for the per-doc aggregate."
    ),
    "embedding_covariance_exact": (
        "Distributed exact covariance: MapInPandas emits one (n, sx[d], "
        "sxy[d(d+1)/2]) int64 partial PER ARROW BATCH (numpy X^T X — the "
        "d^2 work never becomes rows); partials combine as decimal(38,0) "
        "sums over |batches| rows; the final join of sums is broadcast at "
        "64 rows. Traffic after the scan is independent of corpus size."
    ),
    "agg_heavy_hitters_cms": (
        "Count-min sketch: the corpus aggregates into DEPTH x WIDTH = 256 "
        "counter cells (map-side partial combine — the shuffle is bounded "
        "by the sketch size, not the data); point estimates broadcast the "
        "256-cell table to the top-k probe rows. Cell-wise mergeable under "
        "any partitioning (asserted in tests/test_sketches.py)."
    ),
    "dedup_incremental_new_batch": (
        "Incremental dedup: the incoming batch never self-joins — layer 1 "
        "is a left join against the DISTINCT index hash set, layer 2 a "
        "band-bucket join of batch bands vs index bands (cost |batch| x "
        "matched buckets). At production scale the index side is the "
        "persisted band index the streaming twin maintains."
    ),
    "sample_priority_weighted": (
        "Priority sampling: one narrow scan pass computes w/u with a "
        "single IEEE division per row; TakeOrderedAndProject merges "
        "per-partition top-k heaps on the driver — k rows per partition "
        "move, never the table."
    ),
    "corpus_curriculum_bins": (
        "Curriculum binning: ONE exact percentile aggregate produces the "
        "3 quartile boundaries (never an ntile window moving the corpus "
        "through a single partition); the boundaries broadcast back and "
        "binning is a map-side CASE feeding a 4-group aggregate."
    ),
    "dq_constraint_report": (
        "DQ report: each constraint is a scan-side aggregate or a "
        "BroadcastHashJoin LeftAnti against a key projection; the union "
        "is |constraints| single-row aggregates — nothing data-sized "
        "crosses the driver."
    ),
}


def main() -> None:
    spark = get_spark("gen-plans", cpus=8)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = [
        "# PLANS — physical-plan evidence for the headline operators",
        "",
        "Generated by `python tools/gen_plans.py` (explain mode: formatted,",
        "sf0.01). What to look for in each plan is noted above it; the",
        "assertions in `tests/test_plans.py` keep these properties true.",
        "",
    ]
    for name, note in NOTES.items():
        df = REGISTRY[name].build(spark, sf)
        out.append(f"## {name}\n")
        out.append(note + "\n")
        out.append("```\n" + explain_str(df).strip() + "\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "PLANS.md")
    epilogue = ""
    if os.path.exists(path):
        old = open(path).read()
        marker = "## Scale probe"
        if marker in old:
            epilogue = "\n" + old[old.index(marker):]
    with open(path, "w") as f:
        f.write("\n".join(out) + epilogue)
    print("PLANS.md written")


if __name__ == "__main__":
    main()
