"""Build-inclusive sf1 gate for the graph queries (round-8 verdict,
wrong #3 / Next #4).

The graph queries' eager localCheckpoints make them invisible to
bench.py's build-once protocol (their ~90 s sf1 wedge joins run at
BUILD time), so this gate times each one in a fresh subprocess,
wall-clock including the checkpoint (tools/bench_graph.py), against
the committed BENCH_graph_sf1.json record. Opt-in with the sf1 bench
gate's env var and dataset:

    SPARK_GRAFT_BENCH_SF1=1 python -m pytest tests/test_graph_gate.py

Threshold max(2x committed, committed + 15 s): build-inclusive
single-shot wall carries JVM/GC jitter of tens of seconds at the
~90 s scale, while the regressions this exists to catch (a
`_wedge_parallelism` fallback to default width cost 563 vs 429 s at
sf3 — PLANS.md) show up in multiples."""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, ".bench_data", "sf1")
RECORD = os.path.join(REPO, "BENCH_graph_sf1.json")

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_BENCH_SF1"),
    reason="sf1 graph gate is opt-in: set SPARK_GRAFT_BENCH_SF1=1 "
    "(requires tools/make_scaled_data.py output at .bench_data/sf1)",
)


def test_graph_build_inclusive_within_2x_of_committed():
    if not os.path.isdir(SF1_DIR):
        pytest.skip(f"{SF1_DIR} missing: run tools/make_scaled_data.py first")
    # box-sanity preflight (round 9): see testing/boxcheck.py —
    # bounds are meaningless under host memory degradation
    from flink_stream_spark.testing.boxcheck import require_healthy_box

    require_healthy_box()
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_graph import GRAPH_QUERIES, _pretouch, run_one

    committed = json.load(open(RECORD))["queries"]
    missing = [q for q in GRAPH_QUERIES if q not in committed]
    assert not missing, (
        f"graph queries without a committed record: {missing} — "
        "re-record BENCH_graph_sf1.json "
        "(SPARK_GRAFT_SF_DIR=.bench_data/sf1 python tools/bench_graph.py)"
    )

    _pretouch(SF1_DIR)
    breaches = []
    for name in GRAPH_QUERIES:
        secs = run_one(name, SF1_DIR)
        limit = max(2.0 * committed[name], committed[name] + 15.0)
        if secs > limit:
            breaches.append((name, round(secs, 1), committed[name]))
    assert not breaches, (
        "graph build-inclusive gate breaches (query, measured, "
        f"committed): {breaches} — a >2x regression here is a plan/"
        "width change (read _wedge_parallelism), not noise"
    )
