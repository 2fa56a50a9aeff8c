"""Self-enforcing sf1 performance gate (round-5 verdict, Next #3).

PLANS.md declares a forward gate — every headline query at sf1 must
stay within 2x its committed ``BENCH_sf1.json`` record — but until
now nothing enforced it: sub-second regressions at sf0.1 hide inside
fixed-overhead noise (see the bench-noise notes in PLANS.md), and
only manual sf1 probes caught plan regressions. This test IS the
gate. Opt-in like the nightly oracle run (the sf1 dataset is
synthesized locally, not driver-provided, and the run takes minutes):

    SPARK_GRAFT_BENCH_SF1=1 python -m pytest tests/test_bench_gate.py

It runs ``bench.py`` itself in a subprocess — the EXACT recording
protocol (local[32] session, untimed warmup, min-of-5 to the noop
sink) — so measured and committed numbers are produced identically;
the suite's shared cpus=8 session would systematically inflate the
parallel-heavy queries and gate on hardware, not plans. Threshold is
max(2x committed, committed + 0.75 s): the absolute floor keeps
sub-second entries from flapping on scheduler jitter while still
catching real plan regressions (those show up at sf1 as seconds, not
tenths). A headline query MISSING from the committed record fails
the gate: new headline entries must be recorded at sf1 before they
ship (the two-scale pre-registration rule).
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, ".bench_data", "sf1")
RECORD = os.path.join(REPO, "BENCH_sf1.json")

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_BENCH_SF1"),
    reason="sf1 perf gate is opt-in: set SPARK_GRAFT_BENCH_SF1=1 "
    "(requires tools/make_scaled_data.py output at .bench_data/sf1)",
)


def test_headline_within_2x_of_committed_sf1_record():
    if not os.path.isdir(SF1_DIR):
        pytest.skip(f"{SF1_DIR} missing: run tools/make_scaled_data.py first")
    # box-sanity preflight (round 9): wall-clock bounds are not
    # evaluable under host-level memory degradation — fail fast with
    # the measurement instead of emitting a misleading breach list
    from flink_stream_spark.testing.boxcheck import require_healthy_box

    require_healthy_box()
    from bench import HEADLINE

    committed = json.load(open(RECORD))["queries"]
    missing = [q for q in HEADLINE if q not in committed]
    assert not missing, (
        f"headline queries without a committed sf1 record: {missing} — "
        "re-record BENCH_sf1.json (SPARK_GRAFT_SF_DIR=.bench_data/sf1 "
        "python bench.py) before shipping them"
    )

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF1_DIR)
    # Subprocess ceiling sized to the gate's own contract, not the
    # builder's quietest run: the committed full-set total is ~1765 s
    # and every query is allowed 2x + 0.75 s, so a box running at the
    # per-query limit needs ~3650 s of wall. The old 1800 s ceiling had
    # ~2% headroom and killed the harness before evaluating a single
    # bound on any marginally slower box (round-8 verdict, wrong #2).
    # The per-query 2x bounds below are the contract; this timeout is
    # only a runaway backstop.
    res = subprocess.run(
        ["python", os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=4500,
        cwd=REPO,
        env=env,
    )
    assert res.returncode == 0, (
        f"bench.py failed (rc={res.returncode}); stderr tail: "
        f"{res.stderr[-2000:]}"
    )
    # bench.py prints the full-detail "headline_full" line before the
    # size-budgeted official CORE line; the gate wants every headline
    # query, so parse the full line.
    parsed = [
        json.loads(ln)
        for ln in res.stdout.strip().splitlines()
        if ln.startswith("{")
    ]
    full = [p for p in parsed if p.get("metric") == "headline_full"]
    assert full, f"no headline_full line in bench output: {res.stdout[-2000:]}"
    measured = full[-1]["queries"]
    absent = [q for q in HEADLINE if q not in measured]
    assert not absent, f"bench.py output is missing headline queries: {absent}"

    breaches = []
    for name in HEADLINE:
        limit = max(2.0 * committed[name], committed[name] + 0.75)
        if measured[name] > limit:
            breaches.append((name, measured[name], committed[name]))
    assert not breaches, (
        "sf1 perf gate breaches (query, measured, committed): "
        f"{breaches} — a >2x regression at sf1 is a plan change, "
        "not noise; read .explain() before re-recording"
    )
