"""Self-enforcing sf1 performance gate (round-5 verdict, Next #3).

PLANS.md declares a forward gate — every headline query at sf1 must
stay within 2x its committed ``BENCH_sf1.json`` record — but until
now nothing enforced it: sub-second regressions at sf0.1 hide inside
fixed-overhead noise (see the bench-noise notes in PLANS.md), and
only manual sf1 probes caught plan regressions. This test IS the
gate. Opt-in like the nightly oracle run (the sf1 dataset is
synthesized locally, not driver-provided, and the run takes minutes):

    SPARK_GRAFT_BENCH_SF1=1 python -m pytest tests/test_bench_gate.py

Per query: one untimed warmup, then min-of-3 to the noop sink (the
same steady-state protocol as bench.py). Threshold is
max(2x committed, committed + 0.75 s) — the absolute floor keeps
sub-second entries from flapping on scheduler jitter while still
catching any real plan regression (those show up at sf1 as seconds,
not tenths). A headline query MISSING from the committed record
fails the gate: new headline entries must be recorded at sf1 before
they ship (the two-scale pre-registration rule).
"""

from __future__ import annotations

import json
import os
import time

import pytest

SF1_DIR = "/root/repo/.bench_data/sf1"
RECORD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_sf1.json")

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_BENCH_SF1"),
    reason="sf1 perf gate is opt-in: set SPARK_GRAFT_BENCH_SF1=1 "
    "(requires tools/make_scaled_data.py output at .bench_data/sf1)",
)


def test_headline_within_2x_of_committed_sf1_record(spark):
    if not os.path.isdir(SF1_DIR):
        pytest.skip(f"{SF1_DIR} missing: run tools/make_scaled_data.py first")
    from bench import HEADLINE
    from flink_stream_spark.operators import REGISTRY

    committed = json.load(open(RECORD))["queries"]
    missing = [q for q in HEADLINE if q not in committed]
    assert not missing, (
        f"headline queries without a committed sf1 record: {missing} — "
        "re-record BENCH_sf1.json (SPARK_GRAFT_SF_DIR=.bench_data/sf1 "
        "python bench.py) before shipping them"
    )

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    breaches = []
    for name in HEADLINE:
        df = REGISTRY[name].build(spark, SF1_DIR)
        materialize(df)  # warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(df)
            best = min(best, time.perf_counter() - t0)
        limit = max(2.0 * committed[name], committed[name] + 0.75)
        if best > limit:
            breaches.append((name, round(best, 3), committed[name]))
    assert not breaches, (
        "sf1 perf gate breaches (query, measured, committed): "
        f"{breaches} — a >2x regression at sf1 is a plan change, "
        "not noise; read .explain() before re-recording"
    )
