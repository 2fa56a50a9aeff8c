"""Size budget for bench.py's official output line.

The driver records bench output by keeping the last 2000 characters of
stdout and json-parsing the final line. Round 7 proved the failure
mode: the 67-query line grew past the window, the driver's record shows
``"parsed": null``, and the round lost its perf ledger entry. This test
reconstructs the WORST-CASE official line (every timing at 999.999,
a value field at 99999.999) straight from bench.CORE — no Spark
session needed — and fails the suite the moment an addition to CORE
would risk the window again. EXTENDED queries are exempt by design:
they ride the "headline_full" line, which has no size contract.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CORE, EXTENDED, HEADLINE  # noqa: E402


def test_official_line_fits_driver_window_worst_case():
    line = json.dumps(
        {
            "metric": "headline_core_total",
            "value": 99999.999,
            "unit": "sec",
            "queries": {name: 999.99 for name in CORE},
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1950, (
        f"worst-case official bench line is {len(line)} chars "
        "(driver tail window is 2000): move a query from CORE to "
        "EXTENDED"
    )


def test_headline_partition_is_clean():
    assert set(CORE).isdisjoint(EXTENDED)
    assert HEADLINE == CORE + EXTENDED
    assert len(set(HEADLINE)) == len(HEADLINE)


def test_every_headline_query_is_registered():
    """Importing bench must register every headline query — the
    round-9 sf1 gate crashed with a KeyError 40 minutes in because
    bench.py's (then hand-maintained) import list had drifted from
    the entry point's. Pin the sync without spinning Spark."""
    from flink_stream_spark.operators import REGISTRY

    missing = [q for q in HEADLINE if q not in REGISTRY]
    assert not missing, (
        f"headline queries not registered by bench's imports: {missing}"
    )


def test_core_keeps_round6_record_keys():
    # Per-round comparability: every query name in the last
    # successfully parsed driver record must stay in CORE.
    rec = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_r06.json",
    )
    if not os.path.exists(rec):
        return
    r6 = json.load(open(rec))["parsed"]["queries"]
    missing = sorted(set(r6) - set(CORE))
    assert not missing, f"round-6 record keys dropped from CORE: {missing}"
