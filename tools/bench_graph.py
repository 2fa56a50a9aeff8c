#!/usr/bin/env python
"""Build-inclusive graph-query bench (round-8 verdict, wrong #3 /
Next #4).

The three graph queries materialize their edge structure EAGERLY at
build time (localCheckpoint in operators/graph.py), so bench.py's
build-once-then-time protocol measures only the post-checkpoint tail
— the wedge join that actually costs ~90 s at sf1 is invisible to
every mechanical gate, and a regression to `_wedge_parallelism`
would trip nothing. This tool times each graph query in a FRESH
SUBPROCESS, wall-clock from session-ready to noop-sink completion —
build, checkpoints, and final plan included — and prints one JSON
line compatible with BENCH_graph_sf1.json:

  {"metric": "graph_build_inclusive", "unit": "sec",
   "queries": {name: sec}, "sf": <sf>}

Run (records at sf1):

  SPARK_GRAFT_SF_DIR=.bench_data/sf1 python tools/bench_graph.py

A fresh JVM per query means no page-cache or JIT carry-over between
queries; the dataset is pre-touched once (untimed) so the first
query doesn't eat the cold page cache (the bench.py discipline).
tests/test_graph_gate.py gates these numbers against the committed
record the way test_bench_gate.py gates BENCH_sf1.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GRAPH_QUERIES = [
    "graph_pagerank_bipartite",
    "graph_triangle_count",
    "graph_local_clustering_topk",
]

_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from flink_stream_spark import get_spark
from flink_stream_spark.operators import REGISTRY
import flink_stream_spark.operators.graph  # noqa: F401

spark = get_spark("flink_stream_spark-graphbench")
# session warm-up: one trivial job so JVM/scheduler startup is not
# attributed to the measured query
spark.range(1000).count()
t0 = time.perf_counter()
df = REGISTRY[{name!r}].build(spark, {sf_dir!r})
df.write.format("noop").mode("overwrite").save()
print("GRAPH_SECS", time.perf_counter() - t0)
"""


def _pretouch(sf_dir: str) -> None:
    # single source of truth: bench.py owns the page-cache warm-up
    sys.path.insert(0, REPO)
    from bench import _pretouch as _bench_pretouch

    _bench_pretouch(sf_dir)


def run_one(name: str, sf_dir: str, timeout: int = 1200) -> float:
    res = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO, name=name, sf_dir=sf_dir)],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    if res.returncode != 0:
        raise RuntimeError(
            f"{name} failed (rc={res.returncode}): {res.stderr[-2000:]}"
        )
    for ln in res.stdout.splitlines():
        if ln.startswith("GRAPH_SECS "):
            return float(ln.split()[1])
    raise RuntimeError(f"{name}: no GRAPH_SECS line in output")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _pretouch(sf_dir)
    timings = {}
    for name in GRAPH_QUERIES:
        # min of 2: single-shot build-inclusive wall carries 25-35%
        # JIT/GC jitter at the ~100 s scale (observed 215.0 vs
        # 158.6 s) — the committed record's protocol, reproducible
        # by re-running this tool (self-review, round 9)
        runs = [run_one(name, sf_dir), run_one(name, sf_dir)]
        timings[name] = round(min(runs), 2)
        print(
            f"# {name}: {timings[name]} s (runs: "
            f"{[round(r, 1) for r in runs]})",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "graph_build_inclusive",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
