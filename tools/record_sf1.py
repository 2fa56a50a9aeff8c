#!/usr/bin/env python
"""Record (or re-record) per-query sf1 bench entries in
BENCH_sf1.json — with the box-sanity preflight the round-9 incident
made mandatory: records taken under host memory degradation are
2-8x too loose and poison every later gate comparison, so this tool
REFUSES to write them (testing/boxcheck.py, same floor as the
gates).

Usage:
    python tools/record_sf1.py                  # all headline queries
    python tools/record_sf1.py q1 q2 ...        # just the named ones

Protocol per query (bench.py's): build once, one untimed warm-up
materialize, then best-of-5 timed noop-sink materializes. The
dataset directory defaults to .bench_data/sf1 (override with
SPARK_GRAFT_SF_DIR)."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_stream_spark.testing.boxcheck import require_healthy_box  # noqa: E402


def main() -> None:
    gbps = require_healthy_box()
    print(f"# box ok: {gbps:.2f} GB/s", file=sys.stderr)

    import __spark_entry__  # noqa: F401
    from bench import HEADLINE, _pretouch
    from flink_stream_spark import get_spark
    from flink_stream_spark.operators import REGISTRY

    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", os.path.join(REPO, ".bench_data", "sf1")
    )
    names = sys.argv[1:] or HEADLINE
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    _pretouch(sf_dir)
    spark = get_spark("flink_stream_spark-record")
    record_path = os.path.join(REPO, "BENCH_sf1.json")
    rec = json.load(open(record_path))

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        materialize(df)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            materialize(df)
            best = min(best, time.perf_counter() - t0)
        rec["queries"][name] = round(best, 3)
        print(f"# {name}: {best:.3f}", file=sys.stderr)

    rec["value"] = round(sum(rec["queries"].values()), 3)
    json.dump(rec, open(record_path, "w"))
    print(json.dumps({"recorded": names, "total": rec["value"]}))


if __name__ == "__main__":
    main()
