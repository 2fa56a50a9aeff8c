#!/usr/bin/env python
"""Round-9 optimization probe: for each headline query, capture the
formatted physical plan to plans/r09/<name>_<tag>.txt and record
bench-methodology timing (1 untimed warmup + min of 5 noop writes)
plus plan-shape counters (Exchange / python-eval / subquery counts)
so before/after claims are checkable against committed artifacts.

Usage: python tools/opt_probe.py <tag> [query ...]
  tag: suffix for the plan files (before / after)
  queries: default = bench.py CORE+EXTENDED
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_stream_spark import get_spark  # noqa: E402
from flink_stream_spark.operators import REGISTRY  # noqa: E402
from flink_stream_spark.plans import explain_str  # noqa: E402
import __spark_entry__  # noqa: F401,E402  (registers every operator)


def plan_counts(text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "reused": len(re.findall(r"ReusedExchange", text)),
        "py_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", text)
        ),
        "smj": len(re.findall(r"SortMergeJoin", text)),
        "bhj": len(re.findall(r"BroadcastHashJoin", text)),
        "shj": len(re.findall(r"ShuffledHashJoin", text)),
        "sorts": len(re.findall(r"\bSort \[", text)),
        "subqueries": len(re.findall(r"Subquery:", text)),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", os.path.join(REPO, "plans", "r10")
    )
    os.makedirs(out_dir, exist_ok=True)

    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import bench

        names = bench.HEADLINE

    spark = get_spark("opt-probe-r09")
    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        t_build0 = time.perf_counter()
        df = REGISTRY[name].build(spark, sf_dir)
        build_s = time.perf_counter() - t_build0
        text = explain_str(df)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(text)
        df.write.format("noop").mode("overwrite").save()  # warmup
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        results[name] = {
            "sec": round(best, 3),
            "build_sec": round(build_s, 2),
            **plan_counts(text),
        }
        print(json.dumps({name: results[name]}), flush=True)
    total = round(sum(r["sec"] for r in results.values()), 2)
    print(json.dumps({"tag": tag, "total_sec": total, "n": len(results)}))
    with open(os.path.join(out_dir, f"probe_{tag}.json"), "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
