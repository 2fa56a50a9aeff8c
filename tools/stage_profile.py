#!/usr/bin/env python
"""Per-stage time breakdown for one or more registry queries.

Probe-only session (UI enabled on an ephemeral port so the REST API
serves stage metrics — the product session keeps spark.ui.enabled
false). For each query: build, one untimed warmup, then ONE timed run
inside a fresh job group; afterwards the REST API's stage records for
that run are printed sorted by executor run time.

Usage: python tools/stage_profile.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession  # noqa: E402


def get_probe_spark():
    from flink_stream_spark.session import get_spark

    # patch: same product confs, UI on (probe-only)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage-profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4055")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    return s


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4055/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_probe_spark()
    import __spark_entry__  # noqa: F401

    from flink_stream_spark.operators import REGISTRY

    app_id = spark.sparkContext.applicationId
    for name in sys.argv[1:]:
        df = REGISTRY[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warmup
        jobs_before = {j["jobId"] for j in rest(f"applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jobs = [
            j
            for j in rest(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in rest(f"applications/{app_id}/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, {len(stages)} stages")
        for s in stages[:14]:
            print(
                f"  stage {s['stageId']:4d} tasks={s['numCompleteTasks']:3d} "
                f"run={s.get('executorRunTime',0)/1000:7.2f}s "
                f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
                f"shufR={s.get('shuffleReadBytes',0)>>10:8d}K "
                f"shufW={s.get('shuffleWriteBytes',0)>>10:8d}K "
                f"in={s.get('inputBytes',0)>>10:8d}K  {s.get('name','')[:70]}"
            )


if __name__ == "__main__":
    main()
