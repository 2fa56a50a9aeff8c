"""Driver-environment simulation: the external CORRECTNESS driver
builds its OWN SparkSession (no engine factory, no UTC conf, default
shuffle width). The contract surface must hold there too — the
defensive session settings in catalog.load_table are what's under
test. Runs in a subprocess so the session is genuinely fresh."""

from __future__ import annotations

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .appName("driver-sim")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
import __spark_entry__ as mod
from flink_stream_spark.testing.oracle import run_duckdb, canonical_hash
assert mod.entry(spark).count() > 0
qs, osql = mod.queries(), mod.oracle_sql()
sf = "/root/testdata/sf0.001"
# timestamp-, timezone- and hash-sensitive representatives
names = ["q1_pricing_summary", "scalar_datetime", "events_window_tumbling",
         "events_retention_cohorts", "sample_temperature_resample",
         "dedup_minhash_lsh_pairs", "text_unigram_rarity"]
for name in names:
    sp = qs[name](spark, sf).toPandas()
    du = run_duckdb(osql[name], sf)
    assert len(sp) == len(du), (name, len(sp), len(du))
    assert sorted(sp.columns) == sorted(du.columns), name
    assert canonical_hash(sp) == canonical_hash(du), name
print("DRIVER-SIM-OK")
"""


def test_contract_under_plain_driver_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, REPO_ROOT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "DRIVER-SIM-OK" in proc.stdout, proc.stdout[-2000:] + proc.stderr[-2000:]


def test_cli_list_and_run(tmp_path):
    """python -m flink_stream_spark: list names the registry; run
    executes a query against an explicit sf_dir (subprocess — the same
    cold-entry path an end user takes)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo}
    out = subprocess.run(
        [sys.executable, "-m", "flink_stream_spark", "list", "dedup"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=120,
    )
    assert out.returncode == 0 and "dedup_exact_hash" in out.stdout
    out = subprocess.run(
        [sys.executable, "-m", "flink_stream_spark", "run",
         "dedup_exact_hash", "/root/testdata/sf0.001", "-n", "3"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    assert out.returncode == 0 and "content_hash" in out.stdout
