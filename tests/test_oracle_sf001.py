"""Nightly/manual full-registry oracle gate at sf0.01 — the driver's
CORRECTNESS scale (tests/test_registry_oracle.py runs the identical
parametrized gate at sf0.001 on every suite run).

Opt-in because 174 queries at sf0.01 take ~15 min: run with

    SPARK_GRAFT_NIGHTLY=1 python -m pytest tests/test_oracle_sf001.py

(equivalently: SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 on
test_registry_oracle.py). Latest committed green runs are recorded in
PLANS.md under "Full-registry gate runs".
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__  # noqa: F401  — imports populate the registry
from flink_stream_spark.operators import REGISTRY
from flink_stream_spark.testing import compare_query

assert len(REGISTRY) > 100, "registry import failed — gate would be vacuous"

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_NIGHTLY"),
    reason="sf0.01 full gate is nightly/manual: set SPARK_GRAFT_NIGHTLY=1",
)

SF001 = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle_sf001(spark, name):
    spec = REGISTRY[name]
    res = compare_query(name, spec.build(spark, SF001), spec.oracle, SF001)
    assert res.rows_match, f"{name}: rows {res.spark_rows} vs {res.duck_rows}"
    assert res.cols_match, f"{name}: cols {res.spark_cols} vs {res.duck_cols}"
    assert res.hash_match, f"{name}: {res.detail}"
