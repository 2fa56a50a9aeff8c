"""Every registered query must hash-match its DuckDB oracle at sf0.001.

This is the local mirror of the driver's CORRECTNESS gate (which runs
at sf0.01); sf0.001 keeps the suite fast while exercising identical
semantics. The sf0.01 run is either SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
on this file, or SPARK_GRAFT_NIGHTLY=1 on tests/test_oracle_sf001.py;
green runs are logged in PLANS.md under "Full-registry gate runs".
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from flink_stream_spark.operators import REGISTRY
from flink_stream_spark.testing import compare_query

TEST_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, name):
    spec = REGISTRY[name]
    df = spec.build(spark, TEST_SF)
    res = compare_query(name, df, spec.oracle, TEST_SF)
    assert res.rows_match, f"{name}: rows {res.spark_rows} vs {res.duck_rows}"
    assert res.cols_match, f"{name}: cols {res.spark_cols} vs {res.duck_cols}"
    assert res.hash_match, f"{name}: {res.detail}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_contract_shapes():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(os_) <= set(qs)
