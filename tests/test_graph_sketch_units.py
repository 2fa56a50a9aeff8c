"""Independent cross-checks for the round-7 additions beyond oracle
parity: the triangle count is validated against a brute-force
DIFFERENTLY-FORMULATED enumeration (no degree orientation — ordered
id triples), and the KMV sketch's estimate is checked against its own
exact twin within the sketch's theoretical error bound."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__  # noqa: F401 — populates the full registry

from flink_stream_spark.operators.misc import KMV_K
from flink_stream_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
    )
    return con


def test_triangle_count_matches_bruteforce(spark):
    """The degree-oriented join must count exactly what a naive
    ordered-triple enumeration counts (u < v < w, all three edges
    present) — a formulation that never builds the orientation."""
    got = {
        r["n_triangles"]
        for r in REGISTRY["graph_triangle_count"].build(spark, SF).collect()
    }
    con = _duck()
    brute = con.sql(
        """
        WITH pairs AS (
          SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
          FROM lineitem l1 JOIN lineitem l2
            ON l1.l_orderkey = l2.l_orderkey
           AND l1.l_partkey < l2.l_partkey)
        SELECT COUNT(*) FROM pairs e1
        JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v
        """
    ).fetchone()[0]
    assert got == {brute}
    assert brute > 0  # the co-order graph genuinely has triangles


def test_kmv_estimate_within_bound(spark):
    """KMV relative standard error is ~1/sqrt(K-2); assert every
    group's estimate (including the merged '*ALL*' rollup) is within
    5 sigma of its exact twin — and exact when the group has < K
    distinct elements."""
    rows = REGISTRY["agg_kmv_distinct_sketch"].build(spark, SF).collect()
    assert {r["group_key"] for r in rows} >= {"*ALL*"}
    rse = (KMV_K - 2) ** -0.5
    for r in rows:
        exact, est = r["exact_distinct"], r["est_distinct"]
        if exact < KMV_K:
            assert est == exact, r
        else:
            assert abs(est - exact) <= 5 * rse * exact, r


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_kmv_merged_rollup_consistency(spark, sf):
    """Mergeability sanity: the '*ALL*' estimate must be >= every
    per-group estimate's implied floor (a union can't be smaller than
    its largest part by more than sketch noise) and the exact twin is
    monotone by construction."""
    rows = {
        r["group_key"]: r
        for r in REGISTRY["agg_kmv_distinct_sketch"].build(spark, sf).collect()
    }
    all_row = rows.pop("*ALL*")
    assert all_row["exact_distinct"] == max(
        r["exact_distinct"] for r in rows.values()
    ) or all_row["exact_distinct"] >= max(
        r["exact_distinct"] for r in rows.values()
    )
    rse = (KMV_K - 2) ** -0.5
    floor = max(r["est_distinct"] for r in rows.values())
    assert all_row["est_distinct"] >= floor * (1 - 5 * rse)


def test_kmv_set_ops_bounds(spark):
    """Union/intersection estimates within KMV error bounds of their
    exact twins; inclusion-exclusion sanity on the estimates."""
    rows = {
        r["op"]: r
        for r in REGISTRY["agg_kmv_set_ops"].build(spark, SF).collect()
    }
    assert set(rows) == {"a_1996", "b_1997", "union", "intersect"}
    rse = (KMV_K - 2) ** -0.5
    for op in ("a_1996", "b_1997", "union"):
        exact, est = rows[op]["exact_distinct"], rows[op]["est_distinct"]
        if exact < KMV_K:
            assert est == exact, rows[op]
        else:
            assert abs(est - exact) <= 5 * rse * exact, rows[op]
    # intersection error compounds (both thetas + the match count);
    # allow a wider additive band scaled by the union size
    xi, ei = rows["intersect"]["exact_distinct"], rows["intersect"]["est_distinct"]
    assert abs(ei - xi) <= 5 * rse * rows["union"]["exact_distinct"] + 2
    # the estimates themselves must satisfy |A| + |B| >= |A∪B| >= max
    ea, eb, eu = (rows[k]["est_distinct"] for k in ("a_1996", "b_1997", "union"))
    assert eu <= ea + eb + 2
    assert eu + 2 >= max(ea, eb)
