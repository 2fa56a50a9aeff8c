#!/usr/bin/env python
"""Synthesize a larger benchmark scale from an existing fixture SF.

The driver provides parquet at sf{0.001,0.01,0.1}; every headline
query is sub-second at sf0.1, so timing deltas there are fixed-overhead
noise. This tool replicates the sf0.1 FACT tables ``factor``× with
disjoint key spaces (dims region/nation stay single — their keys are
referenced unshifted, so the join graph and per-replica cardinality
ratios are preserved), giving a dataset whose per-query work is
``factor``× — enough signal for plan-regression detection.

Replica r shifts every fact key by r·10^10 (int64-safe). Document text
gets a per-replica suffix token so replicas are NEAR-duplicates, not
exact ones: dedup stages see realistic bounded clusters (≤ factor
docs) instead of degenerate exact-hash collapse; embeddings keep their
vectors (ties are deterministic downstream).

Output: one parquet file per table with 100k-row row-groups, so Spark
splits scans by byte range instead of serializing on a single
row-group (the sf fixtures are single-group — see PLANS.md).

Usage: python tools/make_scaled_data.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 10_000_000_000

# table -> columns shifted by replica * STRIDE
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def scale(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)"
        )
        print(t, "copied")
    for t, keys in SHIFT.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"({c} + r.r * {STRIDE})::BIGINT AS {c}")
            elif t == "documents" and c == "text":
                # near-duplicate, never exact-duplicate, replicas
                sel.append("(text || ' rep' || r.r || 'tok') AS text")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{src}/{t}.parquet'), "
            f"(SELECT unnest(range({factor})) AS r) r "
            f"ORDER BY r.r) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_data/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, out, factor)
