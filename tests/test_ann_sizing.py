"""Corpus-adaptive ANN sizing rules: one scalar COUNT(*) drives
NLIST, NPROBE, and the LSH plane count, and the DuckDB oracle derives
the SAME value from the same count — these tests pin the Python/SQL
parity across the tier boundaries the fixture scales never cross."""

from __future__ import annotations

import duckdb
import pytest

from flink_stream_spark.operators.similarity import (
    LSH_TARGET_BUCKET,
    N_PLANES_MIN,
    NLIST_MIN,
    NPROBE_MIN,
    ivf_nlist,
    ivf_nprobe,
    lsh_num_planes,
)


def test_ivf_nlist_floor_and_sqrt():
    assert ivf_nlist(1) == NLIST_MIN
    assert ivf_nlist(256) == 16
    assert ivf_nlist(500) == 22
    assert ivf_nlist(2000) == 44
    assert ivf_nlist(20000) == 141
    assert ivf_nlist(10**12) == 10**6  # 100 TB-ish corpus: 1M lists


def test_ivf_nprobe_adaptive():
    # below the wire: the historical constant 2 at every fixture scale
    assert ivf_nprobe(ivf_nlist(500)) == NPROBE_MIN  # sf0.001/sf0.01
    assert ivf_nprobe(ivf_nlist(2000)) == NPROBE_MIN  # sf0.1
    # grows as nlist^(1/2): sf1/sf3-scale corpora probe deeper
    assert ivf_nprobe(64) == 2
    assert ivf_nprobe(65) == 3
    assert ivf_nprobe(141) == 3
    assert ivf_nprobe(144) == 3
    assert ivf_nprobe(145) == 4
    assert ivf_nprobe(244) == 4
    assert ivf_nprobe(10**6) == 250  # probed fraction 250/1M = 0.025%


def test_lsh_num_planes_boundary():
    # every fixture scale sits below 2^18 vectors -> the historical 12
    assert lsh_num_planes(1) == N_PLANES_MIN
    assert lsh_num_planes(500) == N_PLANES_MIN
    assert lsh_num_planes(2000) == N_PLANES_MIN
    assert lsh_num_planes(2**18) == 12  # exactly at the boundary
    assert lsh_num_planes(2**18 + 1) == 13  # first adaptive value
    assert lsh_num_planes(2**20) == 14
    # expected bucket population stays ~LSH_TARGET_BUCKET
    n = 10**9
    p = lsh_num_planes(n)
    assert n / 2**p <= LSH_TARGET_BUCKET < 2 * n / 2 ** (p - 1)


@pytest.mark.parametrize(
    "n", [1, 63, 64, 65, 500, 2000, 4096, 2**18, 2**18 + 1, 2**20, 10**7]
)
def test_lsh_planes_duckdb_parity(n):
    """The oracle's scalar expression and the Python rule agree at and
    around every boundary (no float-divergence window: /64.0 is exact,
    ceil(log2) boundaries only at exact powers of two)."""
    got = duckdb.sql(
        f"SELECT GREATEST({N_PLANES_MIN}, "
        f"CAST(CEIL(LOG2({n} / {LSH_TARGET_BUCKET}.0)) AS BIGINT))"
    ).fetchone()[0]
    assert got == lsh_num_planes(n), n


@pytest.mark.parametrize("nlist", [16, 22, 44, 63, 64, 65, 141, 144, 145, 244, 10**6])
def test_ivf_nprobe_duckdb_parity(nlist):
    got = duckdb.sql(
        f"SELECT GREATEST({NPROBE_MIN}, "
        f"CAST(CEIL(SQRT(CAST({nlist} AS DOUBLE)) / 4) AS BIGINT))"
    ).fetchone()[0]
    assert got == ivf_nprobe(nlist), nlist


@pytest.mark.parametrize("n", [1, 255, 256, 257, 500, 2000, 20000, 10**8])
def test_ivf_nlist_duckdb_parity(n):
    got = duckdb.sql(
        f"SELECT GREATEST({NLIST_MIN}, CAST(FLOOR(SQRT({n})) AS BIGINT))"
    ).fetchone()[0]
    assert got == ivf_nlist(n), n
