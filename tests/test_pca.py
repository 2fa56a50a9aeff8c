"""Distributed exact covariance / PCA vs a single-process numpy oracle.

embedding_covariance_exact is hash-gated against DuckDB; these check
the parts the SQL oracle can't reach — that the distributed moment
combination equals numpy's covariance bit-for-bit-in-float64 on the
same int-scaled data, and that the PCA projection reproduces a local
eigh with the same sign convention.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from flink_stream_spark.operators import REGISTRY
import flink_stream_spark.operators.similarity  # noqa: F401
from flink_stream_spark.operators.similarity import DIM, PCA_K, PCA_SCALE


def _local_scaled_matrix(sf):
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())
    x = np.stack(t["embedding"].to_numpy(zero_copy_only=False))[order]
    return np.trunc(x.astype("float64") * PCA_SCALE).astype("int64")


def _local_cov(xi):
    n = xi.shape[0]
    # exact integer moments, float division last — mirrors the operator
    sxy = (xi.T.astype(object) @ xi.astype(object)).astype(object)
    sx = xi.sum(axis=0, dtype=object)
    cov = np.empty((DIM, DIM))
    for i in range(DIM):
        for j in range(DIM):
            cov[i, j] = float(n * sxy[i, j] - sx[i] * sx[j]) / (
                float(n) * n * PCA_SCALE * PCA_SCALE
            )
    return cov


def test_covariance_matches_numpy_exactly(spark, sf_small):
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in REGISTRY["embedding_covariance_exact"].build(spark, sf_small).collect()
    }
    cov = _local_cov(_local_scaled_matrix(sf_small))
    assert len(got) == DIM * (DIM + 1) // 2
    for (i, j), v in got.items():
        assert abs(v - round(cov[i, j], 6)) < 1e-12, (i, j, v, cov[i, j])


def test_pca_projection_matches_local_eigh(spark, sf_small):
    xi = _local_scaled_matrix(sf_small)
    x = xi.astype("float64") / PCA_SCALE
    mean = x.mean(axis=0)
    # _local_cov returns (n*sxy - sx*sy)/n^2 = E[xy] - E[x]E[y]: already
    # the centered covariance the operator eigendecomposes
    vals, vecs = np.linalg.eigh(_local_cov(xi))
    order = np.argsort(vals)[::-1][:PCA_K]
    comps = vecs[:, order]
    for k in range(PCA_K):
        m = np.argmax(np.abs(comps[:, k]))
        if comps[m, k] < 0:
            comps[:, k] = -comps[:, k]
    want = np.round((x - mean) @ comps, 6)

    rows = REGISTRY["embedding_pca_project"].build(spark, sf_small).collect()
    got = np.stack([np.array(r["proj"]) for r in sorted(rows, key=lambda r: r["vec_id"])])
    assert got.shape == (x.shape[0], PCA_K)
    # eigh in the same process on the same exact matrix: only the final
    # rounding can differ by one ulp across BLAS builds
    assert np.max(np.abs(got - want)) <= 1e-5
