"""Recall-DISCRIMINATING clustered embedding fixture for ANN policy
measurement.

The round-6 verdict's #3: the synthetic ``embeddings`` table is so
well-separated that IVF recall@5 is 1.000 under every probe policy at
every scale — the curve cannot distinguish a good serving policy from
a bad one, so the adaptive-NPROBE rule shipped on an analytic argument
alone. This fixture plants the hard case on purpose:

Why the old fixture can never discriminate: the IVF implementation
seeds its inverted lists with the first sqrt(n) vectors, and the
query set (vec_id < N_QUERIES) is inside that prefix — so each query
IS a seed, its planted neighborhood assigns to its OWN list (cosine
~0.99 to the query-seed vs <=~0.75 to any other seed), and probe #1
always contains the whole answer. Recall saturates structurally, for
any probe policy. The hard case therefore needs the true neighbors to
belong to lists the query does NOT seed:

- each query's true-neighbor cloud sits around an OFFSET point h
  (distance ``delta`` from the query), radius ``eps``;
- ``TRAPS_PER_QUERY`` decoy seeds sit around the same h at radius
  ``r_trap`` with eps < r_trap < delta, placed INSIDE the seed prefix:
  every true neighbor is closer to some trap than to the query-seed
  (cos ~0.97 vs ~0.94), so the cloud SPLITS across the traps' lists;
- the query's probe ranking is [own list, then the traps in noise
  order, then background]: probing p lists reaches ~p-1 of the traps,
  so measured recall rises with nprobe instead of pinning at 1 —
  exactly the lever the adaptive rule turns;
- background: points at radius 0.25 around ``n/64`` random unit
  centers (cluster structure like real corpora), nowhere near the
  planted clouds (cos <= ~0.75).

Written as a normal ``embeddings`` parquet (vec_id, embedding
list<float>, label) so every registered similarity query runs on it
unchanged via its ``sf_dir`` argument. Row order is constructed:
queries (the registry contract), traps, background fill for the rest
of the seed prefix (planted rows must NOT become seeds — a planted
seed would steal its own cloud back into a probed-early list), then
the shuffled remainder.
"""

from __future__ import annotations

import os

import numpy as np

from flink_stream_spark.operators.similarity import N_QUERIES


TRAPS_PER_QUERY = 3


def make_clustered_embeddings(
    n: int,
    dim: int = 64,
    plant: int = 8,
    eps: float = 0.15,
    delta: float = 0.3,
    r_trap: float = 0.2,
    seed: int = 7,
) -> "np.ndarray":
    """(n, dim) float32 rows; rows 0..N_QUERIES-1 are the queries,
    rows N_QUERIES..N_QUERIES+5*TRAPS_PER_QUERY-1 the decoy seeds,
    the rest background fill + shuffled (planted ∪ background).
    Geometry (eps < r_trap < delta): true neighbors at eps around the
    offset point h; traps at r_trap around h beat the query-seed for
    every neighbor (p-trap distance ~sqrt(eps²+r_trap²)=0.25 <
    p-query distance ~sqrt(eps²+delta²)=0.34) while the neighbors
    still outrank the traps in the query's exact top-k (cos(q,p)~0.944
    > cos(q,trap)~0.935 > background ~0.75)."""
    rng = np.random.default_rng(seed)

    def unit(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    def ball(center, radius, k):
        """k points at RADIUS ``radius`` around a unit vector (noise
        norm controlled, not per-coordinate sigma: a sigma-s gaussian
        in 64-d has norm ~8s, which would swamp the geometry)."""
        g = rng.normal(size=(k, dim))
        return unit(center[None, :] + radius * unit(g))

    import math

    nlist = max(16, int(math.floor(math.sqrt(n))))
    n_traps = N_QUERIES * TRAPS_PER_QUERY
    if nlist < N_QUERIES + n_traps:
        raise ValueError(f"n={n} too small: seed prefix cannot hold the traps")
    ncl = max(8, n // 64)
    centers = unit(rng.normal(size=(ncl, dim)))
    queries, traps, planted = [], [], []
    for _ in range(N_QUERIES):
        picks = rng.choice(ncl, size=3, replace=False)
        w = rng.dirichlet(np.ones(3))
        q = unit((w[:, None] * centers[picks]).sum(axis=0))
        h = ball(q, delta, 1)[0]
        queries.append(q)
        traps.append(ball(h, r_trap, TRAPS_PER_QUERY))
        planted.append(ball(h, eps, plant))
    n_fill = nlist - N_QUERIES - n_traps  # seed prefix: background only
    n_bg = n - N_QUERIES - n_traps - N_QUERIES * plant
    assign = rng.integers(0, ncl, size=n_bg)
    bg = unit(centers[assign] + 0.25 * unit(rng.normal(size=(n_bg, dim))))
    rest = np.concatenate([np.concatenate(planted), bg[n_fill:]])
    rng.shuffle(rest)
    return np.concatenate(
        [np.stack(queries), np.concatenate(traps), bg[:n_fill], rest]
    ).astype(np.float32)


def write_embeddings_fixture(
    path: str, n: int, dim: int = 64, plant: int = 8,
    eps: float = 0.15, seed: int = 7,
) -> str:
    """Write the fixture as ``<path>/embeddings.parquet`` (the
    registered queries' table layout) and return ``path``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    X = make_clustered_embeddings(n, dim=dim, plant=plant, eps=eps, seed=seed)
    os.makedirs(path, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in X], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(path, "embeddings.parquet"))
    return path
