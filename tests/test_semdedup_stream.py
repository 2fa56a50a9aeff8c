"""Incremental streaming SemDeDup parity: an embedding stream replayed
through the per-cluster kept-vector index must flag exactly what a
greedy keep-first pass over the cluster-blocked exact-cosine pair
graph flags — independent of micro-batch boundaries — with the index
holding exactly the kept vectors, and cluster blocking honored (a
tau-similar pair in DIFFERENT clusters is not flagged, matching the
batch kernel's SemDeDup semantics)."""

from __future__ import annotations

import os

import numpy as np

from flink_stream_spark.operators.similarity import SEMDEDUP_TAU
from flink_stream_spark.streaming.semdedup_stream import (
    start_incremental_semdedup,
)
from flink_stream_spark.tables.managed import Warehouse

DIM = 64
K = 8


def _centroids():
    """Pinned centroid model: 0.1 * e_k for k < 8, scaled-int64."""
    cent_ids = np.arange(K, dtype="int64")
    C = np.zeros((K, DIM), dtype="int64")
    for k in range(K):
        C[k, k] = 100_000  # trunc(0.1 * 1e6)
    return cent_ids, C


def _corpus() -> list[tuple[int, list[float]]]:
    """Vectors built so cluster membership and pair structure are
    exact by construction (see inline cosines):

    - 16 base vectors, two per cluster k: 0.05*e_k + 0.2*e_(8+j) with
      distinct free dims j — same cluster, pairwise cos ~= 0.059 < tau.
    - one near-dup per base (id 200+i): the base plus 0.001 on its
      free dim — cos ~= 0.9999, same cluster, lands in a LATER batch.
    - a cross-cluster similar pair (ids 300, 301): 0.05*e_0 + 0.2*e_30
      vs 0.05*e_1 + 0.2*e_30 — cos ~= 0.94 > tau but different
      clusters, so SemDeDup must NOT flag it.
    - a within-batch chain (ids 310 < 311 < 312): a~b, b~c, a!~c —
      greedy keep-first keeps a AND c, drops only b.
    """
    docs: list[tuple[int, list[float]]] = []
    base_vecs = {}
    for i in range(16):
        k = i % K
        v = np.zeros(DIM, dtype="float64")
        v[k] = 0.05
        v[8 + i] = 0.2
        base_vecs[i] = v
        docs.append((i, v.tolist()))
    for i in range(16):
        v = base_vecs[i].copy()
        v[8 + i] += 0.001
        docs.append((200 + i, v.tolist()))
    va = np.zeros(DIM)
    va[0] = 0.05
    va[30] = 0.2
    vb = np.zeros(DIM)
    vb[1] = 0.05
    vb[30] = 0.2
    docs.append((300, va.tolist()))
    docs.append((301, vb.tolist()))
    a = np.zeros(DIM)
    a[2] = 0.05
    a[40] = 0.2
    b = np.zeros(DIM)
    b[2] = 0.05
    b[40] = 0.15
    b[41] = 0.15
    c = np.zeros(DIM)
    c[2] = 0.05
    c[41] = 0.2
    docs.append((310, a.tolist()))
    docs.append((311, b.tolist()))
    docs.append((312, c.tolist()))
    return docs


def _reference(docs, cent_ids, C):
    """Driver-side reference: identical scaled-int arithmetic (float32
    storage -> float64 -> trunc x1e6 int64), argmin assignment with the
    same (score, cent_id) tie rule, cluster-blocked exact cosine, greedy
    keep-first in vec_id order."""
    ids = np.array([d for d, _ in docs], dtype="int64")
    X = np.trunc(
        np.stack([np.asarray(v, dtype="float32") for _, v in docs]).astype(
            "float64"
        )
        * 1e6
    ).astype("int64")
    score = (C * C).sum(axis=1)[None, :] - 2 * (X @ C.T)
    cl = cent_ids[np.argmin(score, axis=1)]
    nrm = np.sqrt((X * X).sum(axis=1).astype("float64"))
    order = np.argsort(ids)
    kept, dup_of, clusters = set(), {}, {}
    for pos in order:
        i, ci = ids[pos], cl[pos]
        cands = []
        for pos2 in order:
            j = ids[pos2]
            if j >= i or cl[pos2] != ci or j not in kept:
                continue
            cos = float(X[pos] @ X[pos2]) / (nrm[pos] * nrm[pos2])
            if cos >= SEMDEDUP_TAU:
                cands.append(j)
        if cands:
            dup_of[int(i)] = int(min(cands))
        else:
            kept.add(int(i))
        clusters[int(i)] = int(ci)
    return kept, dup_of, clusters


def _write_stream_files(docs, src, n_files=3) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = sorted(docs)
    per = (len(docs) + n_files - 1) // n_files
    for i in range(n_files):
        part = docs[i * per : (i + 1) * per]
        if not part:
            continue
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in part], pa.int64()),
                "payload": pa.array(
                    [np.asarray(v, dtype="float32") for _, v in part],
                    pa.list_(pa.float32()),
                ),
            }
        ).rename_columns(["vec_id", "embedding"])
        fpath = str(src / f"batch_{i:03d}.parquet")
        pq.write_table(tbl, fpath)
        os.utime(fpath, (1_700_000_000 + i, 1_700_000_000 + i))


def _run_stream(spark, tmp_path, src, tag):
    cent_ids, C = _centroids()
    wh = Warehouse(str(tmp_path / f"wh_{tag}"))
    index = wh.table("sem_index")
    flags = wh.table("sem_flags")
    q = start_incremental_semdedup(
        spark,
        str(src),
        cent_ids,
        C,
        index,
        flags,
        str(tmp_path / f"ckpt_{tag}"),
    )
    q.processAllAvailable()
    q.stop()
    return index, flags


def test_incremental_semdedup_matches_greedy_reference(spark, tmp_path):
    docs = _corpus()
    src = tmp_path / "sem_src"
    src.mkdir()
    _write_stream_files(docs, src)
    index, flags = _run_stream(spark, tmp_path, src, "par")

    cent_ids, C = _centroids()
    kept_ref, dup_of_ref, clusters = _reference(docs, cent_ids, C)

    rows = flags.read(spark).collect()
    got_dups = {r["doc_id"]: r["dup_of"] for r in rows if r["is_dup"]}
    got_kept = {r["doc_id"] for r in rows if not r["is_dup"]}
    assert got_dups == dup_of_ref
    assert got_kept == kept_ref

    # every planted near-dup (200+i) was caught against its base,
    # which lives in an EARLIER micro-batch
    assert all(200 + i in got_dups for i in range(16))
    assert all(got_dups[200 + i] == i for i in range(16))

    # cluster blocking: the cross-cluster tau-similar pair is NOT
    # flagged (both kept), and the reference agrees they differ
    assert clusters[300] != clusters[301]
    assert 300 in got_kept and 301 in got_kept

    # greedy chain: keep a, drop b, keep c
    assert 310 in got_kept and 312 in got_kept
    assert got_dups.get(311) == 310

    # bounded index: exactly one row per KEPT vector, cluster key stored
    idx_rows = index.read(spark).select("vec_id", "cl").collect()
    assert {r["vec_id"] for r in idx_rows} == kept_ref
    assert len(idx_rows) == len(kept_ref)
    assert all(clusters[r["vec_id"]] == r["cl"] for r in idx_rows)


def test_semdedup_stream_boundary_independence(spark, tmp_path):
    docs = _corpus()
    src1 = tmp_path / "sem_one"
    src1.mkdir()
    _write_stream_files(docs, src1, n_files=1)
    _, flags1 = _run_stream(spark, tmp_path, src1, "one")

    src5 = tmp_path / "sem_five"
    src5.mkdir()
    _write_stream_files(docs, src5, n_files=5)
    _, flags5 = _run_stream(spark, tmp_path, src5, "five")

    one = {
        (r["doc_id"], r["dup_of"], r["is_dup"])
        for r in flags1.read(spark).collect()
    }
    five = {
        (r["doc_id"], r["dup_of"], r["is_dup"])
        for r in flags5.read(spark).collect()
    }
    assert one == five
