"""dedup_jaccard_prefix_filter: completeness properties.

The registry oracle proves Spark == DuckDB, but both share the prefix
logic — so these tests pin the CLAIM the operator exists to make:
prefix filtering nominates EVERY pair with Jaccard >= tau (the recall
dedup_ngram_jaccard's df-capped blocking explicitly gives up).
"""

from __future__ import annotations

import itertools
import os

import numpy as np
import pytest

from flink_stream_spark.operators import REGISTRY
import flink_stream_spark.operators.dedup  # noqa: F401
from flink_stream_spark.operators.dedup import (
    BLOCK_DF_CAP,
    JPF_TAU_DEN,
    JPF_TAU_NUM,
)

SF = "/root/testdata/sf0.001"


def _shingles(text: str) -> set:
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
    }


def _brute_pairs(docs: dict[int, str]) -> dict[tuple, tuple]:
    sh = {k: _shingles(v) for k, v in docs.items()}
    out = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        if not sh[a] or not sh[b]:
            continue
        shared = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if JPF_TAU_DEN * shared >= JPF_TAU_NUM * union:
            out[(a, b)] = (shared, union)
    return out


def _run(spark, sf_dir: str) -> dict[tuple, tuple]:
    df = REGISTRY["dedup_jaccard_prefix_filter"].build(spark, sf_dir)
    return {
        (r["doc_a"], r["doc_b"]): (r["shared"], r["union_n"])
        for r in df.collect()
    }


def test_matches_brute_force_on_fixture_corpus(spark):
    import duckdb

    docs = {
        int(i): t
        for i, t in duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    }
    assert _run(spark, SF) == _brute_pairs(docs)


def test_hot_shingle_cluster_recovered(spark, tmp_path):
    """A near-dup cluster larger than BLOCK_DF_CAP makes every shared
    shingle hot, so the df-capped family scores NONE of its pairs (its
    documented recall bound). The prefix filter must score all of
    them — ordering beats dropping."""
    n = BLOCK_DF_CAP + 6
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = {i: base for i in range(n)}
    # plus some unrelated noise docs
    rng = np.random.RandomState(5)
    for i in range(n, n + 10):
        docs[i] = " ".join(
            "w%d" % w for w in rng.randint(0, 5000, size=30)
        )
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(k, v) for k, v in sorted(docs.items())], "doc_id bigint, text string"
    ).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    got = _run(spark, sf_dir)
    want = _brute_pairs(docs)
    assert len(want) >= n * (n - 1) // 2  # the full hot cluster
    assert got == want

    # and the df-capped family indeed misses the hot cluster — the gap
    # this operator closes is real, not hypothetical
    capped = REGISTRY["dedup_ngram_jaccard"].build(spark, sf_dir)
    capped_pairs = {
        (r["doc_a"], r["doc_b"]) for r in capped.collect()
    }
    hot_pairs = {
        (a, b) for (a, b) in want if a < n and b < n
    }
    assert not (capped_pairs & hot_pairs)


def test_replicated_corpus_expansion(spark, tmp_path):
    """The exact-dup-collapse path: many byte-identical replicas per
    distinct text (the shape of the scaled probe corpora and of real
    crawls) — rep-level verdicts must expand to EVERY member pair,
    within-group (J=1) and cross-group (near-dup texts) alike."""
    rng = np.random.RandomState(11)
    base = ["w%d" % w for w in rng.randint(0, 400, size=40)]
    texts = [" ".join(base)]
    # near-dup variants of the base (small suffix edits: J >= 0.6)
    for k in (1, 2):
        texts.append(" ".join(base[:-k] + ["z%d" % k]))
    # unrelated texts
    for k in range(4):
        texts.append(
            " ".join("u%d_%d" % (k, w) for w in rng.randint(0, 400, 30))
        )
    # a group with too-short text (zero shingles): never paired
    texts.append("tiny doc")
    docs = {}
    i = 0
    for t in texts:
        for _ in range(5):  # 5 replicas each
            docs[i] = t
            i += 1
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(k, v) for k, v in sorted(docs.items())], "doc_id bigint, text string"
    ).write.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = _run(spark, sf_dir)
    want = _brute_pairs(docs)
    # sanity on the shape: the base group pairs with both variants
    assert any(
        docs[a] != docs[b] for (a, b) in want
    ), "fixture must contain cross-group qualifying pairs"
    assert got == want


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 10, 50, 101])
def test_prefix_length_formula(n):
    # n - ceil(tau*n) + 1 must stay in [1, n]: every non-empty set has
    # a non-empty prefix, never longer than the set
    import math

    L = n - math.ceil(JPF_TAU_NUM * n / JPF_TAU_DEN) + 1
    L_int = n - (JPF_TAU_NUM * n + JPF_TAU_DEN - 1) // JPF_TAU_DEN + 1
    assert L == L_int
    assert 1 <= L <= n
