"""Stupid-backoff semantics pinned against a hand-computed example
(the oracle proves Spark==DuckDB; this proves both mean what Brants
2007 says), plus a fixture probe that the backoff branch is actually
exercised by the sf0.001 data (an all-seen corpus would make the
backoff dead code, like the unigram query's self-scoring)."""

from __future__ import annotations

import math

from flink_stream_spark.operators.text_rank import BACKOFF_INV


def _score(tokens, lm_tokens):
    """Reference implementation: per-token nll list for one doc."""
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    for doc in lm_tokens:
        for i, w in enumerate(doc):
            uni[w] = uni.get(w, 0) + 1
            if i > 0:
                big[(doc[i - 1], w)] = big.get((doc[i - 1], w), 0) + 1
                ctx[doc[i - 1]] = ctx.get(doc[i - 1], 0) + 1
    t = sum(uni.values())
    out = []
    for i, w in enumerate(tokens):
        if i == 0:
            out.append(math.log(t / max(uni.get(w, 0), 1)))
        elif (tokens[i - 1], w) in big:
            out.append(math.log(ctx[tokens[i - 1]] / big[(tokens[i - 1], w)]))
        else:
            out.append(math.log(BACKOFF_INV * t / max(uni.get(w, 0), 1)))
    return out


def test_hand_computed_example(spark, tmp_path):
    lm_docs = [["a", "b", "a", "c"], ["b", "a", "b", "b"]]
    probe = ["a", "b", "x", "a", "c"]
    rows = [
        (0, " ".join(lm_docs[0]), "en", "src0", 7),
        (1, " ".join(lm_docs[1]), "en", "src1", 7),
        (2, " ".join(probe), "en", "src10", 9),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from flink_stream_spark.operators.text_rank import text_bigram_logppl

    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_micro_total"])
        for r in text_bigram_logppl(spark, str(tmp_path)).collect()
    }
    for doc_id, toks in [(0, lm_docs[0]), (1, lm_docs[1]), (2, probe)]:
        want = sum(
            int(math.floor(v * 1e6 + 0.5)) for v in _score(toks, lm_docs)
        )
        assert got[doc_id] == (len(toks), want), (doc_id, got[doc_id], want)
    # the probe doc exercises all three branches: first-token unigram,
    # seen bigram ('a b' occurs in the LM), unseen bigram ('b x' with
    # 'x' OOV -> the 2.5x backoff with the c=1 floor)
    branches = _score(probe, lm_docs)
    assert branches[2] == math.log(BACKOFF_INV * 8 / 1)  # OOV floor


def test_backoff_fires_on_fixture(spark):
    """At sf0.001 the new-batch sources must contain bigrams unseen in
    the src0..src9 LM — otherwise the held-out split is meaningless."""
    from pyspark.sql import functions as F

    from flink_stream_spark.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    )
    from pyspark.sql.window import Window as W

    seq = toks.withColumn(
        "prev", F.lag("term").over(W.partitionBy("doc_id").orderBy("pos"))
    ).filter(F.col("prev").isNotNull())
    is_lm = F.substring("source", 4, 10).cast("int") < 10
    lm_bigrams = seq.filter(is_lm).select("prev", "term").distinct()
    unseen = (
        seq.filter(~is_lm)
        .join(lm_bigrams, ["prev", "term"], "left_anti")
        .count()
    )
    assert unseen > 0, "backoff branch is dead on the fixture"
