"""Crafted-corpus semantics for the round-4 curation operators.

The registry oracle gate checks dedup_exact_substr_spans /
quality_gopher_rules / dedup_incremental_new_batch end-to-end against
DuckDB on the fixtures; these plant corpora with KNOWN span layouts,
rule violations, and cross-batch duplicates, where the expected
numbers are hand-computable.
"""

from __future__ import annotations

from flink_stream_spark.operators import REGISTRY
import flink_stream_spark.operators.corpus_ops  # noqa: F401
import flink_stream_spark.operators.dedup  # noqa: F401
import flink_stream_spark.operators.quality  # noqa: F401
from flink_stream_spark.operators.dedup import K_SPAN


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (text, src) in enumerate(rows, 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _rows(spark, sf, name):
    return {
        r["doc_id"]: r.asDict() for r in REGISTRY[name].build(spark, sf).collect()
    }


def test_exact_substr_single_merged_span(spark, tmp_path):
    assert K_SPAN == 5  # the crafted layouts below assume it
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"  # 8 shared tokens -> 4 dup 5-gram starts
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (shared + " u1 u2 u3 u4 u5", "src0"),  # 13 tokens, dup run at 1..8
            ("v1 v2 v3 v4 v5 " + shared, "src1"),  # dup run at 6..13
        ],
    )
    got = _rows(spark, sf, "dedup_exact_substr_spans")
    for doc_id in (1, 2):
        r = got[doc_id]
        assert r["n_tokens"] == 13
        assert r["dup_positions"] == 4  # starts of the 4 all-shared 5-grams
        assert r["dup_tokens"] == 8  # the merged cover of the shared run
        assert r["n_spans"] == 1
        assert abs(r["dup_frac"] - 8 / 13) < 1e-6


def test_exact_substr_gap_starts_new_span(spark, tmp_path):
    runa, runb = "a1 a2 a3 a4 a5", "b1 b2 b3 b4 b5"
    gap = "g1 g2 g3 g4 g5 g6"  # > K_SPAN unique tokens between the runs
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (f"{runa} {gap} {runb}", "src0"),
            (f"{runa} h1 h2 h3 h4 h5 h6 {runb}", "src1"),
        ],
    )
    got = _rows(spark, sf, "dedup_exact_substr_spans")
    for doc_id in (1, 2):
        r = got[doc_id]
        assert r["dup_positions"] == 2  # one 5-gram per run
        assert r["dup_tokens"] == 10
        assert r["n_spans"] == 2


def test_exact_substr_clean_doc_all_zero(spark, tmp_path):
    sf = _write_documents(
        spark,
        tmp_path,
        [("c1 c2 c3 c4 c5 c6", "src0"), ("d1 d2 d3 d4 d5 d6", "src1")],
    )
    got = _rows(spark, sf, "dedup_exact_substr_spans")
    for r in got.values():
        assert (r["dup_positions"], r["dup_tokens"], r["n_spans"]) == (0, 0, 0)
        assert r["dup_frac"] == 0.0


def test_exact_substr_sub_kspan_run_not_detected(spark, tmp_path):
    """The documented fidelity bound vs Lee et al.'s suffix-array
    method: a duplicated run SHORTER than K_SPAN tokens is invisible
    to the k-gram pass (no K_SPAN-gram fits inside it), while a run of
    exactly K_SPAN shared tokens IS detected with its exact extent."""
    short = "p1 p2 p3 p4"  # K_SPAN - 1 shared tokens
    exact = "q1 q2 q3 q4 q5"  # exactly K_SPAN shared tokens
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (f"{short} x1 x2 x3 x4 x5 x6", "src0"),
            (f"y1 y2 y3 y4 y5 y6 {short}", "src1"),
            (f"{exact} z1 z2 z3 z4 z5 z6", "src2"),
            (f"w1 w2 w3 w4 w5 w6 {exact}", "src3"),
        ],
    )
    got = _rows(spark, sf, "dedup_exact_substr_spans")
    # sub-K_SPAN duplicated run: NOT detected (by construction)
    for doc_id in (1, 2):
        r = got[doc_id]
        assert (r["dup_positions"], r["dup_tokens"], r["n_spans"]) == (0, 0, 0)
    # exactly-K_SPAN duplicated run: detected, exact extent
    for doc_id in (3, 4):
        r = got[doc_id]
        assert r["dup_positions"] == 1
        assert r["dup_tokens"] == K_SPAN
        assert r["n_spans"] == 1


def test_gopher_rules_fail_mask_bits(spark, tmp_path):
    stop = "scan column window order sort agg join group"  # all 8 required
    good = (stop + " tok") * 1  # base that passes stopwords
    # 60 tokens of 4-char words incl >=2 stopwords -> passes everything
    passing = ("scan column " + " ".join(f"wrd{i % 9}" for i in range(58))).strip()
    short = "scan column only ten tokens here words are too few"  # 10 tokens
    no_stop = " ".join(f"tok{i % 7}x" for i in range(60))  # 60 tokens, no stopwords
    long_words = "scan column " + " ".join("x" * 40 for _ in range(58))
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (passing, "src0"),
            (short, "src1"),
            (no_stop, "src2"),
            (long_words, "src3"),
            (good, "src4"),
        ],
    )
    got = _rows(spark, sf, "quality_gopher_rules")
    assert got[1]["gopher_pass"] and got[1]["fail_mask"] == 0
    assert not got[2]["rule_word_count"] and got[2]["fail_mask"] & 1
    assert not got[3]["rule_stopwords"] and got[3]["fail_mask"] & 4
    assert not got[4]["rule_mean_word_len"] and got[4]["fail_mask"] & 2
    # every failed rule appears in the mask and vice versa
    for r in got.values():
        mask = (
            (0 if r["rule_word_count"] else 1)
            + (0 if r["rule_mean_word_len"] else 2)
            + (0 if r["rule_stopwords"] else 4)
            + (0 if r["rule_alpha_frac"] else 8)
            + (0 if r["rule_symbol_ratio"] else 16)
        )
        assert r["fail_mask"] == mask
        assert r["gopher_pass"] == (mask == 0)


def test_incremental_new_batch_planted_duplicates(spark, tmp_path):
    base = " ".join(f"w{i} x{i} y{i}" for i in range(12))  # 36 tokens
    near = base + " tail1 tail2"  # high-Jaccard neighbour of base
    other = " ".join(f"q{i} r{i} s{i}" for i in range(12))
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (base, "src0"),  # index
            (other, "src1"),  # index
            (base, "src15"),  # incoming: exact dup of doc 1
            (near, "src16"),  # incoming: near dup of doc 1
            ("z1 z2 z3 z4 z5 z6 z7 z8 z9", "src17"),  # incoming: clean
        ],
    )
    got = _rows(spark, sf, "dedup_incremental_new_batch")
    assert set(got) == {3, 4, 5}  # only the incoming batch is reported
    assert got[3]["exact_dup"] and got[3]["near_dup"]
    assert got[3]["n_index_candidates"] >= 1
    assert not got[4]["exact_dup"] and got[4]["near_dup"]  # bands collide
    assert not got[5]["exact_dup"] and not got[5]["near_dup"]
    assert got[5]["n_index_candidates"] == 0


def test_curriculum_bins_partition_the_corpus(spark, sf_small):
    rows = REGISTRY["corpus_curriculum_bins"].build(spark, sf_small).collect()
    assert [r["bin"] for r in rows] == [1, 2, 3, 4]
    from flink_stream_spark.catalog import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_small, "documents")
    n_docs = d.count()
    n_tokens = d.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_tokens"] for r in rows) == n_tokens
    # bins are ordered, non-overlapping length ranges
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_tokens"] <= hi["min_tokens"]


def test_bpe_train_invariants(spark, tmp_path):
    # corpus engineered so the merge winners are forced:
    # "b c" appears 4x, "a b" 3x -> round 1 merges b+c everywhere,
    # round 2's corpus then has "a b+c" 3x as the top pair
    rows_in = [
        ("a b c x b c", "src0"),
        ("a b c y b c", "src1"),
        ("a b c z", "src2"),
    ]
    sf = _write_documents(spark, tmp_path, rows_in)
    got = REGISTRY["text_bpe_train"].build(spark, sf).collect()
    assert got[0]["merged_pair"] == "b+c" and got[0]["freq"] == 5
    assert got[1]["merged_pair"] == "a+b+c" and got[1]["freq"] == 3
    # each merge removes exactly `freq` tokens and adds one vocab entry
    # (until a source token disappears entirely from the corpus)
    n0 = sum(len(t.split()) for t, _ in rows_in)
    assert got[0]["corpus_tokens_after"] == n0 - got[0]["freq"]
    assert got[1]["corpus_tokens_after"] == (
        got[0]["corpus_tokens_after"] - got[1]["freq"]
    )


def test_winnowing_guarantee_and_tie_rule(spark, tmp_path):
    """Schleimer's guarantee: every window of WINNOW_W consecutive
    grams contains >= 1 selected fingerprint — checked by recomputing
    the selection locally (rightmost-min rule) on an adversarial
    all-identical-token doc, where EVERY gram hash ties."""
    import hashlib

    import flink_stream_spark.operators.text as text_ops
    from flink_stream_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        _WIN_HMOD,
    )

    docs = [
        ("t t t t t t t t t t t t", "src0"),  # all grams identical: pure ties
        ("a1 b2 c3 d4 e5 f6 g7 h8 i9 j0 k1 l2", "src1"),
    ]
    sf = _write_documents(spark, tmp_path, docs)
    got = _rows(spark, sf, "text_winnowing_fingerprints")

    for doc_id, (textval, _) in enumerate(docs, 1):
        toks = textval.split()
        grams = [
            " ".join(toks[i : i + WINNOW_K])
            for i in range(len(toks) - WINNOW_K + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % _WIN_HMOD
            for g in grams
        ]
        selected = set()
        for e in range(WINNOW_W - 1, len(hs)):
            w = hs[e - WINNOW_W + 1 : e + 1]
            m = min(w)
            # rightmost position attaining the window min
            j = max(k for k in range(len(w)) if w[k] == m) + e - WINNOW_W + 1
            selected.add(j)
        assert got[doc_id]["n_fingerprints"] == len(selected)
        want_hash = hashlib.md5(
            ",".join(str(hs[j]) for j in sorted(selected)).encode()
        ).hexdigest()
        assert got[doc_id]["fingerprint_hash"] == want_hash
    # the all-ties doc selects exactly one gram per window step pattern:
    # rightmost-min of identical values is always the window's last gram
    assert got[1]["n_fingerprints"] == len(
        set(range(WINNOW_W - 1, 12 - WINNOW_K + 1))
    )


def test_dsir_scores_target_like_docs_higher(spark, tmp_path):
    """A raw-pool doc written in the target corpus's bigram
    distribution must outscore a raw-pool doc of novel bigrams."""
    import flink_stream_spark.operators.sampling  # noqa: F401

    target_text = "alpha beta gamma delta " * 5  # sources src0..4 = target
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (target_text.strip(), "src0"),
            (target_text.strip(), "src1"),
            (target_text.strip(), "src10"),  # raw, target-like
            ("zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8", "src11"),  # raw, novel
        ],
    )
    got = _rows(spark, sf, "sample_dsir_importance")
    assert set(got) == {3, 4}  # only the raw pool is scored
    assert got[3]["avg_log_ratio"] > got[4]["avg_log_ratio"]
    assert got[3]["score_micro"] > 0 > got[4]["score_micro"]


def test_suffix_array_detects_sub_kspan_within_doc_repeat(spark, tmp_path):
    """The round-6 suffix-array variant removes the k-gram fidelity
    bound for the within-doc case: a repeated run SHORTER than K_SPAN
    (here 2 tokens) that the k-gram query is blind to is reported
    exactly — length, duplicated starts, and span coverage."""
    sf = _write_documents(
        spark,
        tmp_path,
        [
            # "p1 p2" repeats at positions 1 and 6 (1-based): lrs 2,
            # 2 duplicated starts, 4 covered tokens
            ("p1 p2 x1 x2 x3 p1 p2 x4", "src0"),
            # no repeat of length >= 2, one repeated single token:
            # lrs 1, nothing >= SA_MIN_REP
            ("a b c d a e f g", "src1"),
            # all-distinct control
            ("u1 u2 u3 u4 u5 u6", "src2"),
        ],
    )
    got = _rows(spark, sf, "dedup_exact_substr_sa")
    r1 = got[1]
    assert (r1["lrs_len"], r1["dup_starts"], r1["dup_cover"]) == (2, 2, 4)
    r2 = got[2]
    assert (r2["lrs_len"], r2["dup_starts"], r2["dup_cover"]) == (1, 0, 0)
    r3 = got[3]
    assert (r3["lrs_len"], r3["dup_starts"], r3["dup_cover"]) == (0, 0, 0)
    # the k-gram query (K_SPAN=5) is blind to doc 1's repeat — the
    # exact gap the SA variant closes
    kg = _rows(spark, sf, "dedup_exact_substr_spans")
    assert kg[1]["n_spans"] == 0


def test_suffix_array_overlapping_spans_union_coverage(spark, tmp_path):
    """Overlapping repeat spans merge: 'a b a b a' — 'a b a' repeats
    at positions 1 and 3 (overlapping itself), 'b a' at 2 and 4; the
    per-position spans chain and their union covers the whole doc."""
    sf = _write_documents(spark, tmp_path, [("a b a b a", "src0")])
    r = _rows(spark, sf, "dedup_exact_substr_sa")[1]
    # suffixes: 1:'a b a b a', 3:'a b a' share lcp 3; 2:'b a b a',
    # 4:'b a' share lcp 2; 5:'a' matches 1/3 at lcp 1
    assert r["n_tokens"] == 5
    assert r["lrs_len"] == 3
    assert r["dup_starts"] == 4  # positions 1,2,3,4 (repeat >= 2)
    assert r["dup_cover"] == 5  # union [1,4) u [2,4) u [3,5) u [4,6) = 1..5
