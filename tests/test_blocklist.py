"""Aho-Corasick blocklist filter: automaton correctness vs brute
force, the border-free property the oracle's replace-arithmetic
depends on, and suffix-phrase output merging (round 9)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_stream_spark.operators.blocklist import (
    _PHRASES,
    build_automaton,
    match_counts,
)


def _brute(phrases, text):
    tot = dist = 0
    for p in phrases:
        c, start = 0, 0
        while True:
            i = text.find(p, start)
            if i < 0:
                break
            c += 1
            start = i + 1  # overlapping occurrences
        tot += c
        dist += 1 if c else 0
    return tot, dist


def test_fixture_phrases_are_border_free():
    """The oracle counts via non-overlapping replace-arithmetic;
    equality with the automaton's every-occurrence count requires
    each phrase to have NO proper border (prefix == suffix)."""
    for p in _PHRASES:
        for k in range(1, len(p)):
            assert p[:k] != p[-k:], f"{p!r} has border of length {k}"


def test_matches_brute_force_on_vocab_salad():
    auto = build_automaton(_PHRASES)
    rng = random.Random(11)
    vocab = (
        "key agg row scan slow fast table value part hash merge batch "
        "a the line sort window spark order data column join small "
        "customer query big stream group vector filter"
    ).split()
    for _ in range(400):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 150)))
        assert match_counts(auto, text, len(_PHRASES)) == _brute(_PHRASES, text)


def test_suffix_phrase_output_merging():
    # "bc" is a suffix of "abc": both must fire at "xabc"
    phrases = ["abc", "bc", "c"]
    auto = build_automaton(phrases)
    assert match_counts(auto, "xabc", 3) == (3, 3)
    assert match_counts(auto, "bc", 3) == (2, 2)
    assert match_counts(auto, "ccc", 3) == (3, 1)


def test_overlapping_same_phrase_counted():
    phrases = ["aba"]  # has a border — automaton counts overlaps
    auto = build_automaton(phrases)
    assert match_counts(auto, "ababa", 1) == (2, 1)


def test_failure_links_cross_phrases():
    # after a partial match of one phrase, another must still fire
    phrases = ["hers", "she", "his"]
    auto = build_automaton(phrases)
    assert match_counts(auto, "ushers", 3) == (2, 2)  # she + hers
    assert match_counts(auto, "this", 3) == (1, 1)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=5),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    st.text(alphabet="abcd", max_size=200),
)
def test_automaton_equals_brute_on_random_patterns(phrases, text):
    auto = build_automaton(phrases)
    assert match_counts(auto, text, len(phrases)) == _brute(phrases, text)


def test_no_phrases_in_empty_text():
    auto = build_automaton(_PHRASES)
    assert match_counts(auto, "", len(_PHRASES)) == (0, 0)
