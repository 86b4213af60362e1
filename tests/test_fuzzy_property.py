"""Property-based tests for edit-distance-1 matching: hypothesis
drives random duplicate-heavy string corpora through both fuzzy tiers
and asserts the pair sets equal a brute-force Levenshtein model —
including length±1 pairs, unicode-ish characters, and tiny id_chunks
forcing the chunked re-attachment path."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

ALPHABET = "abcx0"  # small alphabet -> dense near-match space


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _lev_le1(a: str, b: str, indel: bool) -> bool:
    if a == b:
        return True
    if len(a) == len(b):
        return sum(x != y for x, y in zip(a, b)) <= 1
    if not indel or abs(len(a) - len(b)) != 1:
        return False
    lo, hi = (a, b) if len(a) < len(b) else (b, a)
    return any(hi[:i] + hi[i + 1 :] == lo for i in range(len(hi)))


def _brute(rows, indel):
    return {
        (min(i, j), max(i, j))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev_le1(a, b, indel)
    }


strings = st.text(alphabet=ALPHABET, min_size=1, max_size=5)
corpora = st.lists(strings, min_size=2, max_size=14)


@pytest.mark.parametrize("indel", [False, True])
@given(corpus=corpora)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_edit1_pairs_match_brute_force(spark, corpus, indel):
    from trollflow2_spark.extensions.dedup import (
        hamming1_pairs,
        levenshtein1_pairs,
    )

    rows = list(enumerate(corpus))  # duplicate strings share classes
    df = spark.createDataFrame(rows, "id bigint, s string")
    fn = levenshtein1_pairs if indel else hamming1_pairs
    # id_chunk=3 forces the chunked path whenever a class exceeds 3
    got = {
        (r["id_a"], r["id_b"])
        for r in fn(df, "id", "s", id_chunk=3).collect()
    }
    assert got == _brute(rows, indel)


@given(corpus=corpora)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lev2_pairs_match_brute_force(spark, corpus):
    from trollflow2_spark.extensions.dedup import levenshtein_pairs

    rows = list(enumerate(corpus))
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in levenshtein_pairs(df, "id", "s", max_dist=2,
                                   id_chunk=3).collect()
    }
    want = {
        (min(i, j), max(i, j))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= 2
    }
    assert got == want
