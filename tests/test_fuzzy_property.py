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


def test_long_pairs_match_brute_force_random_edits(spark):
    """levenshtein_long_pairs (q-gram prefix ed-join) vs the DP model
    on ~120-char titles with random substitutions/indels/appends,
    plus exact duplicates for the distance-0 closure."""
    import random

    from trollflow2_spark.extensions.dedup import levenshtein_long_pairs

    random.seed(11)
    base = (
        "the quick brown fox jumps over the lazy dog while carrying a "
        "remarkably heavy parcel of documents through the rainy streets"
    )
    rows, rid = [], 0
    for g in range(10):
        s = base[: 60 + g] + f" group {str(g) * 9} tail segment"
        variants = [s]
        for _ in range(3):
            v = list(s)
            op = random.choice(["sub", "del", "ins", "sub2", "far"])
            if op == "sub":
                v[random.randrange(len(v))] = "#"
            elif op == "del":
                del v[random.randrange(len(v))]
            elif op == "ins":
                v.insert(random.randrange(len(v)), "%")
            elif op == "sub2":
                v[random.randrange(len(v) // 2)] = "#"
                v[len(v) // 2 + random.randrange(len(v) // 2)] = "@"
            else:
                v = list(s + " plus an entirely different long suffix")
            variants.append("".join(v))
        for s2 in variants:
            rows.append((rid, s2))
            rid += 1
    rows.append((rid, rows[0][1]))  # exact duplicate -> distance-0 pair
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in levenshtein_long_pairs(df, "id", "s", max_dist=2).collect()
    }
    want = {
        (min(i, j), max(i, j))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= 2
    }
    assert got == want


def test_fuzzy_scope_audit_accounts_every_row(spark):
    from trollflow2_spark.extensions.dedup import fuzzy_scope_audit

    rows = [
        (1, "a" * 10),
        (2, "b" * 64),
        (3, "c" * 65),
        (4, "d" * 200),
        (5, None),
    ]
    out = fuzzy_scope_audit(
        spark.createDataFrame(rows, "id bigint, s string"), "id", "s"
    ).first()
    assert out["n_total"] == 5
    assert out["n_in_scope"] == 2 and out["n_skipped"] == 2
    assert out["n_null"] == 1
    assert out["n_in_scope"] + out["n_skipped"] + out["n_null"] == 5
    assert out["max_skipped_len"] == 200
