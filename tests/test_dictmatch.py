"""Aho-Corasick dictionary matcher: classic-vector, overlap,
boundary and Spark-intake tests."""

import pytest
from pyspark.sql import Row

from trollflow2_spark.extensions.dictmatch import (
    build_automaton,
    dictionary_match,
    match_counts,
)


def _counts(phrases, text, **kw):
    a = build_automaton(phrases)
    return {a[3][k]: v for k, v in match_counts(a, text, **kw).items()}


def test_classic_ushers_vector():
    # the canonical AC example: he/she/his/hers over "ushers"
    assert _counts(["he", "she", "his", "hers"], "ushers") == {
        "she": 1, "he": 1, "hers": 1,
    }


def test_overlapping_occurrences_counted():
    assert _counts(["aa"], "aaaa") == {"aa": 3}


def test_case_folding_and_multiword():
    got = _counts(["click here"], "CLICK HERE and click here")
    assert got == {"click here": 2}


def test_word_boundaries_flag():
    assert _counts(["spam"], "spamspam despam xspam") == {"spam": 4}
    assert _counts(
        ["spam"], "spamspam despam xspam", word_boundaries=True
    ) == {}
    assert _counts(
        ["spam"], "spam, spam! (spam)", word_boundaries=True
    ) == {"spam": 3}


def test_phrase_that_is_prefix_of_another():
    got = _counts(["ab", "abc"], "zabcz")
    assert got == {"ab": 1, "abc": 1}


def test_empty_and_duplicate_phrases():
    with pytest.raises(ValueError):
        build_automaton([])
    with pytest.raises(ValueError):
        build_automaton(["ok", ""])
    a = build_automaton(["x", "X"])  # folds to one phrase
    assert len(a[3]) == 1


def test_spark_dictionary_match(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam click here"),
            Row(doc_id=2, text="nothing to see"),
            Row(doc_id=3, text=None),
        ]
    )
    rows = {
        r.doc_id: r
        for r in dictionary_match(
            df, ["spam", "click here"]
        ).collect()
    }
    assert rows[1].n_hits == 3 and rows[1].n_distinct == 2
    assert rows[1].top_term == "spam" and rows[1].top_count == 2
    assert rows[2].n_hits == 0 and rows[2].top_term is None
    assert rows[3].n_hits == 0  # NULL text is empty, not an error
