"""Batch-4 mining/feature-prep tests: WOE/IV, quantile binning,
winnowing fingerprints, PMI collocations."""

import pytest
from pyspark.sql import Row, functions as F

from trollflow2_spark.extensions.classify import woe_iv
from trollflow2_spark.extensions.dedup import (
    winnow_fingerprints,
    winnow_pairs,
)
from trollflow2_spark.extensions.profile import quantile_binning
from trollflow2_spark.extensions.text import collocations_pmi


def test_woe_iv_separating_vs_uninformative(spark):
    rows = []
    # feature 'sep': value A -> all positives, value B -> all negatives
    rows += [Row(f="A", label=1) for _ in range(50)]
    rows += [Row(f="B", label=0) for _ in range(50)]
    sep = woe_iv(spark.createDataFrame(rows), "f", "label").collect()
    by = {r.feature_value: r for r in sep}
    assert by["A"].woe > 2.0 and by["B"].woe < -2.0
    assert by["A"].iv == by["B"].iv  # IV is the feature-level fold
    assert by["A"].iv > 3.0
    # uninformative: same label mix in both values -> woe ~ 0
    rows2 = [Row(f=v, label=i % 2) for v in ("A", "B") for i in range(50)]
    uni = woe_iv(spark.createDataFrame(rows2), "f", "label").collect()
    for r in uni:
        assert abs(r.woe) < 0.01 and r.iv < 0.001


def test_quantile_binning_even_split(spark):
    rows = [Row(cid=i, v=float(i)) for i in range(100)]
    out = {
        r.bin: r
        for r in quantile_binning(
            spark.createDataFrame(rows), "v", "cid", n_bins=10
        ).collect()
    }
    assert len(out) == 10
    assert all(out[b].n == 10 for b in out)
    assert out[1].lo == 0.0 and out[1].hi == 9.0
    assert out[10].lo == 90.0 and out[10].hi == 99.0
    # ranges are ordered and non-overlapping
    for b in range(1, 10):
        assert out[b].hi < out[b + 1].lo


def test_winnow_guarantee_shared_run(spark):
    """Two docs sharing a run of >= k+w-1 tokens share >= 1 print
    (the winnowing selection guarantee, k=4 w=4 -> 7 tokens)."""
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"one two {shared} three four"),
            Row(doc_id=2, text=f"{shared} nine ten eleven twelve"),
            Row(doc_id=3, text="totally different words here only now"),
        ]
    )
    prints = winnow_fingerprints(df, k=4, w=4)
    p = {
        d: {r.print for r in rows}
        for d, rows in [
            (i, [r for r in prints.collect() if r.doc_id == i])
            for i in (1, 2, 3)
        ]
    }
    assert p[1] & p[2]  # the guarantee
    assert not (p[1] & p[3]) and not (p[2] & p[3])


def test_winnow_density(spark):
    # selection density ~ 2/(w+1): far fewer prints than positions
    text = " ".join(f"tok{i % 97}" for i in range(400))
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    n = winnow_fingerprints(df, k=4, w=8).count()
    assert n < 400 * 0.5  # well under one print per position


def test_winnow_pairs_gate_and_boilerplate_drop(spark):
    rows = [
        Row(doc_id=1, print=100, pos=1),
        Row(doc_id=2, print=100, pos=1),
        Row(doc_id=1, print=101, pos=2),
        Row(doc_id=2, print=101, pos=2),
        Row(doc_id=1, print=102, pos=3),
        Row(doc_id=3, print=102, pos=1),  # only 1 shared with doc 1
    ]
    # a boilerplate print shared by everyone incl. docs 4..9
    for d in range(1, 10):
        rows.append(Row(doc_id=d, print=999, pos=9))
    df = spark.createDataFrame(rows)
    out = winnow_pairs(df, min_shared=2, max_bucket=5).collect()
    assert len(out) == 1
    (r,) = out
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.shared_prints == 2  # print 999 dropped at the guard
    # doc1 has 4 distinct prints, doc2 has 3 -> 2*1000//3 = 666
    assert r.overlap_permille == 666


def test_collocations_pmi_planted_phrase(spark):
    rows = []
    for i in range(30):
        rows.append(Row(text="new york is big"))
        rows.append(Row(text=f"filler{i} words new again york here"))
    out = {
        (r.tok_a, r.tok_b): r
        for r in collocations_pmi(
            spark.createDataFrame(rows), min_count=5
        ).collect()
    }
    assert ("new", "york") in out
    ny = out[("new", "york")]
    assert ny.c_ab == 30 and ny.pmi > 0
    # 'york here' occurs 30x too but 'new york' is the tighter pair of
    # equally-frequent tokens; both must clear the floor
    assert ("york", "here") in out
    # pairs under the floor are absent
    assert all(r.c_ab >= 5 for r in out.values())
