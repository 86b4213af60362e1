"""KMV bottom-k sketch tier: construction, estimation, set-operation
estimates, and micro-batched merge == one-pass equality."""

import pytest
from pyspark.sql import Row, functions as F

from trollflow2_spark.extensions.snapshot import (
    kmv_replay_state,
    kmv_set_ops,
    kmv_sketch,
)


def _rows(key, values):
    return [Row(k=key, v=int(x)) for x in values]


def test_kmv_sketch_unsaturated_is_exact_set(spark):
    df = spark.createDataFrame(_rows("a", range(10)) + _rows("a", range(10)))
    out = kmv_sketch(df, ["k"], "v", k=64).collect()
    (r,) = out
    assert len(r.sketch) == 10  # duplicates collapse; sketch IS the set
    assert r.sketch == sorted(r.sketch)


def test_kmv_sketch_saturated_bottom_k(spark):
    df = spark.createDataFrame(_rows("a", range(500)))
    out = kmv_sketch(df, ["k"], "v", k=64).collect()
    (r,) = out
    assert len(r.sketch) == 64
    assert r.sketch == sorted(r.sketch)


def test_kmv_merge_semilattice(spark):
    """bottom-k(A ∪ B) == bottom-k(sketch(A) ∪ sketch(B))."""
    a = spark.createDataFrame(_rows("x", range(0, 300)))
    b = spark.createDataFrame(_rows("x", range(200, 500)))
    k = 32
    sa = kmv_sketch(a, ["k"], "v", k=k).collect()[0].sketch
    sb = kmv_sketch(b, ["k"], "v", k=k).collect()[0].sketch
    merged = sorted(set(sa) | set(sb))[:k]
    full = kmv_sketch(a.unionByName(b), ["k"], "v", k=k).collect()[0].sketch
    assert merged == full


def test_kmv_set_ops_identical_and_disjoint(spark):
    rows = _rows("p", range(200)) + _rows("q", range(200)) + _rows(
        "r", range(1000, 1200)
    )
    out = {
        (r.key_a, r.key_b): r
        for r in kmv_set_ops(
            spark.createDataFrame(rows), "k", "v", k=32
        ).collect()
    }
    pq = out[("p", "q")]
    assert pq.est_jaccard == 1.0 and pq.exact_jaccard == 1.0
    assert pq.exact_intersection == 200 and pq.exact_union == 200
    pr = out[("p", "r")]
    assert pr.est_jaccard == 0.0 and pr.exact_jaccard == 0.0
    assert pr.exact_union == 400 and pr.exact_intersection == 0


def test_kmv_estimate_within_error(spark):
    df = spark.createDataFrame(_rows("a", range(5000)) + _rows("b", range(5000)))
    out = kmv_set_ops(df, "k", "v", k=64).collect()[0]
    # KMV relative error ~ 1/sqrt(k-1) ≈ 12.6%; allow 3 sigma
    assert abs(out.est_a - 5000) / 5000 < 0.4
    assert out.exact_a == 5000


def test_kmv_replay_equals_one_pass(spark):
    batches = [
        [{"k": "a", "v": i} for i in range(0, 150)],
        [{"k": "a", "v": i} for i in range(100, 250)]
        + [{"k": "b", "v": i} for i in range(5)],
        [{"k": "a", "v": i} for i in range(200, 300)],
    ]
    merged = {
        r.event_type if hasattr(r, "event_type") else r.k: r
        for r in kmv_replay_state(
            spark, batches, "k string, v long",
            key_col="k", value_col="v", k=32,
        ).collect()
    }
    all_rows = [Row(k=d["k"], v=d["v"]) for b in batches for d in b]
    one_pass = {
        r.k: r.sketch
        for r in kmv_sketch(
            spark.createDataFrame(all_rows), ["k"], "v", k=32
        ).collect()
    }
    assert merged["a"].sketch_size == 32
    assert merged["a"].kth_hash == one_pass["a"][31]
    assert merged["a"].min_hash == one_pass["a"][0]
    assert merged["b"].sketch_size == 5  # unsaturated: est == exact
    assert merged["b"].est_distinct == 5.0
