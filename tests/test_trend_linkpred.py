"""Semantics tests for the round-12 continuation analytics ops:
per-group OLS linear trend and bipartite link prediction."""

import math

from pyspark.sql import Row

from trollflow2_spark.extensions.mining import link_prediction_scores
from trollflow2_spark.extensions.profile import linear_trend


def _trend(spark, pts, **kw):
    rows = [Row(g=g, x=x, y=float(y)) for g, x, y in pts]
    out = linear_trend(spark.createDataFrame(rows), ["g"], "x", "y", **kw)
    return {r.g: r for r in out.collect()}


def test_linear_trend_exact_line(spark):
    # y = 2x + 5 exactly -> slope 2, intercept 5, r2 = 1
    r = _trend(spark, [("a", x, 2 * x + 5) for x in range(10)])["a"]
    assert r.n == 10
    assert r.slope == 2.0
    assert r.intercept == 5.0
    assert r.r2 == 1.0


def test_linear_trend_zero_x_variance(spark):
    # all x equal -> undefined fit, NULLs not a division blow-up
    r = _trend(spark, [("a", 7, y) for y in (1, 2, 3)])["a"]
    assert r.slope is None and r.intercept is None and r.r2 is None


def test_linear_trend_flat_y(spark):
    # constant y over varying x -> slope 0, R2 undefined (vy = 0)
    r = _trend(spark, [("a", x, 4.25) for x in range(5)])["a"]
    assert r.slope == 0.0
    assert r.intercept == 4.25
    assert r.r2 is None


def test_linear_trend_groups_independent(spark):
    pts = [("up", x, 3 * x) for x in range(4)]
    pts += [("down", x, 10 - x) for x in range(4)]
    out = _trend(spark, pts)
    assert out["up"].slope == 3.0 and out["down"].slope == -1.0


def _edges(spark, pairs):
    return spark.createDataFrame([Row(l=a, r=b) for a, b in pairs])


GRAPH = [("A", 1), ("B", 1), ("A", 2), ("B", 2), ("C", 2), ("A", 3)]


def test_link_prediction_closed_form(spark):
    out = link_prediction_scores(
        _edges(spark, GRAPH), "l", "r", min_common=1, max_degree=256
    ).collect()
    got = {(r.node_a, r.node_b): r for r in out}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    # shared: r1 (deg 2) + r2 (deg 3); degrees A=3, B=2
    assert ab.common_neighbors == 2
    assert ab.jaccard == round(2 / 3, 6)
    aa = round(1 / math.log(2), 12) + round(1 / math.log(3), 12)
    assert ab.adamic_adar == round(aa, 6)
    ac = got[("A", "C")]
    assert ac.common_neighbors == 1
    assert ac.jaccard == round(1 / 3, 6)
    assert ac.adamic_adar == round(round(1 / math.log(3), 12), 6)
    assert got[("B", "C")].jaccard == 0.5


def test_link_prediction_hub_guard(spark):
    # max_degree=2 prunes the degree-3 part BEFORE pairing; Jaccard
    # denominators still use TRUE degrees from the unpruned edge set
    out = link_prediction_scores(
        _edges(spark, GRAPH), "l", "r", min_common=1, max_degree=2
    ).collect()
    got = {(r.node_a, r.node_b): r for r in out}
    assert set(got) == {("A", "B")}
    ab = got[("A", "B")]
    assert ab.common_neighbors == 1
    assert ab.jaccard == round(1 / (3 + 2 - 1), 6)


def test_link_prediction_min_common_floor(spark):
    out = link_prediction_scores(
        _edges(spark, GRAPH), "l", "r", min_common=2, max_degree=256
    ).collect()
    assert {(r.node_a, r.node_b) for r in out} == {("A", "B")}


def test_link_prediction_duplicate_edges_collapse(spark):
    dup = GRAPH + GRAPH
    out = link_prediction_scores(
        _edges(spark, dup), "l", "r", min_common=1, max_degree=256
    ).collect()
    got = {(r.node_a, r.node_b): r.common_neighbors for r in out}
    assert got[("A", "B")] == 2
