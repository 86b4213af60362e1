"""Semantics tests for gini_concentration and flatten_hierarchy."""

from pyspark.sql import Row

from trollflow2_spark.extensions.mining import flatten_hierarchy
from trollflow2_spark.extensions.profile import gini_concentration


def _gini(spark, vals):
    rows = [Row(g="a", v=float(v), i=i) for i, v in enumerate(vals)]
    out = gini_concentration(
        spark.createDataFrame(rows), ["g"], "v", ["i"]
    )
    return out.collect()[0]


def test_gini_uniform_is_zero(spark):
    r = _gini(spark, [10, 10, 10, 10])
    assert r.gini == 0.0 and r.total == 40.0 and r.n == 4


def test_gini_total_concentration(spark):
    # one member holds everything: G = (n-1)/n
    r = _gini(spark, [0, 0, 0, 100])
    assert r.gini == 0.75


def test_gini_known_value(spark):
    # [1,2,3,4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40
    r = _gini(spark, [1, 2, 3, 4])
    assert r.gini == 0.25


def test_gini_zero_total_null(spark):
    r = _gini(spark, [0.0, 0.0])
    assert r.gini is None


def _flatten(spark, edges, **kw):
    rows = [Row(node=n, parent=p) for n, p in edges]
    out = flatten_hierarchy(
        spark.createDataFrame(
            rows, "node: bigint, parent: bigint"
        ),
        **kw,
    )
    return {r.node: r for r in out.collect()}


def test_tree_paths_roots_depths(spark):
    got = _flatten(
        spark,
        [(1, None), (2, 1), (3, 1), (4, 2), (5, 4), (10, None), (11, 10)],
    )
    assert got[1].path == "1" and got[1].depth == 0 and got[1].root == 1
    assert got[5].path == "1/2/4/5" and got[5].depth == 3
    assert got[11].root == 10 and got[11].depth == 1
    assert all(r.resolved == 1 for r in got.values())


def test_tree_deep_chain_within_doubling_budget(spark):
    # a 20-deep chain resolves with max_depth 32 (5 doubling rounds)
    edges = [(0, None)] + [(i, i - 1) for i in range(1, 21)]
    got = _flatten(spark, edges, max_depth=32)
    assert got[20].depth == 20
    assert got[20].path == "/".join(str(i) for i in range(21))


def test_tree_cycle_flagged_not_hung(spark):
    got = _flatten(spark, [(1, 2), (2, 1), (3, None)], max_depth=8)
    assert got[1].resolved == 0 and got[1].root is None
    assert got[3].resolved == 1


def test_tree_dangling_parent_flagged(spark):
    got = _flatten(spark, [(1, 99), (2, None)], max_depth=8)
    assert got[1].resolved == 0 and got[2].resolved == 1
