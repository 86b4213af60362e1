"""Semantics tests for posting_lists and dag_longest_path."""

from pyspark.sql import Row

from trollflow2_spark.extensions.mining import dag_longest_path
from trollflow2_spark.extensions.text import posting_lists


def test_posting_lists_positions_tf_df(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a c a"),
            Row(doc_id=2, text="a  c"),
            Row(doc_id=3, text="b b"),
        ]
    )
    out = posting_lists(docs, min_df=1).collect()
    got = {(r.term, r.doc_id): r for r in out}
    a1 = got[("a", 1)]
    assert a1.tf == 3 and a1.positions == "0,2,4" and a1.df == 2
    assert got[("a", 2)].positions == "0"  # double space collapses
    assert got[("c", 2)].positions == "1"
    assert got[("b", 3)].tf == 2 and got[("b", 3)].df == 2


def test_posting_lists_min_df_prunes_tail(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="common rare%d" % i) for i in range(5)]
    )
    out = posting_lists(docs, min_df=3).collect()
    assert {r.term for r in out} == {"common"}


def _dag(spark, edges, iterations=8):
    rows = [Row(child=c, parent=p, w=w) for c, p, w in edges]
    out = dag_longest_path(
        spark.createDataFrame(rows), iterations=iterations
    )
    return {r.node: r.longest for r in out.collect()}


def test_dag_longest_of_two_routes(spark):
    # 0 -> 1 (w 1), 0 -> 2 (w 10), 1 -> 3 (w 1), 2 -> 3 (w 1):
    # longest to 3 is 11 via the heavy branch
    got = _dag(spark, [(1, 0, 1), (2, 0, 10), (3, 1, 1), (3, 2, 1)])
    assert got[0] == 0 and got[3] == 11


def test_dag_diamond_counts_once(spark):
    got = _dag(spark, [(1, 0, 2), (2, 0, 3), (3, 1, 4), (3, 2, 4)])
    assert got[3] == 7  # max(2+4, 3+4)


def test_dag_chain_depth_within_budget(spark):
    edges = [(i, i - 1, 1) for i in range(1, 11)]
    got = _dag(spark, edges, iterations=10)
    assert got[10] == 10


def test_dag_multiple_roots(spark):
    got = _dag(spark, [(2, 0, 5), (2, 1, 1)])
    assert got[0] == 0 and got[1] == 0 and got[2] == 5
