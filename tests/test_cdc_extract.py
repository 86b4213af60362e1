"""Semantics tests for cdc_extract (snapshot-diff change feed)."""

from pyspark.sql import Row

from trollflow2_spark.extensions.profile import cdc_extract


def _diff(spark, old_rows, new_rows):
    schema = "k: bigint, a: string, b: bigint"
    old = spark.createDataFrame(
        [Row(k=k, a=a, b=b) for k, a, b in old_rows], schema
    )
    new = spark.createDataFrame(
        [Row(k=k, a=a, b=b) for k, a, b in new_rows], schema
    )
    out = cdc_extract(old, new, ["k"], ["a", "b"])
    return {r.k: r for r in out.collect()}


def test_insert_update_delete_classes(spark):
    got = _diff(
        spark,
        [(1, "x", 10), (2, "y", 20), (3, "z", 30)],
        [(2, "y", 25), (3, "z", 30), (4, "w", 40)],
    )
    assert got[1].op == "D" and got[1].new_a is None
    assert got[2].op == "U" and (got[2].old_b, got[2].new_b) == (20, 25)
    assert 3 not in got  # unchanged rows never emitted
    assert got[4].op == "I" and got[4].old_a is None


def test_null_transitions_are_changes(spark):
    got = _diff(spark, [(1, None, 1)], [(1, "now-set", 1)])
    assert got[1].op == "U"
    got2 = _diff(spark, [(1, "was-set", 1)], [(1, None, 1)])
    assert got2[1].op == "U"
    got3 = _diff(spark, [(1, None, 1)], [(1, None, 1)])
    assert 1 not in got3  # NULL == NULL under eqNullSafe: unchanged


def test_empty_feed_for_identical_snapshots(spark):
    got = _diff(spark, [(1, "a", 1), (2, "b", 2)],
                [(1, "a", 1), (2, "b", 2)])
    assert got == {}
