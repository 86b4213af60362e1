"""Plan-quality pins for the round-13 fixes: the physical
properties that make them scale are asserted, not hoped for."""

import re

from pyspark.sql import Row, functions as F

from trollflow2_spark.extensions.profile import (
    _theil_sen_pairs,
    theil_sen_trend,
)


def _formatted(df):
    qe = df._jdf.queryExecution()
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def _series(spark, groups=1, n=60):
    rows = [
        Row(g=f"g{j}", x=i, y=float((i * 7 + j) % 13) + 0.25 * i)
        for j in range(groups)
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_theil_sen_pair_stage_parallel_broadcast(spark):
    """The r12 verdict's #1 finding: the pair stage must not be
    keyed only on the group column.  Pin: a SINGLE-group input still
    plans a broadcast hash join whose left side is hash-partitioned
    on (group, hash(x) % npart) — pair expansion spreads over npart
    tasks — and the expanded pair table is never sort-merge joined
    or cartesian-exploded."""
    pairs = _theil_sen_pairs(_series(spark, groups=1), ["g"], "x", "y", 8)
    plan = _formatted(pairs)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the left-side exchange carries the salt term, not just the group
    m = re.search(r"hashpartitioning\(([^)]*)\)", plan)
    assert m is not None, plan
    assert "pmod" in m.group(1) and "hash" in m.group(1)


def test_theil_sen_pair_stage_task_spread(spark):
    """Behavioral twin of the plan pin: with ONE group, the pair
    rows land on >1 task (the old plan ran them all on a single
    task per group)."""
    pairs = _theil_sen_pairs(_series(spark, groups=1, n=80), ["g"], "x", "y", 8)
    per_part = (
        pairs.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    assert len(per_part) > 1
    total = sum(r["count"] for r in per_part)
    assert total == 80 * 79 // 2
    # no partition holds more than half the pairs: real spread
    assert max(r["count"] for r in per_part) < total


def test_theil_sen_tie_pileup_short_circuits(spark):
    """A group dominated by one slope value takes the degenerate
    (no-sort) path and still returns the exact median."""
    rows = [Row(g="a", x=i, y=2.0 * i) for i in range(200)]
    out = theil_sen_trend(
        spark.createDataFrame(rows), ["g"], "x", "y"
    ).collect()
    assert len(out) == 1
    assert out[0].theil_slope == 2.0
    assert out[0].n_pairs == 200 * 199 // 2


def test_theil_sen_matches_exact_percentile(spark):
    """The bracket selection must equal percentile(slope, 0.5)
    exactly — even/odd pair counts and multi-group inputs."""
    df = _series(spark, groups=3, n=41)
    got = {
        r.g: r.theil_slope
        for r in theil_sen_trend(df, ["g"], "x", "y").collect()
    }
    a = df.select(F.col("g").alias("ga"), "x", "y")
    b = df.select(F.col("g").alias("gb"), F.col("x").alias("x2"), F.col("y").alias("y2"))
    slope = (F.col("y2") - F.col("y")) / (F.col("x2") - F.col("x")).cast("double")
    want = {
        r.ga: r.m
        for r in a.join(b, F.col("ga") == F.col("gb"))
        .where(F.col("x") < F.col("x2"))
        .groupBy("ga")
        .agg(F.round(F.percentile(slope, F.lit(0.5)), 6).alias("m"))
        .collect()
    }
    assert got == want


def test_spatial_join_pip_no_cartesian_no_python(spark, sf_dir):
    from tests.test_plans_r12 import plan_of

    plan = plan_of(spark, "spatial_join_pip", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # candidate generation is an equi join on the grid cell
    assert "__cx" in plan and "__cy" in plan
