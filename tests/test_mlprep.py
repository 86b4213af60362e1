"""Semantics tests for quantile_transform and target_encoding_loo."""

from pyspark.sql import Row

from trollflow2_spark.extensions.profile import (
    quantile_transform,
    target_encoding_loo,
)


def _qt(spark, vals):
    df = spark.createDataFrame([Row(g="a", v=float(v)) for v in vals])
    out = quantile_transform(df, ["g"], "v")
    return sorted((r.value, r.q) for r in out.collect())


def test_quantile_uniform_spacing(spark):
    got = _qt(spark, [10, 20, 30, 40])
    assert got == [(10.0, 0.2), (20.0, 0.4), (30.0, 0.6), (40.0, 0.8)]


def test_quantile_ties_share_midrank(spark):
    # ranks 1,2,2(+3),4 -> midrank of the tie = 2.5 -> 0.5
    got = _qt(spark, [1, 5, 5, 9])
    assert got == [(1.0, 0.2), (5.0, 0.5), (5.0, 0.5), (9.0, 0.8)]


def test_quantile_monotone_outlier_immune(spark):
    got = _qt(spark, [1, 2, 3, 1000000])
    assert [q for _, q in got] == [0.2, 0.4, 0.6, 0.8]


def _loo(spark, rows, **kw):
    df = spark.createDataFrame([Row(c=c, y=float(y)) for c, y in rows])
    out = target_encoding_loo(df, "c", "y", **kw)
    return out.collect()


def test_loo_excludes_own_row(spark):
    rows = [("a", 10), ("a", 20), ("a", 30), ("b", 5), ("b", 7)]
    got = {(r.category, r.target): r.loo_encoding for r in _loo(spark, rows)}
    assert got[("a", 10.0)] == 25.0  # (20+30)/2
    assert got[("a", 20.0)] == 20.0  # (10+30)/2
    assert got[("b", 5.0)] == 7.0


def test_loo_singleton_null_unsmoothed(spark):
    got = _loo(spark, [("solo", 42)])
    assert got[0].loo_encoding is None


def test_loo_singleton_falls_back_to_smoothed_prior(spark):
    got = _loo(spark, [("solo", 42)], smooth=10.0, prior=3.0)
    assert got[0].loo_encoding == 3.0  # (0 + 10*3) / (0 + 10)
