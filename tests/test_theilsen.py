"""Semantics tests for theil_sen_trend (robust slope + Mann-Kendall)."""

from pyspark.sql import Row

from trollflow2_spark.extensions.profile import theil_sen_trend


def _ts(spark, pts):
    rows = [Row(g="a", x=x, y=float(y)) for x, y in pts]
    out = theil_sen_trend(spark.createDataFrame(rows), ["g"], "x", "y")
    return out.collect()[0]


def test_clean_line_exact_slope(spark):
    r = _ts(spark, [(x, 3 * x + 2) for x in range(8)])
    assert r.theil_slope == 3.0
    assert r.mk_s == r.n_pairs == 28  # every pair increasing
    assert r.mk_z > 0


def test_outlier_does_not_move_slope(spark):
    pts = [(x, 2 * x) for x in range(9)] + [(9, 1000.0)]
    r = _ts(spark, pts)
    # OLS slope would be ~12; the pairwise median stays ~2
    assert abs(r.theil_slope - 2.0) < 0.5


def test_flat_series_zero_s(spark):
    r = _ts(spark, [(x, 7.0) for x in range(6)])
    assert r.mk_s == 0 and r.theil_slope == 0.0
    # all pairs tied: the tie correction removes all variance
    assert r.mk_z is None or r.mk_z == 0.0


def test_decreasing_negative(spark):
    r = _ts(spark, [(x, 10 - x) for x in range(6)])
    assert r.theil_slope == -1.0 and r.mk_s == -15 and r.mk_z < 0
