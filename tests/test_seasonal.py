"""Semantics tests for seasonal_profile: planted seasonality must be
recovered exactly; series edges without a full window are excluded."""

from pyspark.sql import Row

from trollflow2_spark.extensions.profile import seasonal_profile


def _series(spark, seasonal, cycles, level=100.0, key="a"):
    period = len(seasonal)
    rows = [
        Row(
            k=key,
            t=i,
            phase=i % period,
            y=float(level + seasonal[i % period]),
        )
        for i in range(period * cycles)
    ]
    return spark.createDataFrame(rows)


def test_planted_even_period_recovered(spark):
    planted = [4.0, -2.0, 6.0, -8.0]  # mean 0 -> recovered verbatim
    df = _series(spark, planted, cycles=6)
    out = seasonal_profile(df, ["k"], "t", "phase", "y", period=4)
    got = {r.phase: r.seasonal for r in out.collect()}
    assert got == {0: 4.0, 1: -2.0, 2: 6.0, 3: -8.0}


def test_planted_odd_period_recovered(spark):
    planted = [3.0, 0.0, -3.0]
    df = _series(spark, planted, cycles=5)
    out = seasonal_profile(df, ["k"], "t", "phase", "y", period=3)
    got = {r.phase: r.seasonal for r in out.collect()}
    assert got == {0: 3.0, 1: 0.0, 2: -3.0}


def test_uncentered_plant_gets_centered(spark):
    # planted offsets with mean 1 -> indices come out mean-centered
    planted = [2.0, 1.0, 3.0, -2.0]
    df = _series(spark, planted, cycles=6)
    out = seasonal_profile(df, ["k"], "t", "phase", "y", period=4)
    got = {r.phase: r.seasonal for r in out.collect()}
    assert got == {0: 1.0, 1: 0.0, 2: 2.0, 3: -3.0}


def test_edges_excluded_from_counts(spark):
    # 6 cycles of 4 = 24 rows; half=2 trims 2 at each end -> 20 obs
    df = _series(spark, [1.0, -1.0, 2.0, -2.0], cycles=6)
    out = seasonal_profile(df, ["k"], "t", "phase", "y", period=4)
    assert sum(r.n_obs for r in out.collect()) == 20


def test_keys_independent(spark):
    a = _series(spark, [5.0, -5.0], cycles=8, key="a")
    b = _series(spark, [-7.0, 7.0], cycles=8, key="b")
    out = seasonal_profile(
        a.unionByName(b), ["k"], "t", "phase", "y", period=2
    )
    got = {(r.k, r.phase): r.seasonal for r in out.collect()}
    assert got[("a", 0)] == 5.0 and got[("b", 0)] == -7.0
