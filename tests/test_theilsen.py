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


def test_hodges_lehmann_known_values(spark):
    from trollflow2_spark.extensions.profile import hodges_lehmann

    # x = [1, 2, 10]: walsh = {1, 1.5, 5.5, 2, 6, 10} -> median 3.75
    rows = [Row(g="a", i=k, v=float(v)) for k, v in enumerate([1, 2, 10])]
    out = hodges_lehmann(
        spark.createDataFrame(rows), ["g"], "v", "i"
    ).collect()[0]
    assert out.n_pairs == 6
    assert out.hl_estimate == 3.75


def test_hodges_lehmann_outlier_robust(spark):
    from trollflow2_spark.extensions.profile import hodges_lehmann

    base = [Row(g="a", i=k, v=5.0 + (k % 3) * 0.5) for k in range(20)]
    spiked = base + [Row(g="a", i=99, v=1e9)]
    got = hodges_lehmann(
        spark.createDataFrame(spiked), ["g"], "v", "i"
    ).collect()[0]
    assert abs(got.hl_estimate - 5.5) < 0.6  # the spike barely moves it


def test_hodges_lehmann_tie_pileup_short_circuit(spark):
    from trollflow2_spark.extensions.profile import hodges_lehmann

    rows = [Row(g="a", i=k, v=7.0) for k in range(100)]
    out = hodges_lehmann(
        spark.createDataFrame(rows), ["g"], "v", "i"
    ).collect()[0]
    assert out.hl_estimate == 7.0 and out.n_pairs == 100 * 101 // 2


def test_wilcoxon_known_values(spark):
    from trollflow2_spark.extensions.profile import wilcoxon_signed_rank

    rows = [
        Row(g="a", b=0.0, a2=float(v))
        for v in (1, -2, 3, -4, 5)
    ]
    out = wilcoxon_signed_rank(
        spark.createDataFrame(rows), ["g"], "b", "a2"
    ).collect()[0]
    assert out.n == 5 and out.w_plus == 9.0
    assert out.z == round(1.0 / 13.75 ** 0.5, 6)


def test_wilcoxon_ties_and_zero_drop(spark):
    from trollflow2_spark.extensions.profile import wilcoxon_signed_rank

    rows = [Row(g="a", b=0.0, a2=float(v)) for v in (2, 2, -2, 0)]
    out = wilcoxon_signed_rank(
        spark.createDataFrame(rows), ["g"], "b", "a2"
    ).collect()[0]
    assert out.n == 3 and out.w_plus == 4.0  # midrank 2 for all
    assert out.z == round(0.5 / 3.0 ** 0.5, 6)


def test_kendall_tau_known_values(spark):
    from trollflow2_spark.extensions.profile import kendall_tau_b

    rows = [Row(g="a", i=i, x=float(x), y=float(y))
            for i, (x, y) in enumerate([(1, 1), (2, 3), (3, 2)])]
    out = kendall_tau_b(
        spark.createDataFrame(rows), ["g"], "x", "y", "i"
    ).collect()[0]
    assert out.c_minus_d == 1 and out.tau_b == round(1 / 3, 6)


def test_kendall_tau_b_tie_correction(spark):
    from trollflow2_spark.extensions.profile import kendall_tau_b

    rows = [Row(g="a", i=i, x=float(x), y=float(y))
            for i, (x, y) in enumerate([(1, 1), (1, 2), (2, 2)])]
    out = kendall_tau_b(
        spark.createDataFrame(rows), ["g"], "x", "y", "i"
    ).collect()[0]
    assert out.c_minus_d == 1 and out.tau_b == 0.5


def test_exact_quantiles_small_group_widen(spark):
    from pyspark.sql import functions as SF

    from trollflow2_spark.extensions.profile import exact_quantiles

    rows = [Row(g="a", v=float(i)) for i in range(1, 11)]  # 1..10
    out = exact_quantiles(
        spark.createDataFrame(rows), ["g"], "v", [0.5, 0.9, 0.0, 1.0]
    ).collect()
    got = {r.p: r.q for r in out}
    # rank 1 + p*(n-1): p=.5 -> 5.5, p=.9 -> 9.1, ends exact
    assert got[0.5] == 5.5 and got[0.9] == 9.1
    assert got[0.0] == 1.0 and got[1.0] == 10.0
    assert all(r.n == 10 for r in out)
    _ = SF  # keep import pattern consistent


def test_exact_quantiles_bracket_path_and_ties(spark):
    from trollflow2_spark.extensions.profile import exact_quantiles

    # large group -> bracket path engages (n >= small_n default 200)
    rows = [Row(g="a", v=float(i % 997)) for i in range(5000)]
    out = {r.p: r for r in exact_quantiles(
        spark.createDataFrame(rows), ["g"], "v", [0.5, 0.99]
    ).collect()}
    import statistics

    vals = sorted(float(i % 997) for i in range(5000))

    def q(p):
        r = 1 + p * (len(vals) - 1)
        import math

        klo, khi = int(math.floor(r)), min(int(math.ceil(r)), len(vals))
        g = r - math.floor(r)
        return round(vals[klo - 1] + g * (vals[khi - 1] - vals[klo - 1]), 6)

    assert out[0.5].q == q(0.5) and out[0.99].q == q(0.99)
    _ = statistics
    # tie pileup: one dominating value
    rows = [Row(g="b", v=7.0)] * 1000 + [Row(g="b", v=1.0)]
    got = exact_quantiles(
        spark.createDataFrame(rows), ["g"], "v", [0.5]
    ).collect()[0]
    assert got.q == 7.0


def test_exact_quantiles_bad_p_raises(spark):
    import pytest as _pytest

    from trollflow2_spark.extensions.profile import exact_quantiles

    df = spark.createDataFrame([Row(g="a", v=1.0)])
    with _pytest.raises(ValueError):
        exact_quantiles(df, ["g"], "v", [1.5])
    with _pytest.raises(ValueError):
        exact_quantiles(df, ["g"], "v", [])


def test_logrank_identical_arms_zero_chi2(spark):
    from trollflow2_spark.extensions.profile import logrank_test

    rows = [
        Row(s="x", arm=a, duration=t, event=e)
        for a in ("A", "B")
        for t, e in [(1, 1), (2, 1), (3, 0), (4, 1)]
    ]
    out = logrank_test(
        spark.createDataFrame(rows), ["s"], "arm"
    ).collect()[0]
    # identical arms: O1 == E1 exactly -> chi2 == 0
    assert out.group1 == "A" and out.o1 == 3
    assert out.e1 == 3.0 and out.chi2 == 0.0


def test_logrank_known_small_example(spark):
    from trollflow2_spark.extensions.profile import logrank_test

    # A dies at t=1,2; B dies at t=3,4 (no censoring)
    rows = [
        Row(s="x", arm="A", duration=1, event=1),
        Row(s="x", arm="A", duration=2, event=1),
        Row(s="x", arm="B", duration=3, event=1),
        Row(s="x", arm="B", duration=4, event=1),
    ]
    out = logrank_test(
        spark.createDataFrame(rows), ["s"], "arm"
    ).collect()[0]
    # hand computation: t=1: d=1,n=4,n1=2 -> e=.5 v=.25
    #   t=2: d=1,n=3,n1=1 -> e=1/3 v=2/9; t=3: d=1,n=2,n1=0 -> 0,0
    #   t=4: d=1,n=1 -> e=0, v=0
    # O1=2, E1=.5+1/3=0.833333334 (round-9 terms), V=.25+2/9
    assert out.o1 == 2
    assert abs(out.e1 - 0.833333) < 1e-6
    want_chi2 = round((2 - (0.5 + round(1 / 3, 9))) ** 2
                      / (0.25 + round(2 / 9, 9)), 6)
    assert abs(out.chi2 - want_chi2) < 1e-6


def test_logrank_single_arm_null_stats(spark):
    from trollflow2_spark.extensions.profile import logrank_test

    rows = [Row(s="x", arm="A", duration=t, event=1) for t in (1, 2)]
    out = logrank_test(
        spark.createDataFrame(rows), ["s"], "arm"
    ).collect()[0]
    assert out.e1 is None and out.chi2 is None
