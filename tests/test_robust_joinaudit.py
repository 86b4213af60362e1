"""Semantics tests for winsorized_stats and join_cardinality_audit."""

from pyspark.sql import Row

from trollflow2_spark.extensions.profile import (
    join_cardinality_audit,
    winsorized_stats,
)


def _wins(spark, vals, p_lo=0.1, p_hi=0.9):
    rows = [Row(g="a", v=float(v), i=i) for i, v in enumerate(vals)]
    out = winsorized_stats(
        spark.createDataFrame(rows), ["g"], "v", ["i"], p_lo, p_hi
    )
    return out.collect()[0]


def test_winsor_outlier_clamped(spark):
    # 0..9 plus a 1000 outlier: k = m = floor(1.1) = 1
    r = _wins(spark, list(range(10)) + [1000])
    assert (r.n, r.k_lo, r.k_hi) == (11, 1, 1)
    assert (r.lo_clip, r.hi_clip) == (1.0, 9.0)
    assert r.trimmed_mean == 5.0  # mean of 1..9
    assert r.winsor_mean == 5.0  # (45 + 1 + 9) / 11


def test_winsor_no_trim_small_group(spark):
    # n=4 at 10% tails -> k = m = 0: both means are the plain mean
    r = _wins(spark, [5, 5, 5, 7])
    assert (r.k_lo, r.k_hi) == (0, 0)
    assert r.trimmed_mean == r.winsor_mean == 5.5


def test_winsor_duplicates_stable(spark):
    # duplicate values: the (value, tiebreak) total order pins ranks.
    # n=11: k = floor(0.1*11) = 1, m = floor((1-0.9)*11) = 1 (the
    # tail sizes floor the DOUBLE product — the pinned convention)
    r = _wins(spark, [1] * 10 + [100])
    assert (r.k_lo, r.k_hi) == (1, 1)
    assert r.hi_clip == 1.0  # rank n-m = 10 is still a 1
    assert r.winsor_mean == 1.0


def _audit(spark, left, right):
    l = spark.createDataFrame([Row(k=v) for v in left])
    r = spark.createDataFrame([Row(j=v) for v in right])
    return join_cardinality_audit(l, r, "k", "j").collect()[0]


def test_audit_n_to_one(spark):
    r = _audit(spark, [1, 1, 2, 3], [1, 2, 4])
    assert r.relationship == "N:1"
    assert (r.left_rows, r.right_rows) == (4, 3)
    assert (r.left_orphan_keys, r.right_orphan_keys) == (1, 1)
    assert r.join_rows == 3  # 2*1 + 1*1
    assert (r.max_left_fanout, r.max_right_fanout) == (2, 1)


def test_audit_one_to_one(spark):
    r = _audit(spark, [1, 2], [1, 2])
    assert r.relationship == "1:1" and r.join_rows == 2
    assert r.matched_keys == 2


def test_audit_many_to_many(spark):
    r = _audit(spark, [1, 1, 2], [1, 1, 1, 2])
    assert r.relationship == "N:M"
    assert r.join_rows == 2 * 3 + 1 * 1


def test_winsorized_tail_count_exact_at_multiples(spark):
    """floor((1-0.9)*10) must be 1, not 0: binary-double
    under-representation of 0.1 is quantized away (ADVICE r12)."""
    from pyspark.sql import Row

    from trollflow2_spark.extensions.profile import winsorized_stats

    rows = [Row(g="a", v=float(i), id=i) for i in range(1, 11)]
    out = winsorized_stats(
        spark.createDataFrame(rows), ["g"], "v", ["id"],
        p_lo=0.1, p_hi=0.9,
    ).collect()[0]
    assert out.k_lo == 1 and out.k_hi == 1
    # winsorized: [2,2,3..9,9] -> mean 5.5; trimmed: mean(2..9) = 5.5
    assert out.winsor_mean == 5.5 and out.trimmed_mean == 5.5


def test_target_encoding_loo_identity_beyond_6dp(spark):
    """Targets with >6 decimals: the LOO numerator must subtract the
    same quantized value that entered the category sum, so two rows
    of the same category see each other's quantized target exactly."""
    from pyspark.sql import Row

    from trollflow2_spark.extensions.profile import target_encoding_loo

    t1, t2 = 1.00000049, 2.00000049  # quantize to 1.0 / 2.0
    out = target_encoding_loo(
        spark.createDataFrame(
            [Row(c="x", t=t1), Row(c="x", t=t2)]
        ),
        "c",
        "t",
    ).collect()
    enc = {r.target: r.loo_encoding for r in out}
    assert enc[t1] == 2.0 and enc[t2] == 1.0
