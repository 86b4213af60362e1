"""Semantics tests for the cohort cumulative-LTV curve."""

import datetime

from pyspark.sql import Row


def _t(d, h=0):
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(
        days=d, hours=h
    )


def _ltv(spark, events):
    from trollflow2_spark.queries import q_ltv_curve
    import trollflow2_spark.tables as tables

    rows = [
        Row(
            event_id=i,
            ts=_t(d, h),
            user_id=u,
            event_type=et,
            value=float(v),
            props="{}",
        )
        for i, (u, d, h, et, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows)
    orig = tables.load_table
    tables.load_table = lambda s, sf, name: df  # events only
    try:
        import trollflow2_spark.queries as q

        qorig = q.load_table
        q.load_table = tables.load_table
        try:
            out = q_ltv_curve(spark, "unused")
            return {
                (r.cohort_week, r.age_week): r for r in out.collect()
            }
        finally:
            q.load_table = qorig
    finally:
        tables.load_table = orig


def test_ltv_cohorts_ages_and_cumsum(spark):
    events = [
        (1, 0, 0, "signup", 0),     # cohort week 0
        (1, 1, 0, "purchase", 10),  # age 0
        (1, 8, 0, "purchase", 30),  # age 1
        (2, 2, 0, "signup", 0),     # cohort week 0
        (2, 3, 0, "purchase", 20),  # age 0
        (3, 9, 0, "signup", 0),     # cohort week 1
        (3, 9, 1, "purchase", 50),  # age 0
        (4, 0, 0, "purchase", 99),  # never signed up: excluded
    ]
    got = _ltv(spark, events)
    r00 = got[(0, 0)]
    assert r00.n_users == 2 and r00.revenue == 30.0
    assert r00.cum_ltv_per_user == 15.0
    r01 = got[(0, 1)]
    assert r01.revenue == 30.0 and r01.cum_ltv_per_user == 30.0
    assert got[(1, 0)].n_users == 1
    assert got[(1, 0)].cum_ltv_per_user == 50.0
    assert all(k[0] in (0, 1) for k in got)


def test_ltv_purchase_before_signup_excluded(spark):
    events = [
        (1, 7, 0, "signup", 0),
        (1, 2, 0, "purchase", 100),  # predates signup: dropped
        (1, 8, 0, "purchase", 5),
    ]
    got = _ltv(spark, events)
    (k,) = got
    assert got[k].revenue == 5.0
