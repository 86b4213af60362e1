

def test_logrank_three_groups_null_out(spark):
    """3+ arms must NOT silently compute group1-vs-pooled-rest."""
    from trollflow2_spark.extensions.profile import logrank_test

    rows = [
        ("s", g, float(t), 1)
        for g in ("a", "b", "c")
        for t in (1, 2, 3, 4, 5)
    ]
    df = spark.createDataFrame(
        rows, "stratum string, arm string, duration double, event int"
    )
    out = logrank_test(df, ["stratum"], "arm").collect()
    assert len(out) == 1
    assert out[0]["e1"] is None and out[0]["chi2"] is None
