"""Semantics tests for time_weighted_average and encoding_advisor."""

import datetime

from pyspark.sql import Row

from trollflow2_spark.extensions.profile import (
    encoding_advisor,
    time_weighted_average,
)


def _t(s):
    return datetime.datetime(2026, 3, 1, 0, 0, s)


def _twap(spark, readings):
    rows = [
        Row(k="a", ts=_t(s), eid=i, v=float(v))
        for i, (s, v) in enumerate(readings)
    ]
    out = time_weighted_average(
        spark.createDataFrame(rows), ["k"], "ts", ["eid"], "v"
    )
    return out.collect()[0]


def test_twap_weights_by_holding_time(spark):
    # 10 held for 30 s, then 20 held for 10 s -> (300+200)/40 = 12.5
    r = _twap(spark, [(0, 10), (30, 20), (40, 99)])
    assert r.twap == 12.5
    assert r.total_seconds == 40
    assert (r.n_obs, r.n_holds) == (3, 2)


def test_twap_burst_not_overweighted(spark):
    # a burst of quick readings moves TWAP far less than a plain mean
    r = _twap(spark, [(0, 1), (30, 100), (31, 100), (32, 100), (33, 1)])
    # holds: 1@30s, 100@1s x3 -> (30 + 300)/33 = 10.0
    assert r.twap == 10.0


def test_twap_single_reading_null(spark):
    r = _twap(spark, [(0, 5)])
    assert r.twap is None and r.n_holds == 0


def test_encoding_advisor_recommendations(spark):
    # col `rle`: long runs; col `dic`: few distincts, no runs;
    # col `pln`: all distinct, no runs
    rows = [
        Row(
            oid=i,
            rle="A" if i < 60 else "B",
            dic=f"v{i % 3}",
            pln=i,
        )
        for i in range(100)
    ]
    out = encoding_advisor(
        spark.createDataFrame(rows),
        ["rle", "dic", "pln"],
        ["oid"],
        bucket_size=1000,  # one shard: exact run counts
    )
    got = {r.column: r for r in out.collect()}
    assert got["rle"].n_runs == 2 and got["rle"].recommendation == "RLE"
    assert got["dic"].n_distinct == 3
    assert got["dic"].recommendation == "DICT"
    assert got["pln"].n_distinct == 100
    assert got["pln"].recommendation == "PLAIN"


def test_encoding_advisor_shard_boundary_overcount(spark):
    # one constant column split across 4 shards: runs = 4 (one per
    # shard first row), the documented deterministic bias
    rows = [Row(oid=i, c="X") for i in range(40)]
    out = encoding_advisor(
        spark.createDataFrame(rows), ["c"], ["oid"], bucket_size=10
    )
    (r,) = out.collect()
    assert r.n_runs == 4 and r.recommendation == "RLE"
