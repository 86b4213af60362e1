"""CIDR longest-prefix enrichment (`extensions/net.py`)."""

from pyspark.sql import functions as F

from trollflow2_spark.extensions.net import (
    cidr_bounds,
    cidr_enrich,
    ipv4_to_long,
    long_to_ipv4,
)


def test_ipv4_roundtrip_and_malformed(spark):
    rows = spark.createDataFrame(
        [
            ("0.0.0.0",),
            ("255.255.255.255",),
            ("10.3.128.9",),
            ("1.2.3",),  # missing octet
            ("1.2.3.4.5",),  # extra octet
            ("1.2.3.x",),  # non-numeric
            ("1.2.3.256",),  # out of range
        ],
        ["ip"],
    )
    out = rows.select(
        "ip",
        ipv4_to_long(F.col("ip")).alias("v"),
        long_to_ipv4(ipv4_to_long(F.col("ip"))).alias("back"),
    ).collect()
    by_ip = {r["ip"]: r for r in out}
    assert by_ip["0.0.0.0"]["v"] == 0
    assert by_ip["255.255.255.255"]["v"] == 0xFFFFFFFF
    assert by_ip["10.3.128.9"]["v"] == (10 << 24) + (3 << 16) + (128 << 8) + 9
    for good in ("0.0.0.0", "255.255.255.255", "10.3.128.9"):
        assert by_ip[good]["back"] == good
    for bad in ("1.2.3", "1.2.3.4.5", "1.2.3.x", "1.2.3.256"):
        assert by_ip[bad]["v"] is None


def test_cidr_bounds_edges(spark):
    rows = spark.createDataFrame(
        [
            ("10.3.7.9/16",),  # base not aligned: must mask to 10.3.0.0
            ("192.168.1.5/32",),  # single address
            ("0.0.0.0/0",),  # whole space: the long-shift edge
            ("10.0.0.0/8",),
            ("10.0.0.0/33",),  # invalid prefix
        ],
        ["cidr"],
    )
    out = {
        r["cidr"]: r
        for r in rows.select("cidr", cidr_bounds(F.col("cidr")).alias("b")).select(
            "cidr", "b.start", "b.end", "b.prefix_len"
        ).collect()
    }
    assert out["10.3.7.9/16"]["start"] == (10 << 24) + (3 << 16)
    assert out["10.3.7.9/16"]["end"] == (10 << 24) + (3 << 16) + 0xFFFF
    one = (192 << 24) + (168 << 16) + (1 << 8) + 5
    assert (out["192.168.1.5/32"]["start"], out["192.168.1.5/32"]["end"]) == (one, one)
    assert out["0.0.0.0/0"]["start"] == 0
    assert out["0.0.0.0/0"]["end"] == 0xFFFFFFFF
    assert out["10.0.0.0/8"]["end"] - out["10.0.0.0/8"]["start"] == (1 << 24) - 1
    assert out["10.0.0.0/33"]["start"] is None


def test_longest_prefix_wins_and_unmatched_null(spark):
    ranges = spark.createDataFrame(
        [
            ("10.0.0.0/8", "broad"),
            ("10.5.0.0/16", "site"),
            ("10.5.128.0/17", "upper"),
        ],
        ["cidr", "label"],
    )
    points = spark.createDataFrame(
        [
            (1, "10.5.200.1"),  # matches all three -> /17
            (2, "10.5.3.1"),  # /8 and /16 -> /16
            (3, "10.9.0.1"),  # /8 only
            (4, "172.16.0.1"),  # no match -> NULL payload
        ],
        ["pid", "ip"],
    )
    points = points.select("pid", ipv4_to_long(F.col("ip")).alias("ip_long"))
    got = {
        r["pid"]: (r["cidr"], r["prefix_len"], r["label"])
        for r in cidr_enrich(points, ranges, id_col="pid").collect()
    }
    assert got[1] == ("10.5.128.0/17", 17, "upper")
    assert got[2] == ("10.5.0.0/16", 16, "site")
    assert got[3] == ("10.0.0.0/8", 8, "broad")
    assert got[4] == (None, None, None)
    assert len(got) == 4  # one row per point, even with 3 overlapping matches


def test_cidr_enrich_plan_is_hash_join(spark):
    """The /16-grid explode must make the match an equi hash join —
    a BETWEEN-only broadcast join would plan as
    BroadcastNestedLoopJoin, O(points x ranges) at scale."""
    ranges = spark.createDataFrame(
        [("10.0.0.0/8", "a"), ("10.5.0.0/16", "b")], ["cidr", "label"]
    )
    points = spark.range(100).select(
        F.col("id").alias("pid"),
        ((F.lit(10) * 16777216) + F.col("id")).alias("ip_long"),
    )
    out = cidr_enrich(points, ranges, id_col="pid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
