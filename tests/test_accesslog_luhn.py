"""Semantics tests for combined-log parsing and the Luhn audit."""

from pyspark.sql import Row, functions as F

from trollflow2_spark.extensions.text import (
    card_brand,
    luhn_audit,
    luhn_valid,
    parse_access_log,
)

LINE = (
    '203.0.113.9 - u42 [10/Oct/2024:13:55:36 +0000] '
    '"GET /api/click/7 HTTP/1.1" 200 2326 '
    '"https://ref.example/x1" "Mozilla/5.0 (X11; Linux x86_64)"'
)


def _parse(spark, line):
    df = spark.createDataFrame([Row(line=line)])
    return parse_access_log(df).collect()[0]


def test_access_log_fields(spark):
    r = _parse(spark, LINE)
    assert r.err == 0
    assert r.ip == "203.0.113.9" and r.user == "u42"
    assert r.req_ts.strftime("%Y-%m-%d %H:%M:%S") == "2024-10-10 13:55:36"
    assert (r.method, r.path, r.proto) == ("GET", "/api/click/7", "HTTP/1.1")
    assert (r.status, r.bytes, r.status_class) == (200, 2326, 2)
    assert r.referer == "https://ref.example/x1" and r.is_bot == 0


def test_access_log_dash_conventions(spark):
    line = (
        '198.51.100.2 - - [01/Jan/2024:00:00:01 +0000] '
        '"POST /x HTTP/1.0" 301 - "-" "crawler-bot/2.1"'
    )
    r = _parse(spark, line)
    assert r.user is None and r.bytes is None and r.referer is None
    assert r.is_bot == 1 and r.status_class == 3


def test_access_log_malformed_flagged(spark):
    r = _parse(spark, "not a log line at all")
    assert r.err == 1 and r.ip is None and r.status is None


def _valid(spark, s):
    df = spark.createDataFrame([Row(s=s)])
    return df.select(luhn_valid(F.col("s")).alias("v")).collect()[0].v


def test_luhn_known_numbers(spark):
    assert _valid(spark, "79927398713") is True  # the canonical example
    assert _valid(spark, "79927398710") is False
    assert _valid(spark, "4111111111111111") is True  # classic test PAN
    assert _valid(spark, "4111111111111112") is False


def test_brand_prefixes(spark):
    df = spark.createDataFrame(
        [Row(s=s) for s in ["4111", "5500", "3400", "6011"]]
    )
    got = [r.b for r in df.select(card_brand(F.col("s")).alias("b")).collect()]
    assert got == ["visa", "mastercard", "amex", "other"]


def test_luhn_audit_extraction_and_floor(spark):
    text = (
        "short 123456789012 then 4111111111111111 and "
        "bad 4111111111111112 end"
    )
    out = luhn_audit(
        spark.createDataFrame([Row(doc_id=1, text=text)])
    ).collect()
    assert len(out) == 2  # the 12-digit run is below the 13 floor
    by_mask = {r.pan_masked: r for r in out}
    ok = by_mask["411111******1111"]
    assert ok.luhn_valid == 1 and ok.brand == "visa" and ok.pan_len == 16
    assert by_mask["411111******1112"].luhn_valid == 0
