"""Streaming balance replay: the (sum, min-prefix) state must merge
across micro-batches to the exact batch closed form — including
deficits that SPAN a batch boundary."""

from trollflow2_spark.extensions.snapshot import balance_replay_state

SCHEMA = "seq long, event_type string, delta double"


def _run(spark, batches):
    out = balance_replay_state(
        spark, batches, SCHEMA, ["event_type"], "seq", "delta"
    )
    return {r.event_type: r for r in out.collect()}


def _rows(vals, key="a", start=0):
    return [
        {"seq": start + i, "event_type": key, "delta": float(v)}
        for i, v in enumerate(vals)
    ]


def test_deficit_spanning_batch_boundary(spark):
    # +5 then (batch cut) -10, +3: clamp happens INSIDE batch 2 at a
    # prefix offset carried from batch 1 — balance 3, not 5-10+3=-2
    got = _run(spark, [_rows([5]), _rows([-10, 3], start=1)])
    r = got["a"]
    assert r.final_balance == 3.0
    assert r.final_raw == -2.0
    assert r.n_batches == 2


def test_all_positive_matches_plain_sum(spark):
    got = _run(spark, [_rows([2, 3]), _rows([4], start=2)])
    assert got["a"].final_balance == 9.0 == got["a"].final_raw


def test_deficit_entirely_in_first_batch(spark):
    # -7 clamps immediately; later batches build from zero
    got = _run(spark, [_rows([-7]), _rows([4, 1], start=1)])
    assert got["a"].final_balance == 5.0


def test_keys_isolated_and_absent_batches(spark):
    b1 = _rows([5], key="a") + _rows([-2], key="b", start=100)
    b2 = _rows([-10], key="a", start=1)  # b absent in batch 2
    got = _run(spark, [b1, b2])
    assert got["a"].final_balance == 0.0 and got["a"].n_batches == 2
    assert got["b"].final_balance == 0.0 and got["b"].n_batches == 1


def test_retry_double_append_is_idempotent(spark):
    """A checkpoint-recovery foreachBatch retry re-appends the same
    batch-tagged delta; the resolver must dedup on the tag, so the
    doubled state resolves identically to the clean state."""
    import decimal

    from trollflow2_spark.extensions.snapshot import (
        merge_cms_state,
        resolve_balance_state,
    )

    dec = lambda v: decimal.Decimal(v).quantize(  # noqa: E731
        decimal.Decimal("0.000001")
    )
    rows = [
        ("a", 1, dec(5), dec(5), 0),
        ("a", 1, dec(-10), dec(-10), 1),
    ]
    schema = (
        "event_type string, n int, batch_min_prefix decimal(38,6),"
        " batch_sum decimal(38,6), __bid long"
    )
    clean = spark.createDataFrame(
        [(k, mp, s, b) for k, _n, mp, s, b in rows],
        "event_type string, batch_min_prefix decimal(38,6),"
        " batch_sum decimal(38,6), __bid long",
    )
    doubled = clean.unionByName(clean.where("__bid = 1"))
    want = {
        r.event_type: (r.final_balance, r.final_raw, r.n_batches)
        for r in resolve_balance_state(clean, ["event_type"]).collect()
    }
    got = {
        r.event_type: (r.final_balance, r.final_raw, r.n_batches)
        for r in resolve_balance_state(doubled, ["event_type"]).collect()
    }
    assert got == want == {"a": (0.0, -5.0, 2)}

    cms_clean = spark.createDataFrame(
        [(0, 3, 7, 0), (0, 3, 2, 1)],
        "row int, cell int, cnt long, __bid long",
    )
    cms_doubled = cms_clean.unionByName(cms_clean.where("__bid = 0"))
    w = {(r.row, r.cell): r.cnt for r in merge_cms_state(cms_clean).collect()}
    g = {(r.row, r.cell): r.cnt for r in merge_cms_state(cms_doubled).collect()}
    assert g == w == {(0, 3): 9}
