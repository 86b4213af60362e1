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
