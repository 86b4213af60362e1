"""Semantics tests for the bitmap index and seasonal anomalies."""

from pyspark.sql import Row

from trollflow2_spark.extensions.profile import (
    bitmap_contingency,
    bitmap_index,
    seasonal_anomalies,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows)


def test_bitmap_masks_and_counts(spark):
    rows = [Row(oid=i, flag="A" if i % 2 == 0 else "B", st="X")
            for i in range(10)]
    df = _mk(spark, rows)
    idx = bitmap_index(df, "flag", ["oid"], bucket_size=1000)
    got = {(r.value, r.shard, r.word): r for r in idx.collect()}
    # 10 rows -> one word; A occupies even positions 0,2,4,6,8
    a = got[("A", 0, 0)]
    assert a.n_rows == 5
    assert a.mask == sum(1 << b for b in (0, 2, 4, 6, 8))


def test_bitmap_word_rollover(spark):
    # 70 rows with 62-bit words -> positions spill into word 1
    rows = [Row(oid=i, flag="A", st="X") for i in range(70)]
    idx = bitmap_index(_mk(spark, rows), "flag", ["oid"], bucket_size=1000)
    got = {r.word: r for r in idx.collect()}
    assert got[0].n_rows == 62 and got[1].n_rows == 8
    assert got[0].mask == (1 << 62) - 1
    assert got[1].mask == (1 << 8) - 1


def test_bitmap_contingency_matches_direct(spark):
    rows = [
        Row(oid=i, flag="A" if i % 2 == 0 else "B",
            st="X" if i % 3 == 0 else "Y")
        for i in range(200)
    ]
    df = _mk(spark, rows)
    order = ["oid", "flag", "st"]
    ia = bitmap_index(df, "flag", order, bucket_size=50)
    ib = bitmap_index(df, "st", order, bucket_size=50)
    got = {
        (r.value_a, r.value_b): r.n_rows
        for r in bitmap_contingency(ia, ib).collect()
    }
    direct = {
        (r.flag, r.st): r.n
        for r in df.groupBy("flag", "st").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert got == direct


def test_seasonal_anomaly_planted_spike(spark):
    # seasonal series + deterministic noise (a noiseless series has
    # MAD 0 and the k*MAD cut degenerates) + one huge spike: the
    # spike and at most its MA-window neighbours flag
    period, cycles = 4, 10
    seasonal = [5.0, -5.0, 2.0, -2.0]
    rows = []
    for i in range(period * cycles):
        y = 100.0 + seasonal[i % period] + (i % 7) * 0.5  # noise
        if i == 21:
            y += 500.0  # the anomaly
        rows.append(Row(k="a", t=i, phase=i % period, y=y))
    out = seasonal_anomalies(
        _mk(spark, rows), ["k"], "t", "phase", "y", period=period, k=6.0
    ).collect()
    flagged = {r.bucket: r for r in out}
    assert 21 in flagged
    # the spike carries the dominant residual by far
    assert abs(flagged[21].residual) == max(
        abs(r.residual) for r in out
    )
    # collateral flags are explainable: rows inside the spike's MA
    # window, or rows sharing the spike's PHASE (one 500-unit outlier
    # drags a mean over 8 observations — the phase mean is a mean,
    # not a median, and that contamination is visible by design)
    assert all(
        abs(r.bucket - 21) <= period // 2 or r.phase == 21 % period
        for r in out
    )
