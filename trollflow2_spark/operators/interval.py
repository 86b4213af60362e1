"""Interval (range) join: point-in-interval matching without a cross
product.

Spark has no native range join, and the naive formulation —
``left.join(right, (ts >= start) & (ts <= end))`` — is a
BroadcastNestedLoopJoin (every row against every interval) that stops
scaling the moment the interval side outgrows a broadcast. The
standard fix (the same strategy Databricks' range-join hint and
KAYAK-style interval indexes use) is time bucketing:

- points map to bucket ``floor(ts / W)``;
- each interval explodes to EVERY bucket it overlaps
  (``sequence(floor(start/W), floor(end/W))``);
- a plain shuffled equi-join on the bucket id produces candidates;
- the exact range predicate keeps true matches.

The equi-join distributes like any other shuffle join, so skew/AQE
machinery applies. The explosion factor is ``interval_len / W + 1``
per interval — pick ``W`` near the typical interval length so each
interval lands in O(1) buckets. Candidates per point are bounded by
the intervals genuinely overlapping its bucket, not the whole table.

Reference parity: the reference engine has no interval join either —
its ``covers``/time checks (`/root/reference/trollflow2/plugins/
__init__.py` metadata gates) are per-scene scalar comparisons. This
operator generalizes that gate to table-vs-table matching at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` (timestamp ``ts_col``) to ``intervals``
    (``[start_col, end_col]``, inclusive) on containment.

    Returns the joined DataFrame carrying all columns from both sides
    (the bucket key is dropped). ``how='inner'`` keeps matched pairs;
    ``'left_semi'`` filters points to those inside ANY interval
    without duplicating them.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError("interval_join supports how='inner'|'left_semi'")
    w = int(bucket_seconds)
    if w <= 0:
        raise ValueError("bucket_seconds must be positive")

    def _bucket(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / w)

    pts = points.withColumn("__ibucket", _bucket(F.col(ts_col)))
    ivs = intervals.withColumn(
        "__ibucket",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col)), _bucket(F.col(end_col))
            )
        ),
    )
    contained = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) <= F.col(end_col)
    )
    if how == "left_semi":
        return pts.join(
            ivs,
            on=[pts["__ibucket"] == ivs["__ibucket"], contained],
            how="left_semi",
        ).drop("__ibucket")
    out = pts.join(
        ivs.withColumnRenamed("__ibucket", "__ibucket_r"),
        on=[F.col("__ibucket") == F.col("__ibucket_r"), contained],
        how="inner",
    )
    return out.drop("__ibucket", "__ibucket_r")
