"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting handles joins; for *aggregations* over skewed
keys (a boilerplate-dup content hash owning 1% of a 100 TB corpus, a
power user owning half a session log), a single groupBy sends the whole
hot key to one task. The standard fix is salting: aggregate on
``(key, salt)`` first (spreads the hot key over ``n_salts`` tasks), then
re-aggregate on ``key``. Both stages keep map-side partial aggregation,
so total shuffled rows grow only by the salt fanout on unique keys.

Used when a dedup/count pipeline knows its key distribution is heavy-
tailed; the cost (a second tiny shuffle) is the insurance premium.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from trollflow2_spark.operators import register_stage

# Aggregates that re-combine with themselves across salt partitions.
_MERGE = {
    "count": F.sum,  # counts add up
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


@register_stage("salted_agg")
def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation over possibly-skewed ``keys``.

    ``aggs``: output name -> (agg fn in {count,sum,min,max}, column).
    Example::

        salted_agg(docs.select(F.md5("text").alias("h"), "doc_id"),
                   ["h"],
                   {"n_copies": ("count", "doc_id"),
                    "canonical_id": ("min", "doc_id")})

    Stage 1 groups by (keys..., salt) with salt = crc32(random-free
    deterministic spread over a row component is wrong — salt must be
    data-independent per row), here ``pmod(monotonically_increasing_id,
    n_salts)``; stage 2 merges partials per key. Only decomposable
    aggregates are supported — avg must be expressed as sum+count by the
    caller (exactly how Spark's own partial aggregation does it).
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(
                f"{name}: {fn!r} is not decomposable; use sum+count instead"
            )
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(int(n_salts)))
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            getattr(F, fn)(F.col(col)).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[
            _MERGE[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )
    return stage2
