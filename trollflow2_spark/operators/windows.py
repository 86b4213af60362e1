"""Window-function operators: top-1-per-group patterns.

The reference's two window-shaped semantics (SURVEY §2.7): nearest-
neighbor keeps the top-1 source pixel per target pixel, and product
loading prefers the highest resolution per product
(``/root/reference/trollflow2/plugins/__init__.py:63-68``,
``doc/source/plugins.rst:60-62``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from trollflow2_spark.operators import register_stage


@register_stage("top1_per_group")
def top1_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_by: Sequence[Column],
    keep_rank_col: bool = False,
) -> DataFrame:
    """Keep exactly one row per group, ordered by ``order_by`` (callers
    must include a unique tie-breaker for determinism).

    Scale note: ``row_number`` over a partitioned window shuffles once on
    the partition keys; with AQE the skewed-partition split handles hot
    groups. For top-1 specifically, ``max_by``-style aggregation avoids
    the full sort, but the window form generalizes to top-k.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return out if keep_rank_col else out.drop("__rn")


@register_stage("topk_per_group")
def topk_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
