"""Bucketed (co-located) tables for recurring fact-fact joins.

SCALE.md (Joins) names pre-bucketing as the 100 TB fix for the
lineitem×orders-class shuffle: writing both fact tables bucketed on the
join key with the same bucket count lets Spark plan the join with NO
exchange — each bucket pair joins locally. This module is the concrete
path: a writer that registers bucketed tables and a helper that reads
them back for shuffle-free joins (pinned by
``tests/test_plans.py::test_bucketed_join_has_no_exchange``).

The reference has no analog (single-node engine); this is engine-level
scale work layered under the same query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table. Joins/aggregations on ``bucket_cols`` between tables sharing
    ``n_buckets`` need no shuffle; sorted buckets additionally skip the
    sort of a sort-merge join."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(int(n_buckets), *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts the plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
