"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q1-shaped pricing
summary) on sf0.001. ``queries()`` exposes every implemented operator
from SURVEY.md §2 plus the training-data extensions; ``oracle_sql()``
gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from trollflow2_spark.queries import q_q1_pricing_summary

    return q_q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+extensions)."""
    from trollflow2_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    from trollflow2_spark.oracles import all_oracles

    return all_oracles()
