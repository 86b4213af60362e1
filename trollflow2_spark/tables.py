"""Test-table loaders.

The driver's synthetic tables (TESTDATA.md) live at
``/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet``. At cluster scale
these would be partitioned/bucketed tables; here they are single parquet
files, so the only scale concern is that readers keep projection/filter
pushdown intact (we always go through ``spark.read.parquet``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from trollflow2_spark.session import tune_for_oracle

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; applies the nanos-parquet conf first.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark only
    reads as a raw nanosecond BIGINT (under ``nanosAsLong``); we
    normalize it to TIMESTAMP_NTZ at microsecond precision — the same
    truncation DuckDB applies when casting TIMESTAMP_NS to TIMESTAMP —
    so all tables expose naive timestamps with identical values.
    """
    tune_for_oracle(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(CAST(ts DIV 1000 AS BIGINT)) AS TIMESTAMP_NTZ)"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def parallelism_floor(df: DataFrame, *cols: str) -> DataFrame:
    """Scale-adaptive parallelism floor for compute-heavy map kernels
    (guide §2.5 input skew): single-row-group fixture files scan as
    ONE task, serializing per-row work (tokenize/hash/decode) on one
    core. Projects to ``cols`` (shuffle only what the kernel needs,
    guide §2.3) and round-robin repartitions to the session's default
    parallelism — but ONLY when the scan has fewer partitions, so at
    cluster scale (inputs already many-partitioned) no shuffle is
    added. Row order is not preserved; callers must be order-free
    (per-row maps, order-free aggregations)."""
    if cols:
        df = df.select(*[F.col(c) for c in cols])
    # target = the session's shuffle-partition setting, NOT raw core
    # count: harnesses that right-size themselves (the streaming
    # replay sinks run micro-batches at 2 partitions) keep their
    # sizing, and production sessions size this to the cluster
    target = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df
