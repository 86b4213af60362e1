"""Sampling, splitting, mixing, and packing for training-data pipelines.

The corpus-building primitives every LLM data pipeline needs between
dedup and tokenization:

- :func:`deterministic_split` — stable train/val/test assignment by a
  portable hash of the document id. No RNG state, no ordering
  dependence: the same doc lands in the same split on any engine, any
  cluster size, any run (the property ``df.randomSplit`` cannot give).
- :func:`stratified_sample` — per-stratum keep rates (e.g. downsample
  crawl, upweight reference text) via the same hash: the
  mixture-weighting primitive. Rates are exact in expectation and
  deterministic per document.
- :func:`pack_sequences` — token-budget packing: documents accumulate
  into bins of ~``budget`` tokens per shard (window cumulative sum →
  bin id). Sharding keeps the window partitioned — nothing global —
  which is how packing parallelizes at 100 TB.

All pure Column algebra over the portable ``hash64`` (md5-derived), so
every operator is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from trollflow2_spark.functions.hashing import hash64

#: hash buckets for rate thresholds: rates are exact to 1/10000
RATE_BUCKETS = 10_000


def _rate_bucket(id_col: Column, seed: int | None) -> Column:
    return F.pmod(hash64(id_col.cast("string"), seed=seed), F.lit(RATE_BUCKETS))


def deterministic_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int | None = 7,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given fractions.

    The bucket is ``portable_hash(id) % 10000``; cumulative fraction
    thresholds carve it into splits, so fractions are exact to 0.01 %.
    Fractions must sum to ~1 (a trailing remainder falls into the last
    split). Map-side only: no shuffle, no RNG.
    """
    if not fractions:
        raise ValueError("need at least one split fraction")
    bucket = _rate_bucket(F.col(id_col), seed)
    names = list(fractions)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += float(fractions[name])
        cond = bucket < int(round(cum * RATE_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: int | None = 11,
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically.

    ``rates`` maps stratum value -> keep fraction in [0, 1]; strata not
    listed use ``default_rate``. The filter is a pure Column predicate
    evaluated map-side inside the scan stage (whole-stage codegen) — a
    1 % sample of a 100 TB stratum is one pass with no shuffle. (The
    hash expression itself can't become a parquet PushedFilter; simple
    stratum-membership filters composed with it still push down.)
    """
    bucket = _rate_bucket(F.col(id_col), seed)
    rate: Column = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    threshold = F.round(rate * RATE_BUCKETS, 0).cast("int")
    return df.filter(bucket < threshold)


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: Column | str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: int | None = 13,
) -> DataFrame:
    """Assign documents to token-budget bins (sequence packing).

    Documents are sharded by a portable hash (``n_shards`` independent
    packers — the window never goes global) and, within a shard, packed
    in id order by cumulative token count: ``bin = floor((cumsum -
    n_tokens) / budget)`` — each bin targets ``budget`` tokens; a
    document longer than the leftover space spills into its bin anyway
    (standard concat-then-chunk semantics — downstream chunking handles
    the overflow, exactly like fixed-context pretraining packers).

    Output adds ``shard``, ``bin``, ``cum_tokens`` (cumulative tokens in
    the shard, inclusive). Deterministic: same corpus -> same packing,
    on any engine (window ordered by the unique id).
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    shard = F.pmod(hash64(F.col(id_col).cast("string"), seed=seed), F.lit(n_shards))
    out = df.withColumn("shard", shard.cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("cum_tokens", F.sum(tok).over(w).cast("bigint"))
    return out.withColumn(
        "bin",
        F.floor((F.col("cum_tokens") - tok) / F.lit(int(budget))).cast("int"),
    )
