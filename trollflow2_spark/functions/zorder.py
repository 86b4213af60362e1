"""Z-order (Morton) clustering keys for multi-dimensional scan pruning.

Parquet prunes row groups with per-column min/max statistics, but a
table sorted on ONE column has useless statistics for every other
column: a 2-D predicate (`user X in time window Y`) still reads the
whole corpus. Interleaving the bits of both dimensions into one sort
key (the Delta Lake ``OPTIMIZE ZORDER BY`` / Hive clustering strategy)
makes files/row groups compact in EVERY interleaved dimension at once,
so min/max pruning works for each of them — the difference between
reading ~1/N of the data and reading all of it, on 100 TB.

The key is a pure Column expression (shift/mask/or — whole-stage
codegen, no UDF), so computing it costs one projection; the layout
write is `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)`,
which is exactly one range shuffle of the rows being written.

The bit interleave is portable integer arithmetic, replayed verbatim
by the DuckDB oracle (`zorder_sql`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "zorder_sql", "zorder_write"]


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each non-negative
    integer column: result bit ``i*n + j`` is bit ``i`` of column
    ``j``. Callers bucket raw values into the ``[0, 2**bits)`` range
    first (e.g. ``user_id % 1024``, minutes-since-epoch)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least two columns")
    if bits * n > 63:
        raise ValueError("bits * n_cols must fit a signed 64-bit key")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
          for c in cols]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return key


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as portable SQL (DuckDB/ANSI bit ops)
    — the oracle side of :func:`zorder_key`."""
    n = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered on the Z-order of ``cols``: one range
    shuffle on the key, sorted within each output file, key dropped
    from the stored schema. Each file then covers a compact hyper-
    rectangle of the interleaved dimensions, so parquet footer min/max
    prune multi-dimensional predicates."""
    keyed = df.withColumn("__zkey", zorder_key(cols, bits=bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
