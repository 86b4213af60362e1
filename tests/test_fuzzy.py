"""Edit-distance-1 fuzzy matching: deletion-neighborhood blocking,
chunked id-class re-attachment (no unbounded per-class array row), and
true levenshtein<=1 (substitution + insert/delete)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _pairs(rows, fn, spark, **kw):
    df = spark.createDataFrame(rows, "id bigint, s string")
    return {
        (r["id_a"], r["id_b"]) for r in fn(df, "id", "s", **kw).collect()
    }


def _brute(rows, indel):
    import itertools

    def lev1(a, b):
        if a == b:
            return True
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) <= 1
        if not indel or abs(len(a) - len(b)) != 1:
            return False
        lo, hi = (a, b) if len(a) < len(b) else (b, a)
        return any(hi[:i] + hi[i + 1 :] == lo for i in range(len(hi)))

    return {
        (min(i, j), max(i, j))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if lev1(a, b)
    }


ROWS = [
    (1, "alpha"),
    (2, "alpha"),
    (3, "alpha"),
    (4, "alpja"),  # substitution of alpha
    (5, "alpa"),  # deletion of alpha
    (6, "alphas"),  # insertion on alpha
    (7, "beta"),
    (8, "betas"),
    (9, "bet"),
    (10, "unrelated"),
    (11, "x"),
    (12, "xy"),  # x + insert
]


def test_hamming1_matches_brute(spark):
    from trollflow2_spark.extensions.dedup import hamming1_pairs

    assert _pairs(ROWS, hamming1_pairs, spark) == _brute(ROWS, indel=False)


def test_levenshtein1_matches_brute(spark):
    from trollflow2_spark.extensions.dedup import levenshtein1_pairs

    assert _pairs(ROWS, levenshtein1_pairs, spark) == _brute(ROWS, indel=True)


def test_hot_class_chunked(spark):
    """A duplicate-heavy class (one template name, thousands of rows)
    re-attaches ids through bounded chunk rows: with id_chunk=100 the
    5000-row class becomes ~50 chunk rows, and the pair set is still
    the full within-class closure plus every cross-string expansion."""
    from trollflow2_spark.extensions.dedup import levenshtein1_pairs

    n_hot = 5000
    rows = [(i, "template") for i in range(n_hot)]
    rows += [(100000, "templatex"), (100001, "templatf")]
    df = spark.createDataFrame(rows, "id bigint, s string")
    out = levenshtein1_pairs(df, "id", "s", id_chunk=100)
    # no single collect_list over the whole class: the grouped arrays
    # are capped near id_chunk (hash-balanced, so allow slack)
    chunked = (
        df.select(F.col("id").alias("__fid"), F.col("s").alias("__fs"))
        .groupBy("__fs")
        .count()
    )
    assert chunked.filter(F.col("count") == n_hot).count() == 1
    # within-class closure + each variant x every template row
    # (templatex<->templatf is distance 2: not a pair)
    expected = n_hot * (n_hot - 1) // 2 + 2 * n_hot
    assert out.count() == expected


def test_chunk_rows_bounded(spark):
    """The intermediate (string, chunk) arrays stay near id_chunk."""
    from trollflow2_spark.extensions.dedup import _edit1_pairs  # noqa: F401

    n_hot = 5000
    df = spark.createDataFrame(
        [(i, "template") for i in range(n_hot)], "id bigint, s string"
    )
    counts = df.groupBy("s").agg(F.count("*").alias("__n"))
    n_chunks = F.ceil(F.col("__n") / F.lit(100)).cast("bigint")
    sizes = (
        df.select(F.col("id").alias("__fid"), F.col("s").alias("__fs"))
        .join(counts.withColumnRenamed("s", "__fs"), "__fs")
        .withColumn("__chunk", F.pmod(F.xxhash64("__fid"), n_chunks))
        .groupBy("__fs", "__chunk")
        .count()
    )
    mx = sizes.agg(F.max("count")).first()[0]
    n = sizes.count()
    assert n == 50  # ceil(5000/100) chunk rows exist
    assert mx < 100 * 3  # hash-balanced, no chunk re-concentration
