"""Benchmark-contamination detection: held-out vs training-corpus overlap.

Before training on a 100 TB corpus you must know how much of your eval
set leaks into it. Two tiers, mirroring the dedup family's design:

- :func:`exact_overlap` — held-out docs whose normalized text appears
  verbatim in the corpus (hash equi-join on the text digest; the raw
  text never shuffles).
- :func:`contamination_scores` — per held-out doc, the fraction of its
  word n-gram shingles that occur ANYWHERE in the corpus; score =
  matched / total. A doc quoted wholesale scores ~1; topical overlap
  scores low.

100 TB shape: the held-out set is an *eval set* — small by definition —
so its shingle-hash set broadcasts, and the corpus's exploded shingles
are filtered MAP-SIDE against it (broadcast semi-join inside the scan
stage). Only the surviving matches (bounded by the held-out set size)
ever shuffle, for one distinct. The corpus never materializes a global
distinct-shingle set.

Portable ``hash64`` keeps both oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from trollflow2_spark.functions.hashing import hash64, word_shingles

HashFn = type(hash64)


def _norm_text(col: Column) -> Column:
    """Whitespace-collapsed, lowercased text (the exact-match key)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_overlap(
    corpus: DataFrame,
    held_out: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=hash64,
) -> DataFrame:
    """Held-out rows whose normalized text occurs verbatim in the corpus
    (id + the digest, for auditability)."""
    digest = lambda df: df.select(  # noqa: E731
        F.col(id_col), hash_fn(_norm_text(F.col(text_col))).alias("text_hash")
    )
    held = digest(held_out)
    # broadcast the small held-out digest set; the corpus filters
    # map-side and only its (tiny) matching digests reach the distinct
    held_set = F.broadcast(held.select("text_hash").distinct())
    matched = (
        digest(corpus)
        .select("text_hash")
        .join(held_set, "text_hash", "left_semi")
        .distinct()
    )
    return held.join(F.broadcast(matched), "text_hash", "left_semi").select(
        id_col, "text_hash"
    )


def contamination_scores(
    corpus: DataFrame,
    held_out: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 8,
    hash_fn=hash64,
    round_digits: int = 6,
) -> DataFrame:
    """Per held-out doc: fraction of its distinct word n-gram shingles
    present anywhere in the corpus (0 = clean, 1 = fully contained).

    Output: (id, n_shingles, n_matched, contamination).
    """
    def shingle_hashes(df: DataFrame, keep_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if keep_id else []
        sh = df.select(
            *cols, F.explode(word_shingles(F.col(text_col), shingle_words)).alias("__sh")
        )
        return sh.select(*cols, hash_fn(F.col("__sh")).alias("__h")).distinct()

    held = shingle_hashes(held_out, keep_id=True)
    held_set = F.broadcast(held.select("__h").distinct())
    # corpus shingles filter map-side against the broadcast held set;
    # only hashes the eval set actually contains survive to the distinct
    corpus_matched = (
        corpus.select(
            F.explode(word_shingles(F.col(text_col), shingle_words)).alias("__sh")
        )
        .select(hash_fn(F.col("__sh")).alias("__h"))
        .join(held_set, "__h", "left_semi")
        .distinct()
    )
    matched = held.join(
        F.broadcast(corpus_matched.withColumn("__m", F.lit(1))), "__h", "left"
    )
    return (
        matched.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__m").alias("n_matched"),
        )
        .withColumn(
            "contamination",
            F.round(
                F.col("n_matched").cast("double") / F.col("n_shingles"),
                round_digits,
            ),
        )
    )
