"""Portable deterministic hashing.

Engines disagree on their native hash functions (Spark's xxhash64 !=
DuckDB's hash), so every hash that must be oracle-reproducible is built
from md5 — identical everywhere — truncated to 60 bits (15 hex chars,
always fits a signed 64-bit int).

Spark:   CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
DuckDB:  CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

Seeded variants hash ``x || ':' || seed`` so one expression family yields
an arbitrary number of independent hash functions (minhash banding).

Scale note: md5 is ~3-5x slower than xxhash64 but still JVM-side and
codegen'd; for pure-Spark paths (no oracle) swap `hash64` for
``F.xxhash64`` — the operators below take the hash expression as an
injectable so production can use the fast one.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hash64(col: Column | str, seed: int | None = None) -> Column:
    """60-bit portable hash of a string column (md5-derived, seedable)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(c, F.lit(f":{seed}"))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def fast_hash64(col: Column | str, seed: int | None = None) -> Column:
    """Production fast path: JVM-native ``xxhash64`` (one codegen'd call,
    ~3-5x cheaper than the md5 family). NOT oracle-reproducible — DuckDB
    has no xxhash64 — so use it only where no SQL oracle must match
    (the contract queries keep :func:`hash64`). Seeded variants hash the
    seed in as an extra column, which xxhash64 folds into one stream."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        return F.xxhash64(c, F.lit(seed))
    return F.xxhash64(c)


def HASH64_SQL(expr: str, seed: int | None = None) -> str:
    """The same hash as :func:`hash64`, as DuckDB SQL text."""
    if seed is not None:
        expr = f"({expr} || ':{seed}')"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def hash64_lane(col: Column | str, seed: int, lane: int) -> Column:
    """Two independent 60-bit hashes per md5 digest: lane 0 reads hex
    chars 1-15, lane 1 chars 17-31 of ``md5(x || ':' || seed)``. A
    32-hex digest carries 128 bits, so one seeded md5 call funds two
    hash functions — the minhash signature family needs half the md5
    work of the one-seed-per-hash form, at identical portability (the
    SQL twin slices the same substring)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.concat(c, F.lit(f":{seed}"))
    return F.conv(F.substring(F.md5(c), 1 + lane * 16, 15), 16, 10).cast("bigint")


def HASH64_LANE_SQL(expr: str, seed: int, lane: int) -> str:
    """The same hash as :func:`hash64_lane`, as DuckDB SQL text."""
    return (
        f"CAST(('0x' || substr(md5(({expr} || ':{seed}')), {1 + lane * 16}, 15))"
        " AS BIGINT)"
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties removed (portable: DuckDB
    ``list_filter(regexp_split_to_array(trim(x), '\\s+'), t -> t <> '')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def TOKENS_SQL(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(trim({expr}), '\\s+'), t -> t <> '')"
    )


def word_shingles(col: Column | str, n: int) -> Column:
    """Word n-gram shingles as an array of strings (space-joined).

    Docs shorter than ``n`` words yield a single shingle of all their
    words, so no document hashes to an empty set.

    The token array is bound once through a single-element-array
    ``transform`` (lambda variables evaluate once per element): naively
    referencing the split expression inside the index lambda re-splits
    the text for every shingle index — O(words²) per document, measured
    6x slower at sf0.1.
    """
    toks = tokens(col)

    def shingles_of(t: Column) -> Column:
        k = F.greatest(F.size(t) - F.lit(n - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(t, i + 1, n), " "),
        )

    return F.get(F.transform(F.array(toks), shingles_of), 0)


def WORD_SHINGLES_SQL(expr: str, n: int) -> str:
    """DuckDB equivalent of :func:`word_shingles` (1-based list slicing)."""
    toks = TOKENS_SQL(expr)
    return (
        f"list_transform(range(greatest(len({toks}) - {n - 1}, 1)), "
        f"i -> array_to_string(list_slice({toks}, i + 1, i + {n}), ' '))"
    )
