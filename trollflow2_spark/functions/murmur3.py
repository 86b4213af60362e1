"""MurmurHash3 x86 32-bit (public domain algorithm, Austin Appleby)
— the hash behind Iceberg's ``bucket[N]`` partition transform.

Iceberg spec (Partition Transforms + Appendix B "32-bit Hash
Requirements"): ``bucket[N](v) = (murmur3_x86_32(bytes(v), seed=0)
& Integer.MAX_VALUE) % N`` where int/long hash their 8-byte
LITTLE-endian representation (so int 34 and long 34 bucket
identically — spec requirement), strings hash their UTF-8 bytes,
dates hash their days-from-epoch as a long, timestamps their
micros-from-epoch as a long.

Pure Python over bytes — runs vectorized inside Arrow `pandas_udf`
batches; conformance-pinned in tests against the spec's published
example hashes (34 -> 2017239379, "iceberg" -> 1210000089, …).
"""

from __future__ import annotations

import struct


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Returns the SIGNED 32-bit hash (Java int semantics, matching
    the Iceberg spec's published values)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounds = n // 4
    for i in range(rounds):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[rounds * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


def iceberg_hash_long(v: int) -> int:
    """int/long/date/timestamp all hash their value as an 8-byte
    little-endian long (two's complement)."""
    return murmur3_x86_32(struct.pack("<q", int(v)))


def iceberg_hash_string(s: str) -> int:
    return murmur3_x86_32(s.encode("utf-8"))


def iceberg_bucket_long(v: int, n: int) -> int:
    return (iceberg_hash_long(v) & 0x7FFFFFFF) % int(n)


def iceberg_bucket_string(s: str, n: int) -> int:
    return (iceberg_hash_string(s) & 0x7FFFFFFF) % int(n)
