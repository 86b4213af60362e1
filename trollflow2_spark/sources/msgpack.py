"""MessagePack intake: a from-scratch wire-format reader.

Log shippers (fluentd/fluent-bit), Redis streams, and many RPC stacks
emit MessagePack, so a crawl/log lake ingests it as routinely as JSON
— but no msgpack library ships in this container and the reference
(trollflow2) reads only posttroll messages. This module implements
the public spec (https://msgpack.org, format spec v5): every type
code needed for real telemetry — nil/bool, the full int family
(positive/negative fixint, uint8-64, int8-64), float32/64,
fixstr/str8/16/32, bin8/16/32, fixarray/array16/32, fixmap/map16/32,
plus fixext/ext skip-through — with STRICT bounds checking: a
truncated or unknown-code payload raises ``MsgpackError`` and lands
in the quarantine taxonomy instead of producing silent garbage.

Spark shape: blobs decode in an Arrow ``mapInPandas`` kernel (bytes
force Python; one pass, map-side only) to a CANONICAL JSON string —
sorted keys, no float formatting surprises for integer-valued data —
which downstream queries cut up with the native ``from_json``/
``get_json_object`` machinery, keeping everything after the byte
boundary JVM-side.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["MsgpackError", "unpack", "pack", "read_msgpack"]


class MsgpackError(ValueError):
    """Malformed msgpack: truncation, unknown type code, trailing
    bytes, or non-string map key (JSON-incompatible)."""


def _need(b: bytes, pos: int, n: int) -> None:
    if pos + n > len(b):
        raise MsgpackError(f"truncated: need {n} bytes at {pos}")


def _unpack_at(b: bytes, pos: int):
    _need(b, pos, 1)
    c = b[pos]
    pos += 1
    if c <= 0x7F:  # positive fixint
        return c, pos
    if c >= 0xE0:  # negative fixint
        return c - 0x100, pos
    if 0x80 <= c <= 0x8F:  # fixmap
        return _map(b, pos, c & 0x0F)
    if 0x90 <= c <= 0x9F:  # fixarray
        return _array(b, pos, c & 0x0F)
    if 0xA0 <= c <= 0xBF:  # fixstr
        return _str(b, pos, c & 0x1F)
    if c == 0xC0:
        return None, pos
    if c == 0xC2:
        return False, pos
    if c == 0xC3:
        return True, pos
    if c == 0xC4 or c == 0xC5 or c == 0xC6:  # bin8/16/32
        w = 1 << (c - 0xC4)
        _need(b, pos, w)
        n = int.from_bytes(b[pos:pos + w], "big")
        pos += w
        _need(b, pos, n)
        return b[pos:pos + n], pos + n
    if c == 0xCA:  # float32
        _need(b, pos, 4)
        return struct.unpack(">f", b[pos:pos + 4])[0], pos + 4
    if c == 0xCB:  # float64
        _need(b, pos, 8)
        return struct.unpack(">d", b[pos:pos + 8])[0], pos + 8
    if 0xCC <= c <= 0xCF:  # uint8/16/32/64
        w = 1 << (c - 0xCC)
        _need(b, pos, w)
        return int.from_bytes(b[pos:pos + w], "big"), pos + w
    if 0xD0 <= c <= 0xD3:  # int8/16/32/64
        w = 1 << (c - 0xD0)
        _need(b, pos, w)
        return int.from_bytes(b[pos:pos + w], "big", signed=True), pos + w
    if 0xD4 <= c <= 0xD8:  # fixext1/2/4/8/16: returned as (type, bytes)
        n = 1 << (c - 0xD4)
        _need(b, pos, 1 + n)
        return {"__ext__": b[pos], "data": b[pos + 1:pos + 1 + n].hex()}, (
            pos + 1 + n
        )
    if c == 0xD9 or c == 0xDA or c == 0xDB:  # str8/16/32
        w = 1 << (c - 0xD9)
        _need(b, pos, w)
        n = int.from_bytes(b[pos:pos + w], "big")
        pos += w
        return _str(b, pos, n)
    if c == 0xDC or c == 0xDD:  # array16/32
        w = 2 << (c - 0xDC)
        _need(b, pos, w)
        n = int.from_bytes(b[pos:pos + w], "big")
        return _array(b, pos + w, n)
    if c == 0xDE or c == 0xDF:  # map16/32
        w = 2 << (c - 0xDE)
        _need(b, pos, w)
        n = int.from_bytes(b[pos:pos + w], "big")
        return _map(b, pos + w, n)
    raise MsgpackError(f"unknown type code 0x{c:02x} at {pos - 1}")


def _str(b: bytes, pos: int, n: int):
    _need(b, pos, n)
    try:
        return b[pos:pos + n].decode("utf-8"), pos + n
    except UnicodeDecodeError as e:
        raise MsgpackError(f"invalid utf-8 in str at {pos}") from e


def _array(b: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _unpack_at(b, pos)
        out.append(v)
    return out, pos


def _map(b: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _unpack_at(b, pos)
        if not isinstance(k, str):
            raise MsgpackError(f"non-string map key {k!r}")
        v, pos = _unpack_at(b, pos)
        out[k] = v
    return out, pos


def unpack(b: bytes):
    """Decode ONE msgpack object; trailing bytes are an error (the
    framing contract for one-record-per-blob intake)."""
    v, pos = _unpack_at(bytes(b), 0)
    if pos != len(b):
        raise MsgpackError(f"{len(b) - pos} trailing bytes")
    return v


def pack(v) -> bytes:
    """Canonical encoder (fixture/authoring side + round-trip tests):
    smallest representation per the spec's recommendation, map keys
    in insertion order."""
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if v >= 0:
            for code, w in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if v < 1 << (8 * w):
                    return bytes([code]) + v.to_bytes(w, "big")
            raise MsgpackError("uint too large")
        for code, w in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * w - 1)) <= v:
                return bytes([code]) + v.to_bytes(w, "big", signed=True)
        raise MsgpackError("int too small")
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        e = v.encode("utf-8")
        if len(e) <= 31:
            return bytes([0xA0 | len(e)]) + e
        for code, w in ((0xD9, 1), (0xDA, 2), (0xDB, 4)):
            if len(e) < 1 << (8 * w):
                return bytes([code]) + len(e).to_bytes(w, "big") + e
    if isinstance(v, (bytes, bytearray)):
        e = bytes(v)
        for code, w in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if len(e) < 1 << (8 * w):
                return bytes([code]) + len(e).to_bytes(w, "big") + e
    if isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            head = bytes([0x90 | n])
        elif n < 1 << 16:
            head = b"\xdc" + n.to_bytes(2, "big")
        else:
            head = b"\xdd" + n.to_bytes(4, "big")
        return head + b"".join(pack(x) for x in v)
    if isinstance(v, dict):
        n = len(v)
        if n <= 15:
            head = bytes([0x80 | n])
        elif n < 1 << 16:
            head = b"\xde" + n.to_bytes(2, "big")
        else:
            head = b"\xdf" + n.to_bytes(4, "big")
        return head + b"".join(pack(str(k)) + pack(x) for k, x in v.items())
    raise MsgpackError(f"unsupported type {type(v).__name__}")


MSGPACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("json", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def read_msgpack(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Blobs -> canonical JSON strings (sorted keys; bytes values
    rendered as hex strings) + an ``error`` column for the quarantine
    taxonomy (NULL json on malformed input, never an exception out of
    the scan). One Arrow ``mapInPandas`` pass; everything downstream
    of the byte boundary is native ``from_json`` Column work."""

    def kernel(batches: Iterator) -> Iterator:
        import json

        import pandas as pd

        def canon(v):
            if isinstance(v, bytes):
                return v.hex()
            if isinstance(v, dict):
                return {k: canon(x) for k, x in v.items()}
            if isinstance(v, list):
                return [canon(x) for x in v]
            return v

        for pdf in batches:
            ids, js, errs = [], [], []
            for d, blob in zip(pdf[id_col], pdf[blob_col]):
                ids.append(int(d))
                try:
                    v = unpack(bytes(blob))
                    js.append(
                        json.dumps(
                            canon(v), sort_keys=True, separators=(",", ":")
                        )
                    )
                    errs.append(None)
                except MsgpackError as e:
                    js.append(None)
                    errs.append(str(e))
            yield pd.DataFrame({"doc_id": ids, "json": js, "error": errs})

    return df.select(id_col, blob_col).mapInPandas(kernel, MSGPACK_SCHEMA)
