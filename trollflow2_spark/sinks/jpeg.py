"""Baseline JPEG (ITU-T T.81) grayscale codec, stdlib + numpy only.

From-scratch implementation of the public spec (like the PNG/TIFF/NetCDF
codecs in :mod:`trollflow2_spark.sinks.imagery`): 8x8 orthonormal DCT,
Annex-K luminance quantization and Huffman tables, zigzag run-length
entropy coding, JFIF container markers. Grayscale single-component
baseline only — enough to make ``image/jpeg`` a REAL decode route in
:func:`trollflow2_spark.extensions.multimodal.decode_media`; color /
progressive streams raise with guidance.

JPEG is lossy, so round-trips are tolerance-tested (property tests) —
but constant-valued 8x8 blocks with even values quantize losslessly
(only the DC coefficient survives, and Annex-K Q[0,0]=16 divides
8*(v-128) exactly when v is even), which is what the exact-value oracle
contract query exploits.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables (public spec constants) --------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# (counts per code length 1..16, symbol values) — Annex K.3.3
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, computed (not typed) to avoid
    transcription errors: index i of the scan -> (row, col)."""
    order = []
    for s in range(15):
        rng = range(s + 1)
        for i in rng if s % 2 else reversed(rng):
            r, c = i, s - i
            if r < 8 and c < 8:
                order.append((r, c))
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()

# orthonormal DCT-II basis: D = C @ B @ C.T, B = C.T @ D @ C
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


DC_CODES = _canonical_codes(DC_BITS, DC_VALS)
AC_CODES = _canonical_codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    """Magnitude category (bit size) of a DC diff / AC amplitude."""
    return int(abs(v)).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    """One's-complement style amplitude encoding (negative: v - 1 masked)."""
    return v & ((1 << size) - 1) if v >= 0 else (v - 1) & ((1 << size) - 1)


def encode_jpeg_gray(arr: np.ndarray, quality: int = 75) -> bytes:
    """Encode an (H, W) uint8 array as a baseline grayscale JFIF JPEG."""
    a = np.asarray(arr)
    if a.ndim != 2 or a.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray wants an (H, W) uint8 array")
    h, w = a.shape
    if not (1 <= h <= 65535 and 1 <= w <= 65535):
        raise ValueError("bad JPEG dimensions")

    # quality-scaled Annex-K table (the IJG mapping, public)
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255).astype(np.int32)

    ph, pw = -h % 8, -w % 8
    padded = np.pad(a, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0

    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, h + ph, 8):
        for bx in range(0, w + pw, 8):
            block = padded[by : by + 8, bx : bx + 8]
            coefs = _C @ block @ _C.T
            quant = np.rint(coefs / qt).astype(np.int64)
            zz = quant.reshape(64)[ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            size = _category(diff)
            code, length = DC_CODES[size]
            bw.write(code, length)
            if size:
                bw.write(_amplitude_bits(diff, size), size)
            run = 0
            nz = np.flatnonzero(zz[1:])
            last = nz[-1] + 1 if nz.size else 0
            for i in range(1, last + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = AC_CODES[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size = _category(v)
                code, length = AC_CODES[(run << 4) | size]
                bw.write(code, length)
                bw.write(_amplitude_bits(v, size), size)
                run = 0
            if last < 63:
                code, length = AC_CODES[0x00]  # EOB
                bw.write(code, length)
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(int(x) for x in qt.reshape(64)[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        payload = bytes([cls << 4 | 0]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.n += 8
                continue
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:  # a marker: stop feeding real bits
                    self.pos -= 1
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.n += 8
                    continue
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFF
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v


def _decode_tables(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol decode map from a DHT payload."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JFIF JPEG to an (H, W) uint8 array.

    Supports single-component baseline streams (what
    :func:`encode_jpeg_gray` writes, and any other grayscale baseline
    encoder); color or progressive JPEG raises ``ValueError``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comp_q = 0
    dc_id = ac_id = 0
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                table = np.zeros(64, dtype=np.int32)
                table[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qtables[tq] = table.reshape(8, 8)
                p += 65
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential JPEG is supported")
        elif marker == 0xC0:
            precision, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            if ncomp != 1:
                raise ValueError(
                    "only grayscale baseline JPEG is supported (color needs "
                    "chroma upsampling not implemented here)"
                )
            if seg[7] != 0x11:
                raise ValueError("subsampled grayscale is nonsensical")
            comp_q = seg[8]
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = seg[p + 1 : p + 17]
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                htables[(tc, th)] = _decode_tables(bits, vals)
                p += 17 + n
        elif marker == 0xDA:
            dc_id, ac_id = seg[2] >> 4, seg[2] & 0xF
            scan_start = pos + seglen
            break
        pos += seglen
    if scan_start is None or h == 0:
        raise ValueError("truncated JPEG (no scan)")
    qt = qtables[comp_q]
    dc_table = htables[(0, dc_id)]
    ac_table = htables[(1, ac_id)]

    bh, bw_ = -(-h // 8), -(-w // 8)
    out = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
    br = _BitReader(data[scan_start:])
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw_):
            zz = np.zeros(64, dtype=np.int64)
            size = _read_symbol(br, dc_table)
            diff = _extend(br.read_bits(size), size) if size else 0
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = _read_symbol(br, ac_table)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError("bad AC symbol")
                    i += 16  # ZRL
                    continue
                i += run
                if i >= 64:
                    raise ValueError("AC index overflow")
                zz[i] = _extend(br.read_bits(size), size)
                i += 1
            block = np.zeros(64, dtype=np.float64)
            block[ZIGZAG] = zz
            coefs = block.reshape(8, 8) * qt
            pix = _C.T @ coefs @ _C
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
    return np.clip(np.rint(out[:h, :w] + 128.0), 0, 255).astype(np.uint8)
