"""Baseline JPEG (ITU-T T.81) codec, stdlib + numpy only.

From-scratch implementation of the public spec (like the PNG/TIFF/NetCDF
codecs in :mod:`trollflow2_spark.sinks.imagery`): 8x8 orthonormal DCT,
Annex-K quantization tables, canonical Huffman entropy coding with byte
stuffing, JFIF container markers. Supports grayscale and YCbCr color
(4:4:4 and 4:2:0 chroma subsampling) baseline sequential streams — the
shapes real camera/crawl JPEGs take — making ``image/jpeg`` a REAL
decode route in
:func:`trollflow2_spark.extensions.multimodal.decode_media`.
Progressive/arithmetic/12-bit/restart-interval streams raise with
guidance.

JPEG is lossy, so round-trips are tolerance-tested (property tests) —
but constant-valued 8x8 blocks with even values quantize losslessly
(only the DC coefficient survives, and Annex-K Q[0,0]=16 divides
8*(v-128) exactly when v is even; constant chroma 128 likewise yields
all-zero coefficients), which is what the exact-value oracle contract
queries exploit.
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

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
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


def _scaled_table(base: np.ndarray, quality: int) -> np.ndarray:
    """Quality-scaled Annex-K table (the IJG mapping, public)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw: _BitWriter, block: np.ndarray, qt: np.ndarray, prev_dc: int) -> int:
    """DCT + quantize + entropy-code one level-shifted 8x8 block; returns
    the new DC predictor. All components share the luma Huffman tables
    (spec-legal: any table may serve any component)."""
    coefs = _C @ block @ _C.T
    quant = np.rint(coefs / qt).astype(np.int64)
    zz = quant.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - prev_dc
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
    return int(zz[0])


def _pad_to(a: np.ndarray, my: int, mx: int) -> np.ndarray:
    return np.pad(a, ((0, -a.shape[0] % my), (0, -a.shape[1] % mx)), mode="edge")


def encode_jpeg(
    arr: np.ndarray, quality: int = 75, subsample: str = "420"
) -> bytes:
    """Encode a uint8 array as a baseline JFIF JPEG: (H, W) grayscale,
    or (H, W, 3) RGB as YCbCr with ``subsample`` ``"420"`` (2x2 chroma,
    what cameras emit) or ``"444"`` (full-resolution chroma)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3) or (
        a.ndim == 3 and a.shape[2] != 3
    ):
        raise ValueError("encode_jpeg wants (H, W) or (H, W, 3) uint8")
    h, w = a.shape[:2]
    if not (1 <= h <= 65535 and 1 <= w <= 65535):
        raise ValueError("bad JPEG dimensions")
    if subsample not in ("420", "444"):
        raise ValueError("subsample must be '420' or '444'")
    qt0 = _scaled_table(QUANT_LUMA, quality)
    qt1 = _scaled_table(QUANT_CHROMA, quality)

    if a.ndim == 2:
        planes = [a.astype(np.float64) - 128.0]
        samplings = [(1, 1)]
        qts = [qt0]
        tqs = [0]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            cb2 = _pad_to(cb, 2, 2)
            cr2 = _pad_to(cr, 2, 2)
            cb = cb2.reshape(cb2.shape[0] // 2, 2, cb2.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = cr2.reshape(cr2.shape[0] // 2, 2, cr2.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            samplings = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [qt0, qt1, qt1]
        tqs = [0, 1, 1]

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        _pad_to(p, 8 * mcuy * vi, 8 * mcux * hi)[: 8 * mcuy * vi, : 8 * mcux * hi]
        for p, (hi, vi) in zip(planes, samplings)
    ]

    bw = _BitWriter()
    prev = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((hi, vi), plane) in enumerate(zip(samplings, padded)):
                for vy in range(vi):
                    for vx in range(hi):
                        by = (my * vi + vy) * 8
                        bx = (mx * hi + vx) * 8
                        prev[ci] = _encode_block(
                            bw, plane[by : by + 8, bx : bx + 8], qts[ci], prev[ci]
                        )
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    for tq, qt in ((0, qt0),) if a.ndim == 2 else ((0, qt0), (1, qt1)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in qt.reshape(64)[ZIGZAG])
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, ((hi, vi), tq) in enumerate(zip(samplings, tqs)):
        out += bytes([ci + 1, (hi << 4) | vi, tq])
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        payload = bytes([cls << 4 | 0]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00])  # luma Huffman tables for every comp
    out += b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray(arr: np.ndarray, quality: int = 75) -> bytes:
    """Encode an (H, W) uint8 array as a baseline grayscale JFIF JPEG."""
    a = np.asarray(arr)
    if a.ndim != 2:
        raise ValueError("encode_jpeg_gray wants an (H, W) uint8 array")
    return encode_jpeg(a, quality=quality)


class _BitReader:
    """MSB-first bit reader with JPEG unstuffing (0xFF00 -> 0xFF) and a
    16-bit peek window — symbol decoding peeks once and skips, instead
    of paying a Python call per bit."""

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

    def peek16(self) -> int:
        if self.n < 16:
            self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k

    def read_bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)


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
    window = br.peek16()
    get = table.get
    for length in range(1, 17):
        sym = get((length, window >> (16 - length)))
        if sym is not None:
            br.skip(length)
            return sym
    raise ValueError("bad Huffman stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(br: _BitReader, dc_table, ac_table, prev_dc: int) -> tuple[np.ndarray, int]:
    """Entropy-decode one block's zigzag coefficients; returns (zz, dc)."""
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
    return zz, prev_dc


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG: grayscale streams to (H, W) uint8,
    YCbCr color streams (any sampling factors up to 2x2 — 4:4:4, 4:2:2,
    4:2:0) to (H, W, 3) uint8 RGB. Progressive / arithmetic / 12-bit /
    restart-interval / CMYK streams raise ``ValueError``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int, int, int]] = []  # (id, Hi, Vi, Tq)
    scan_tables: dict[int, tuple[int, int]] = {}  # comp id -> (Td, Ta)
    scan_order: list[int] = []
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
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential JPEG is supported")
        elif marker == 0xDD:
            if struct.unpack_from(">H", seg, 0)[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xC0:
            precision, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            if ncomp not in (1, 3):
                raise ValueError("only grayscale or YCbCr JPEG supported")
            comps = []
            for ci in range(ncomp):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * ci]))
            if any(hi not in (1, 2) or vi not in (1, 2) for _, hi, vi, _ in comps):
                raise ValueError("sampling factors beyond 2x2 unsupported")
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
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("non-interleaved scans unsupported")
            for si in range(ns):
                cid = seg[1 + 2 * si]
                tt = seg[2 + 2 * si]
                scan_tables[cid] = (tt >> 4, tt & 0xF)
                scan_order.append(cid)
            scan_start = pos + seglen
            break
        pos += seglen
    if scan_start is None or h == 0 or not comps:
        raise ValueError("truncated JPEG (no scan)")

    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for cid, hi, vi, _ in comps
    }
    br = _BitReader(data[scan_start:])
    prev = {cid: 0 for cid, *_ in comps}
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, hi, vi, tq in comps:
                dc_table = htables[(0, scan_tables[cid][0])]
                ac_table = htables[(1, scan_tables[cid][1])]
                qt = qtables[tq]
                for vy in range(vi):
                    for vx in range(hi):
                        zz, prev[cid] = _decode_block(
                            br, dc_table, ac_table, prev[cid]
                        )
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz
                        pix = _C.T @ (block.reshape(8, 8) * qt) @ _C
                        y0 = (my * vi + vy) * 8
                        x0 = (mx * hi + vx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix

    full = []
    for cid, hi, vi, _ in comps:
        p = np.repeat(np.repeat(planes[cid], vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
