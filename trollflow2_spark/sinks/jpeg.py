"""JPEG (ITU-T T.81) codec, stdlib + numpy only.

From-scratch implementation of the public spec (like the PNG/TIFF/NetCDF
codecs in :mod:`trollflow2_spark.sinks.imagery`): 8x8 orthonormal DCT,
Annex-K quantization tables, canonical Huffman entropy coding with byte
stuffing, JFIF container markers. Decodes grayscale and YCbCr color
(4:4:4, 4:2:2 and 4:2:0 chroma subsampling) in BOTH baseline sequential
(SOF0) and progressive (SOF2, Annex G — spectral selection + successive
approximation, multi-scan) forms — the shapes real camera/crawl JPEGs
take — making ``image/jpeg`` a REAL decode route in
:func:`trollflow2_spark.extensions.multimodal.decode_media`. Encoders
exist for both forms (:func:`encode_jpeg`,
:func:`encode_jpeg_progressive`) and produce identical quantized
coefficients, so progressive-vs-baseline decode equality is testable
pixel-exactly. Restart intervals (DRI/RSTn) are supported on both
sides: the encoder can emit them, the decoder consumes them in every
scan type (predictor/EOB-run reset at each boundary).
Lossless/arithmetic/12-bit streams raise with guidance.

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


def _encode_block(bw: _BitWriter, zz: np.ndarray, prev_dc: int) -> int:
    """Entropy-code one already-quantized block (zigzag coefficient
    order); returns the new DC predictor. All components share the luma
    Huffman tables (spec-legal: any table may serve any component).
    Quantization happens centrally in :func:`_quantize_all` so the
    baseline and progressive encoders produce BIT-IDENTICAL coefficients
    — two numerically-different DCT paths can round an exact .5
    quantization tie to different integers."""
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


def _prepare_planes(arr: np.ndarray, quality: int, subsample: str):
    """Shared encoder front half: validate, colorspace-convert,
    subsample, pad to whole MCUs. Returns
    (h, w, padded level-shifted planes, samplings, qts, tqs, mcux, mcuy)."""
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
    return h, w, padded, samplings, qts, tqs, mcux, mcuy


def _frame_headers(
    h: int, w: int, samplings, qts, tqs, sof_marker: bytes
) -> bytearray:
    """SOI + APP0 + DQT + SOF (baseline 0xC0 or progressive 0xC2) + DHT
    marker segments shared by both encoders."""
    ncomp = len(samplings)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    seen = []
    for tq, qt in zip(tqs, qts):
        if tq in seen:
            continue
        seen.append(tq)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in qt.reshape(64)[ZIGZAG])
    out += sof_marker + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, ((hi, vi), tq) in enumerate(zip(samplings, tqs)):
        out += bytes([ci + 1, (hi << 4) | vi, tq])
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        payload = bytes([cls << 4 | 0]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    return out


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 75,
    subsample: str = "420",
    restart_interval: int | None = None,
) -> bytes:
    """Encode a uint8 array as a baseline JFIF JPEG: (H, W) grayscale,
    or (H, W, 3) RGB as YCbCr with ``subsample`` ``"420"`` (2x2 chroma,
    what cameras emit) or ``"444"`` (full-resolution chroma).
    ``restart_interval`` emits a DRI segment and an RSTn marker every
    that many MCUs (byte-aligned, DC predictors reset) — the
    error-resilience layout most camera JPEGs use."""
    h, w, padded, samplings, qts, tqs, mcux, mcuy = _prepare_planes(
        arr, quality, subsample
    )
    if restart_interval is not None and restart_interval <= 0:
        raise ValueError("restart_interval must be positive")

    coef = _quantize_all(padded, samplings, qts, mcux, mcuy)
    scan = bytearray()
    bw = _BitWriter()
    prev = [0] * len(padded)
    mcu_no = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                scan += bw.flush()
                scan += bytes(
                    [0xFF, 0xD0 + (mcu_no // restart_interval - 1) % 8]
                )
                bw = _BitWriter()
                prev = [0] * len(padded)
            mcu_no += 1
            for ci, ((hi, vi), cf) in enumerate(zip(samplings, coef)):
                for vy in range(vi):
                    for vx in range(hi):
                        prev[ci] = _encode_block(
                            bw, cf[my * vi + vy, mx * hi + vx], prev[ci]
                        )
    scan += bw.flush()

    ncomp = len(padded)
    out = _frame_headers(h, w, samplings, qts, tqs, b"\xff\xc0")
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
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


# --- progressive encoding (T.81 Annex G) -----------------------------------


def _quantize_all(padded, samplings, qts, mcux: int, mcuy: int) -> list[np.ndarray]:
    """Forward DCT + quantization of every block of every component in
    one vectorized shot: per component an int64 array of shape
    (blocks_y, blocks_x, 64) holding zigzag-ordered coefficients."""
    out = []
    for (hi, vi), plane, qt in zip(samplings, padded, qts):
        bh, bw_ = mcuy * vi, mcux * hi
        blocks = plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
        coefs = np.einsum("ij,abjk,lk->abil", _C, blocks, _C)
        quant = np.rint(coefs / qt).astype(np.int64)
        out.append(quant.reshape(bh, bw_, 64)[..., ZIGZAG])
    return out


def _real_block_dims(h, w, hi, vi, hmax, vmax) -> tuple[int, int]:
    """A non-interleaved scan covers only the component's REAL blocks
    (ceil of its scaled dimensions), not the MCU-padded grid."""
    ch = -(-(h * vi) // vmax)
    cw = -(-(w * hi) // hmax)
    return -(-ch // 8), -(-cw // 8)


def _sos(scan_comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
    """SOS marker segment; every component references DC table 0 / AC
    table 0 (the Annex-K pair this encoder ships)."""
    payload = bytearray([len(scan_comp_ids)])
    for cid in scan_comp_ids:
        payload += bytes([cid, 0x00])
    payload += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(payload) + 2) + bytes(payload)


def _encode_dc_first(coef, samplings, mcux, mcuy, al: int) -> bytes:
    """First DC scan (interleaved, point transform ``>> al``): the same
    diff + magnitude-category coding as baseline, on shifted values."""
    bw = _BitWriter()
    prev = [0] * len(coef)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((hi, vi), cf) in enumerate(zip(samplings, coef)):
                for vy in range(vi):
                    for vx in range(hi):
                        v = int(cf[my * vi + vy, mx * hi + vx, 0]) >> al
                        diff = v - prev[ci]
                        prev[ci] = v
                        size = _category(diff)
                        c, ln = DC_CODES[size]
                        bw.write(c, ln)
                        if size:
                            bw.write(_amplitude_bits(diff, size), size)
    return bw.flush()


def _encode_dc_refine(coef, samplings, mcux, mcuy, al: int) -> bytes:
    """DC refinement scan: one raw bit per block (bit ``al`` of the
    coefficient), no entropy coding — T.81 G.1.2.1."""
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for (hi, vi), cf in zip(samplings, coef):
                for vy in range(vi):
                    for vx in range(hi):
                        bw.write((int(cf[my * vi + vy, mx * hi + vx, 0]) >> al) & 1, 1)
    return bw.flush()


def _encode_ac_first(cf, bh_r, bw_r, ss, se, al: int) -> bytes:
    """First AC scan of one component (non-interleaved): zero-run /
    magnitude coding of the point-transformed band, with end-of-block
    runs capped at EOB0 — the Annex-K AC table has no EOBn>0 symbols
    (libjpeg generates custom tables for longer runs; a run of EOB0s is
    spec-identical, just a few bits larger)."""
    bw = _BitWriter()
    for by in range(bh_r):
        for bx in range(bw_r):
            zz = cf[by, bx]
            run = 0
            for k in range(ss, se + 1):
                c0 = int(zz[k])
                mag = abs(c0) >> al
                if mag == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = AC_CODES[0xF0]
                    bw.write(c, ln)
                    run -= 16
                v = mag if c0 >= 0 else -mag
                size = _category(v)
                c, ln = AC_CODES[(run << 4) | size]
                bw.write(c, ln)
                bw.write(_amplitude_bits(v, size), size)
                run = 0
            if run > 0:
                c, ln = AC_CODES[0x00]  # EOB0
                bw.write(c, ln)
    return bw.flush()


def _encode_ac_refine(cf, bh_r, bw_r, ss, se, al: int) -> bytes:
    """AC refinement scan (T.81 G.1.2.3, the libjpeg structure): newly
    visible coefficients (magnitude 1 at this approximation) are coded
    as runs over zero-history positions followed by a sign bit;
    already-visible coefficients contribute one buffered correction bit
    each, appended after the next coded symbol. End-of-block uses EOB0
    (see :func:`_encode_ac_first`) followed by the block-tail correction
    bits the decoder reads during its EOB processing."""
    bw = _BitWriter()
    for by in range(bh_r):
        for bx in range(bw_r):
            zz = cf[by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob_idx = ss - 1
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eob_idx = k
            run = 0
            pend: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob_idx:
                    c, ln = AC_CODES[0xF0]
                    bw.write(c, ln)
                    run -= 16
                    for b in pend:
                        bw.write(b, 1)
                    pend = []
                if t > 1:
                    pend.append(t & 1)
                    continue
                c, ln = AC_CODES[(run << 4) | 1]
                bw.write(c, ln)
                bw.write(1 if int(zz[k]) >= 0 else 0, 1)
                for b in pend:
                    bw.write(b, 1)
                pend = []
                run = 0
            if run > 0 or pend:
                c, ln = AC_CODES[0x00]  # EOB0 covering this block
                bw.write(c, ln)
                for b in pend:
                    bw.write(b, 1)
    return bw.flush()


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 75, subsample: str = "420"
) -> bytes:
    """Encode a uint8 array as a PROGRESSIVE JFIF JPEG (SOF2, T.81
    Annex G) exercising both progressive mechanisms: successive
    approximation (first scans send coefficients at ``Al=1``, refinement
    scans add the low bit) and spectral selection (DC and AC bands in
    separate scans, AC non-interleaved per component). Quantized
    coefficients are identical to :func:`encode_jpeg` at the same
    quality — only the entropy-coding layout differs — so a decoder
    must reconstruct the exact same pixels."""
    h, w, padded, samplings, qts, tqs, mcux, mcuy = _prepare_planes(
        arr, quality, subsample
    )
    coef = _quantize_all(padded, samplings, qts, mcux, mcuy)
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)

    out = _frame_headers(h, w, samplings, qts, tqs, b"\xff\xc2")
    all_ids = [ci + 1 for ci in range(len(coef))]
    # scan script: DC first (Al=1) -> per-comp AC first (Al=1)
    #              -> DC refine (Al=0) -> per-comp AC refine (Al=0)
    out += _sos(all_ids, 0, 0, 0, 1)
    out += _encode_dc_first(coef, samplings, mcux, mcuy, 1)
    for ci, ((hi, vi), cf) in enumerate(zip(samplings, coef)):
        bh_r, bw_r = _real_block_dims(h, w, hi, vi, hmax, vmax)
        out += _sos([ci + 1], 1, 63, 0, 1)
        out += _encode_ac_first(cf, bh_r, bw_r, 1, 63, 1)
    out += _sos(all_ids, 0, 0, 1, 0)
    out += _encode_dc_refine(coef, samplings, mcux, mcuy, 0)
    for ci, ((hi, vi), cf) in enumerate(zip(samplings, coef)):
        bh_r, bw_r = _real_block_dims(h, w, hi, vi, hmax, vmax)
        out += _sos([ci + 1], 1, 63, 1, 0)
        out += _encode_ac_refine(cf, bh_r, bw_r, 1, 63, 0)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


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

    def consume_restart(self) -> int:
        """At a restart boundary: discard the entropy segment's byte-pad
        bits (plus any zero-fill the reader buffered at the marker),
        consume the RSTn marker, return n. The caller resets DC
        predictors / EOB runs — marker semantics live in the scan loop."""
        self.acc = 0
        self.n = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected RST marker at restart interval")
        m = self.data[self.pos + 1] - 0xD0
        self.pos += 2
        return m

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


def _decode_baseline_block(br, dc_table, ac_table, zz, pred: int) -> int:
    """Entropy-decode one full baseline block into ``zz`` (zigzag
    coefficient view); returns the new DC predictor."""
    size = _read_symbol(br, dc_table)
    diff = _extend(br.read_bits(size), size) if size else 0
    pred += diff
    zz[0] = pred
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
    return pred


def _decode_ac_first_block(br, ac_table, zz, ss, se, al, eobrun: int) -> int:
    """First AC scan of one block (T.81 G.2): zero-run/magnitude pairs
    with end-of-band runs; returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_symbol(br, ac_table)
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eb = (1 << run) + (br.read_bits(run) if run else 0)
            return eb - 1  # the run covers THIS block too
        k += run
        if k > se:
            raise ValueError("AC index overflow")
        zz[k] = _extend(br.read_bits(size), size) << al
        k += 1
    return 0


def _decode_ac_refine_block(br, ac_table, zz, ss, se, al, eobrun: int) -> int:
    """AC refinement scan of one block (T.81 G.2 / the libjpeg
    structure): newly visible coefficients arrive as run+sign, every
    already-nonzero coefficient traversed contributes one correction
    bit; during an EOB run only correction bits are read."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(br, ac_table)
            run, size = sym >> 4, sym & 0xF
            newval = 0
            if size == 0:
                if run != 15:
                    eobrun = (1 << run) + (br.read_bits(run) if run else 0)
                    break
                # ZRL: traverse 16 zero-history positions below
            else:
                if size != 1:
                    raise ValueError("bad AC refinement symbol")
                newval = p1 if br.read_bits(1) else -p1
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if br.read_bits(1) and (c & p1) == 0:
                        zz[k] = c + (p1 if c > 0 else -p1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0:
                if br.read_bits(1) and (c & p1) == 0:
                    zz[k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _find_scan_end(data: bytes, start: int) -> int:
    """First position at/after ``start`` holding a marker that ends the
    entropy-coded segment (0xFF followed by anything but 0x00 stuffing
    or RST0-7). Vectorized over the 0xFF positions only."""
    buf = np.frombuffer(data, dtype=np.uint8)
    ffs = np.flatnonzero(buf[start:-1] == 0xFF)
    nxt = buf[start + 1 :][ffs]
    real = ffs[(nxt != 0x00) & ((nxt < 0xD0) | (nxt > 0xD7))]
    return start + int(real[0]) if real.size else len(data)


def _decode_scan(
    data, scan_start, scan_end, scan_comps, ss, se, ah, al,
    comps, htables, coef, h, w, hmax, vmax, mcux, mcuy, eobruns,
    dri: int = 0,
) -> None:
    """Decode one entropy-coded scan into the per-component coefficient
    arrays. Handles all five scan shapes: full baseline, progressive DC
    first/refine (interleaved or single-component) and progressive AC
    first/refine (single-component, real-block raster). ``eobruns``
    carries the end-of-band run between blocks (local to a scan — a
    fresh dict is passed per scan). ``dri`` is the restart interval in
    restart units (MCUs for interleaved scans, blocks for
    non-interleaved): at each boundary the byte-pad + RSTn marker is
    consumed and DC predictors / EOB runs reset."""
    br = _BitReader(data[scan_start:scan_end])
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    pred = {cid: 0 for cid, _, _ in scan_comps}
    if ss == 0:
        # DC-containing scan (progressive DC, se=0, or full baseline,
        # se=63): interleaved over MCUs; a single-component scan is the
        # same loop with 1x1 "MCUs" over that component's real blocks
        if len(scan_comps) == 1:
            cid = scan_comps[0][0]
            hi, vi, _ = by_id[cid]
            geo = {cid: (1, 1)}
            iter_mcuy, iter_mcux = _real_block_dims(h, w, hi, vi, hmax, vmax)
        else:
            iter_mcux, iter_mcuy = mcux, mcuy
            geo = {cid: by_id[cid][:2] for cid, _, _ in scan_comps}
        units = 0
        for my in range(iter_mcuy):
            for mx in range(iter_mcux):
                if dri and units and units % dri == 0:
                    br.consume_restart()
                    pred = {cid: 0 for cid, _, _ in scan_comps}
                units += 1
                for cid, td, ta in scan_comps:
                    gh, gv = geo[cid]
                    for vy in range(gv):
                        for vx in range(gh):
                            zz = coef[cid][my * gv + vy, mx * gh + vx]
                            if se == 63:  # full baseline block
                                pred[cid] = _decode_baseline_block(
                                    br,
                                    htables[(0, td)],
                                    htables[(1, ta)],
                                    zz,
                                    pred[cid],
                                )
                            elif ah == 0:  # DC first
                                size = _read_symbol(br, htables[(0, td)])
                                diff = (
                                    _extend(br.read_bits(size), size)
                                    if size
                                    else 0
                                )
                                pred[cid] += diff
                                zz[0] = pred[cid] << al
                            else:  # DC refine: one raw bit
                                if br.read_bits(1):
                                    zz[0] = int(zz[0]) | (1 << al)
    else:
        # AC scans are always single-component, real-block raster
        if len(scan_comps) != 1:
            raise ValueError("interleaved AC scan is not legal JPEG")
        cid, _td, ta = scan_comps[0]
        hi, vi, _ = by_id[cid]
        bh_r, bw_r = _real_block_dims(h, w, hi, vi, hmax, vmax)
        ac_table = htables[(1, ta)]
        decode = _decode_ac_first_block if ah == 0 else _decode_ac_refine_block
        eob = eobruns.get(cid, 0)
        units = 0
        for by in range(bh_r):
            for bx in range(bw_r):
                if dri and units and units % dri == 0:
                    br.consume_restart()
                    eob = 0
                units += 1
                eob = decode(br, ac_table, coef[cid][by, bx], ss, se, al, eob)
        eobruns[cid] = eob


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a JFIF JPEG — baseline sequential (SOF0) or progressive
    (SOF2, spectral selection + successive approximation per T.81 Annex
    G): grayscale streams to (H, W) uint8, YCbCr color streams (any
    sampling factors up to 2x2 — 4:4:4, 4:2:2, 4:2:0) to (H, W, 3)
    uint8 RGB. Restart intervals are handled in all scan types.
    Lossless / arithmetic / hierarchical / 12-bit / CMYK streams raise
    ``ValueError``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int, int, int]] = []  # (id, Hi, Vi, Tq)
    coef: dict[int, np.ndarray] = {}
    hmax = vmax = mcux = mcuy = 0
    dri = 0
    saw_scan = False
    while pos + 1 < len(data):
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
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "only baseline-sequential or progressive JPEG is supported"
            )
        elif marker == 0xDD:
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker in (0xC0, 0xC2):
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
            hmax = max(hi for _, hi, _, _ in comps)
            vmax = max(vi for _, _, vi, _ in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coef = {
                cid: np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                for cid, hi, vi, _ in comps
            }
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
            if not comps:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cid = seg[1 + 2 * si]
                tt = seg[2 + 2 * si]
                scan_comps.append((cid, tt >> 4, tt & 0xF))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            scan_start = pos + seglen
            scan_end = _find_scan_end(data, scan_start)
            _decode_scan(
                data, scan_start, scan_end, scan_comps, ss, se,
                ahal >> 4, ahal & 0xF, comps, htables, coef,
                h, w, hmax, vmax, mcux, mcuy, {}, dri,
            )
            saw_scan = True
            pos = scan_end
            continue
        pos += seglen
    if not saw_scan or h == 0 or not comps:
        raise ValueError("truncated JPEG (no scan)")

    full = []
    for cid, hi, vi, tq in comps:
        zz = coef[cid]
        bh, bw_ = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz
        deq = nat.reshape(bh, bw_, 8, 8).astype(np.float64) * qtables[tq]
        pix = np.einsum("ji,abjk,kl->abil", _C, deq, _C)
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        p = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
