"""QOI — the "Quite OK Image" format (qoiformat.org, public
single-page spec) — from-scratch codec.

Why: QOI shows up in game-asset and tooling pipelines as the
zero-dependency lossless interchange format; the spec is one page,
so the decoder is conformance-checkable by construction. Completes
the still-image tier (PNG/JPEG/GIF/WebP/TIFF/BMP/PNM/ICO) with the
one modern format the magic-byte router couldn't claim.

Format: 14-byte header (``qoif``, width u32 BE, height u32 BE,
channels 3|4, colorspace 0|1), then a byte stream of ops over a
running pixel + a 64-entry index keyed by the spec's hash
``(3r + 5g + 7b + 11a) % 64``:

- ``QOI_OP_RGB`` (0xFE) / ``QOI_OP_RGBA`` (0xFF): literal pixel;
- ``QOI_OP_INDEX`` (00xxxxxx): replay index entry;
- ``QOI_OP_DIFF`` (01drdgdb): per-channel −2..1 deltas, bias 2;
- ``QOI_OP_LUMA`` (10dddddd + byte): dg −32..31 with dr−dg/db−dg
  −8..7, biases 32/8;
- ``QOI_OP_RUN`` (11xxxxxx): run of 1..62 of the previous pixel
  (0xFE/0xFF tag values are the literal ops, so runs cap at 62);

ends with 7×\\x00 + \\x01. Wrap-around arithmetic is mod 256
everywhere. Malformed input (bad magic/header, truncation, pixel
overrun, missing end marker) raises ``QoiError`` loudly.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["QoiError", "decode_qoi", "encode_qoi"]

_END = b"\x00" * 7 + b"\x01"


class QoiError(ValueError):
    """Malformed QOI stream."""


def decode_qoi(blob: bytes) -> np.ndarray:
    """Decode to an (H, W, channels) uint8 array."""
    b = bytes(blob)
    if b[:4] != b"qoif":
        raise QoiError("bad magic")
    if len(b) < 14 + len(_END):
        raise QoiError("truncated header")
    w, h = struct.unpack(">II", b[4:12])
    channels, colorspace = b[12], b[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise QoiError(
            f"bad channels/colorspace {channels}/{colorspace}"
        )
    if w == 0 or h == 0 or w * h > 1 << 26:
        raise QoiError(f"bad dimensions {w}x{h}")
    n_px = w * h
    out = np.empty((n_px, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    px = (0, 0, 0, 255)
    pos = 14
    i = 0
    ln = len(b)
    while i < n_px:
        if pos >= ln:
            raise QoiError("truncated stream")
        op = b[pos]
        pos += 1
        if op == 0xFE:  # RGB
            if pos + 3 > ln:
                raise QoiError("truncated RGB op")
            px = (b[pos], b[pos + 1], b[pos + 2], px[3])
            pos += 3
        elif op == 0xFF:  # RGBA
            if pos + 4 > ln:
                raise QoiError("truncated RGBA op")
            px = (b[pos], b[pos + 1], b[pos + 2], b[pos + 3])
            pos += 4
        else:
            tag = op >> 6
            if tag == 0:  # INDEX
                px = index[op & 0x3F]
            elif tag == 1:  # DIFF
                dr = ((op >> 4) & 3) - 2
                dg = ((op >> 2) & 3) - 2
                db = (op & 3) - 2
                px = (
                    (px[0] + dr) & 0xFF,
                    (px[1] + dg) & 0xFF,
                    (px[2] + db) & 0xFF,
                    px[3],
                )
            elif tag == 2:  # LUMA
                if pos >= ln:
                    raise QoiError("truncated LUMA op")
                dg = (op & 0x3F) - 32
                b2 = b[pos]
                pos += 1
                dr = dg + ((b2 >> 4) & 0xF) - 8
                db = dg + (b2 & 0xF) - 8
                px = (
                    (px[0] + dr) & 0xFF,
                    (px[1] + dg) & 0xFF,
                    (px[2] + db) & 0xFF,
                    px[3],
                )
            else:  # RUN
                run = (op & 0x3F) + 1
                if i + run > n_px:
                    raise QoiError("run overruns pixel count")
                out[i:i + run] = px
                i += run
                continue
        index[(px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64] = px
        out[i] = px
        i += 1
    if b[pos:pos + len(_END)] != _END:
        raise QoiError("missing end marker")
    arr = out.reshape(h, w, 4)
    return arr[:, :, :3] if channels == 3 else arr


def encode_qoi(arr: np.ndarray, colorspace: int = 0) -> bytes:
    """Spec-complete encoder (fixtures + round-trip conformance):
    emits RUN / INDEX / DIFF / LUMA / literal in the spec's own
    preference order, so streams exercise every op."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise QoiError("expected (H, W, 3|4) uint8 array")
    h, w, channels = a.shape
    out = bytearray(b"qoif")
    out += struct.pack(">II", w, h)
    out += bytes([channels, colorspace])
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = a.reshape(-1, channels)
    for row in flat:
        px = (
            int(row[0]),
            int(row[1]),
            int(row[2]),
            int(row[3]) if channels == 4 else prev[3],
        )
        if channels == 3:
            px = (px[0], px[1], px[2], prev[3])
        if px == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hidx = (px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64
        if index[hidx] == px:
            out.append(hidx)
        else:
            index[hidx] = px
            if px[3] == prev[3]:
                dr = (px[0] - prev[0] + 128) % 256 - 128
                dg = (px[1] - prev[1] + 128) % 256 - 128
                db = (px[2] - prev[2] + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        0x40 | ((dr + 2) << 4) | ((dg + 2) << 2)
                        | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes([0xFE, px[0], px[1], px[2]])
            else:
                out += bytes([0xFF, px[0], px[1], px[2], px[3]])
        prev = px
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)
