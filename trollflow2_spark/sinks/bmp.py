"""BMP (Windows DIB) and netpbm (PPM/PGM) codecs — stdlib + numpy.

Two more formats a real crawl's image columns carry: uncompressed BMP
(BI_RGB, the format every Windows tool exports) and binary netpbm
(P5 grayscale / P6 RGB, ubiquitous in ML datasets and conversion
pipelines). Both are headers + raw samples — small, fully-specified
codecs in the repo's from-scratch style (spec: BITMAPINFOHEADER
layout; netpbm man pages). The intake routes them through
``decode_media`` next to PNG/JPEG/GIF/WebP/TIFF.

Scope: BMP BI_RGB 8-bit palette (returned grayscale when the palette
is gray, else RGB), 24-bit BGR and 32-bit BGRA; top-down (negative
height) and bottom-up rows; 4-byte row padding. RLE compression
raises with guidance. netpbm: binary P5/P6 with maxval 255,
whitespace/comment-tolerant headers.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_bmp",
    "decode_ico",
    "decode_pnm",
    "encode_bmp",
    "encode_pnm",
]


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as an
    uncompressed bottom-up BMP (8-bit gray palette / 24-bit)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    if a.ndim == 2:
        bpp = 8
        palette = b"".join(
            struct.pack("<BBBB", i, i, i, 0) for i in range(256)
        )
        row_bytes = w
    elif a.ndim == 3 and a.shape[2] == 3:
        bpp = 24
        palette = b""
        row_bytes = w * 3
    else:
        raise ValueError("encode_bmp: need (h,w) gray or (h,w,3) RGB")
    pad = (-row_bytes) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        if bpp == 8:
            rows.append(a[y].tobytes() + b"\x00" * pad)
        else:
            rows.append(a[y, :, ::-1].tobytes() + b"\x00" * pad)  # BGR
    pixel_data = b"".join(rows)
    offset = 14 + 40 + len(palette)
    header = b"BM" + struct.pack(
        "<IHHI", offset + len(pixel_data), 0, 0, offset
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pixel_data),
        2835, 2835, 256 if bpp == 8 else 0, 0,
    )
    return header + info + palette + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed BMP -> (h, w) gray (gray palette) or
    (h, w, 3)/(h, w, 4) RGB(A) uint8 array."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP file")
    offset = struct.unpack("<I", data[10:14])[0]
    return _decode_dib(data, 14, pixel_offset=offset)


def _decode_dib(
    data: bytes,
    info_off: int,
    pixel_offset: int | None = None,
    ico: bool = False,
) -> np.ndarray:
    """Decode a DIB (BITMAPINFOHEADER + palette + rows) at
    ``info_off``. ``ico=True`` halves the stored height (ICO DIBs
    stack the XOR image and the AND mask) and ignores the mask."""
    (
        hdr_size, w, h, _planes, bpp, compression, _img_size,
        _xppm, _yppm, n_colors, _important,
    ) = struct.unpack("<IiiHHIIiiII", data[info_off:info_off + 40])
    if hdr_size < 40:
        raise ValueError("BMP: pre-BITMAPINFOHEADER DIBs not supported")
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} not supported (BI_RGB only; "
            "RLE needs a dedicated decoder)"
        )
    top_down = h < 0
    h = abs(h)
    if ico:
        h //= 2  # XOR image + AND mask stacked
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("BMP: implausible dimensions")
    pal_base = info_off + hdr_size
    if bpp == 8:
        n_colors = n_colors or 256
        pal_raw = data[pal_base:pal_base + 4 * n_colors]
        if len(pal_raw) < 4 * n_colors:
            raise ValueError("BMP: truncated palette")
        pal = np.frombuffer(pal_raw, np.uint8).reshape(-1, 4)[:, :3][:, ::-1]
        row_bytes = w
        pal_bytes = 4 * n_colors
    elif bpp in (24, 32):
        pal = None
        row_bytes = w * (bpp // 8)
        pal_bytes = 0
    else:
        raise NotImplementedError(f"BMP bit depth {bpp} not supported")
    offset = (
        pixel_offset if pixel_offset is not None
        else pal_base + pal_bytes
    )
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(data) < need:
        raise ValueError("BMP: truncated pixel data")
    raw = np.frombuffer(
        data[offset:offset + stride * h], np.uint8
    ).reshape(h, stride)[:, :row_bytes]
    if not top_down:
        raw = raw[::-1]
    if bpp == 8:
        idx = raw
        rgb = pal[idx]  # (h, w, 3)
        if np.all(rgb[:, :, 0] == rgb[:, :, 1]) and np.all(
            rgb[:, :, 1] == rgb[:, :, 2]
        ):
            return np.ascontiguousarray(rgb[:, :, 0])
        return np.ascontiguousarray(rgb)
    px = raw.reshape(h, w, bpp // 8)
    if bpp == 24:
        return np.ascontiguousarray(px[:, :, ::-1])  # BGR -> RGB
    return np.ascontiguousarray(px[:, :, [2, 1, 0, 3]])  # BGRA -> RGBA


def encode_pnm(arr: np.ndarray) -> bytes:
    """Encode (h, w) gray as P5 or (h, w, 3) RGB as P6 (maxval 255)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    if a.ndim == 2:
        return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()
    if a.ndim == 3 and a.shape[2] == 3:
        return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()
    raise ValueError("encode_pnm: need (h,w) gray or (h,w,3) RGB")


def decode_pnm(data: bytes) -> np.ndarray:
    """Decode binary netpbm (P5 gray / P6 RGB, maxval <= 255)."""
    return _pnm_at(data, 0)[0]


def decode_pnm_frames(data: bytes) -> list[np.ndarray]:
    """Decode a CONCATENATED netpbm stream (back-to-back P5/P6 images
    — the ``ffmpeg -f image2pipe`` raw-video shape) into frames."""
    frames: list[np.ndarray] = []
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 1].isspace():
            pos += 1
        if pos >= n:
            break
        arr, pos = _pnm_at(data, pos)
        frames.append(arr)
    if not frames:
        raise ValueError("netpbm stream: no frames")
    return frames


def _pnm_at(data: bytes, pos: int) -> tuple[np.ndarray, int]:
    if data[pos:pos + 2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm (P5/P6) file")
    chans = 1 if data[pos:pos + 2] == b"P5" else 3
    pos += 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":  # comment to end of line
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ValueError("netpbm: truncated header comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tok = data[start:pos]
        if not tok.isdigit():
            raise ValueError(f"netpbm: bad header token {tok!r}")
        fields.append(int(tok))
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("netpbm: 16-bit samples not supported")
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("netpbm: implausible dimensions")
    pos += 1  # single whitespace after maxval
    need = w * h * chans
    raw = data[pos:pos + need]
    if len(raw) != need:
        raise ValueError("netpbm: truncated pixel data")
    a = np.frombuffer(raw, np.uint8)
    arr = (
        a.reshape(h, w) if chans == 1 else a.reshape(h, w, 3)
    ).copy()
    return arr, pos + need


def decode_ico(data: bytes) -> np.ndarray:
    """Decode an ICO (favicon) container: pick the LARGEST directory
    entry and decode its payload — an embedded PNG (modern favicons)
    or an ICO DIB (BITMAPINFOHEADER with doubled height stacking the
    XOR image over the AND transparency mask, which is ignored —
    pixels decode opaque)."""
    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO file")
    count = struct.unpack("<H", data[4:6])[0]
    if count == 0 or len(data) < 6 + 16 * count:
        raise ValueError("ICO: empty or truncated directory")
    best = None
    for i in range(count):
        bw, bh = data[6 + 16 * i], data[7 + 16 * i]
        size, off = struct.unpack("<II", data[6 + 16 * i + 8:6 + 16 * i + 16])
        area = (bw or 256) * (bh or 256)
        if best is None or area > best[0]:
            best = (area, off, size)
    _area, off, size = best
    sub = data[off:off + size]
    if len(sub) != size:
        raise ValueError("ICO: truncated image payload")
    if sub[:8] == b"\x89PNG\r\n\x1a\n":
        from trollflow2_spark.sinks.imagery import decode_png

        return decode_png(sub)
    return _decode_dib(sub, 0, ico=True)


def encode_ico(images: list[np.ndarray]) -> bytes:
    """Encode (h, w, 3) uint8 RGB arrays as a multi-entry ICO with
    24-bit DIB payloads (doubled-height header, zeroed AND mask) —
    the favicon-fixture writer for :func:`decode_ico`."""
    dirs = []
    bodies = []
    off = 6 + 16 * len(images)
    for a in images:
        a = np.asarray(a, dtype=np.uint8)
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("encode_ico: need (h, w, 3) RGB entries")
        h, w = a.shape[:2]
        if w > 256 or h > 256:
            raise ValueError("encode_ico: entries are at most 256x256")
        row_bytes = w * 3
        pad = (-row_bytes) % 4
        rows = b"".join(
            a[y, :, ::-1].tobytes() + b"\x00" * pad
            for y in range(h - 1, -1, -1)
        )
        mask_stride = ((w + 31) // 32) * 4
        mask = b"\x00" * (mask_stride * h)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h * 2, 1, 24, 0, len(rows), 0, 0, 0, 0
        )
        payload = info + rows + mask
        dirs.append(
            struct.pack(
                "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 24,
                len(payload), off,
            )
        )
        bodies.append(payload)
        off += len(payload)
    return (
        b"\x00\x00\x01\x00" + struct.pack("<H", len(images))
        + b"".join(dirs) + b"".join(bodies)
    )
