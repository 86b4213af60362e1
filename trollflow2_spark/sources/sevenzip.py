"""7z archive reader/writer — stdlib only (``lzma`` + ``zlib``).

The archive dispatcher (`sources/scene.py`) already round-trips
zip/tar/gz/bz2/xz; 7z is the one mainstream container that previously
raised with guidance. The stdlib has no 7z module, but it DOES have raw
LZMA1/LZMA2 codecs (``lzma.FORMAT_RAW``), and the 7z container itself
is a parseable property grammar (7zFormat.txt, public spec): a start
header pointing at an end header that describes pack streams, folders
(coder chains), substream sizes and file names.

Scope — the shapes real single-volume archives use:

- coders: Copy (0x00), LZMA1 (0x030101), LZMA2 (0x21), Delta (0x03),
  and x86 BCJ (0x04, plus the legacy 0x03030103 id) — including
  LINEAR filter chains (multi-coder folders with bind pairs, e.g.
  BCJ→LZMA2, the layout 7-Zip emits for executables). Non-linear
  coder graphs (BCJ2's 4-input join) and encryption raise with
  guidance.
- multiple files per folder (solid archives) via SubStreamsInfo;
  empty-stream entries (directories / empty files) honored.
- encoded headers (0x17): the header itself compressed as a one-folder
  stream — the default for any archive 7-Zip writes — handled by
  recursive decode.
- CRC32 checks applied where the archive carries digests.

The writer exists for fixtures and round-trip tests: Copy or LZMA2
single-folder solid archives with UTF-16 names, optionally with an
encoded (LZMA2) header so the reader's recursive path is exercised.

The reference round-trips only zip in its tests
(`/root/reference/trollflow2/tests/test_launcher.py:205-246`); this
module extends the matrix the same way the tar/xz support already did.
"""

from __future__ import annotations

import lzma
import struct
import zlib

import numpy as np

_SIGNATURE = b"7z\xbc\xaf\x27\x1c"

# property ids (7zFormat.txt)
_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZES = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17

_COPY = b"\x00"
_LZMA1 = b"\x03\x01\x01"
_LZMA2 = b"\x21"
_DELTA = b"\x03"
_BCJ_X86 = b"\x04"
_BCJ_X86_OLD = b"\x03\x03\x01\x03"


# ---------------------------------------------------------------------------
# branch-convert filters (public specs: 7-Zip Bra86 / xz x86 + delta)


def _delta_decode(data: bytes, dist: int) -> bytes:
    """Delta filter decode: ``out[i] = in[i] + out[i-dist] (mod 256)``
    — a per-residue-class running sum, vectorized as a column-wise
    uint8 cumsum (uint8 accumulation wraps mod 256 by definition)."""
    arr = np.frombuffer(data, np.uint8)
    pad = (-len(arr)) % dist
    a = np.concatenate([arr, np.zeros(pad, np.uint8)]).reshape(-1, dist)
    out = np.cumsum(a, axis=0, dtype=np.uint8).reshape(-1)
    return out[:len(arr)].tobytes()


def _delta_encode(data: bytes, dist: int) -> bytes:
    arr = np.frombuffer(data, np.uint8)
    out = arr.copy()
    out[dist:] = arr[dist:] - arr[:-dist]  # uint8 wraps mod 256
    return out.tobytes()


def _x86_msb(b: int) -> bool:
    return b == 0x00 or b == 0xFF


def _x86_convert(data: bytes, encoding: bool) -> bytes:
    """x86 BCJ filter (7-Zip ``Bra86.c`` / xz ``x86.c`` algorithm,
    public spec): rewrites the 32-bit displacement of E8/E9
    call/jump instructions between relative and absolute form so the
    compressor sees repeated absolute targets. ``encoding=True`` is
    the compress-side direction (rel→abs); decode restores the
    original bytes. Whole-buffer, start ip 0 (the 7z folder case)."""
    buf = bytearray(data)
    size = len(buf)
    if size < 5:
        return bytes(buf)
    end = size - 4
    pos = 0
    mask = 0
    while True:
        p = pos
        while p < end and (buf[p] & 0xFE) != 0xE8:
            p += 1
        d = p - pos
        pos = p
        if p >= end:
            return bytes(buf)
        if d > 2:
            mask = 0
        else:
            mask >>= d
            if mask != 0 and (
                mask > 4 or mask == 3
                or _x86_msb(buf[p + (mask >> 1) + 1])
            ):
                mask = (mask >> 1) | 4
                pos += 1
                continue
        if _x86_msb(buf[p + 4]):
            v = (
                (buf[p + 4] << 24) | (buf[p + 3] << 16)
                | (buf[p + 2] << 8) | buf[p + 1]
            )
            cur = (5 + pos) & 0xFFFFFFFF  # ip starts at 0 → ip+5
            pos += 5
            if encoding:
                v = (v + cur) & 0xFFFFFFFF
            else:
                v = (v - cur) & 0xFFFFFFFF
            if mask != 0:
                sh = (mask & 6) << 2
                if _x86_msb((v >> sh) & 0xFF):
                    v ^= (0x100 << sh) - 1
                    if encoding:
                        v = (v + cur) & 0xFFFFFFFF
                    else:
                        v = (v - cur) & 0xFFFFFFFF
                mask = 0
            buf[p + 1] = v & 0xFF
            buf[p + 2] = (v >> 8) & 0xFF
            buf[p + 3] = (v >> 16) & 0xFF
            buf[p + 4] = (-((v >> 24) & 1)) & 0xFF
        else:
            mask = (mask >> 1) | 4
            pos += 1


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes) -> None:
        self.b = b
        self.i = 0

    def byte(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def bytes(self, n: int) -> bytes:
        v = self.b[self.i:self.i + n]
        if len(v) != n:
            raise ValueError("7z: truncated header")
        self.i += n
        return v

    def number(self) -> int:
        """7z variable-length number (spec ReadNumber)."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if (first & mask) == 0:
                high = first & (mask - 1)
                return value | (high << (8 * i))
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitvector(self, n: int) -> list[bool]:
        out = []
        mask = 0
        byte = 0
        for _ in range(n):
            if mask == 0:
                byte = self.byte()
                mask = 0x80
            out.append(bool(byte & mask))
            mask >>= 1
        return out

    def bitvector_or_all(self, n: int) -> list[bool]:
        return [True] * n if self.byte() else self.bitvector(n)


def _lzma2_dict_size(prop: int) -> int:
    if prop > 40:
        raise ValueError("7z: bad LZMA2 dictionary property")
    if prop == 40:
        return 0xFFFFFFFF
    return (2 | (prop & 1)) << (prop // 2 + 11)


def _decode_folder(coder_id: bytes, props: bytes, packed: bytes,
                   unpack_size: int) -> bytes:
    if coder_id == _COPY:
        out = packed[:unpack_size]
    elif coder_id == _LZMA2:
        if len(props) != 1:
            raise ValueError("7z: LZMA2 needs a 1-byte property")
        filt = [{"id": lzma.FILTER_LZMA2,
                 "dict_size": min(_lzma2_dict_size(props[0]), 1 << 30)}]
        out = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW, filters=filt
        ).decompress(packed, unpack_size)
    elif coder_id == _LZMA1:
        if len(props) != 5:
            raise ValueError("7z: LZMA1 needs a 5-byte property")
        d = props[0]
        lc, rem = d % 9, d // 9
        lp, pb = rem % 5, rem // 5
        dict_size = struct.unpack("<I", props[1:5])[0]
        filt = [{"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp, "pb": pb,
                 "dict_size": max(dict_size, 1 << 12)}]
        out = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW, filters=filt
        ).decompress(packed, unpack_size)
    elif coder_id == _DELTA:
        if len(props) != 1:
            raise ValueError("7z: Delta needs a 1-byte property")
        out = _delta_decode(packed, props[0] + 1)
    elif coder_id in (_BCJ_X86, _BCJ_X86_OLD):
        out = _x86_convert(packed, encoding=False)
    else:
        raise NotImplementedError(
            f"7z coder {coder_id.hex()} not supported (Copy/LZMA1/LZMA2/"
            "Delta/x86-BCJ are; BCJ2 and AES need non-linear graphs or "
            "libs outside stdlib)"
        )
    if len(out) != unpack_size:
        raise ValueError("7z: folder decoded to the wrong size")
    return out


def _decode_chain(chain, packed: bytes) -> bytes:
    """Run a linearized coder chain (decode order: packed → … →
    final) produced by `_linearize_folder`."""
    data = packed
    for coder_id, props, out_size in chain:
        data = _decode_folder(coder_id, props, data, out_size)
    return data


def _linearize_folder(coders, bind_pairs, packed_idx, out_sizes):
    """Reduce a folder's coder graph to decode order.

    Only SIMPLE coders (1 in / 1 out) in a linear chain are in scope —
    the layout every filter-chain archive 7-Zip writes (e.g. packed →
    LZMA2 → BCJ). With one stream per coder, in-stream index i and
    out-stream index i both belong to coder i, so the chain starts at
    the coder fed by the single packed stream and follows bind pairs
    (in ← out) until the unbound output. Non-linear graphs (BCJ2)
    raise with guidance.

    Returns ``(chain, n_packed, final_size)`` where ``chain`` is
    ``[(coder_id, props, out_size)]`` in decode order — element [2]
    keeps the folder's final unpack size so StreamsInfo consumers are
    unchanged."""
    if any(c[2] != 1 or c[3] != 1 for c in coders):
        raise NotImplementedError(
            "7z: complex coders (BCJ2-style multi-stream) not supported"
        )
    if len(packed_idx) != 1:
        raise NotImplementedError(
            "7z: folders with multiple pack streams not supported"
        )
    out_to_next = {}
    for in_i, out_j in bind_pairs:
        if out_j in out_to_next:
            raise ValueError("7z: output stream bound twice")
        out_to_next[out_j] = in_i
    chain = []
    c = packed_idx[0]
    seen = set()
    while True:
        if c in seen or c >= len(coders):
            raise ValueError("7z: cyclic or out-of-range coder graph")
        seen.add(c)
        chain.append((coders[c][0], coders[c][1], out_sizes[c]))
        if c not in out_to_next:
            break
        c = out_to_next[c]
    if len(chain) != len(coders):
        raise NotImplementedError("7z: non-linear coder graph")
    return (chain, 1, chain[-1][2])


def _parse_streams_info(r: _Reader):
    """Parse a StreamsInfo block -> (pack_pos, pack_sizes, folders,
    sub_sizes, sub_crcs) where folders = [(decode_chain, n_packed,
    unpack_size)] (see `_linearize_folder`; element [2] is the final
    unpack size), sub_sizes = per-folder substream sizes, and
    sub_crcs = per-substream expected CRC32 (or None when the archive
    carries none) in global stream order."""
    pack_pos = 0
    pack_sizes: list[int] = []
    folders: list[tuple] = []
    folder_crcs: list = []
    sub_sizes = None
    sub_crcs = None
    n_per_folder = None
    while True:
        pid = r.number()
        if pid == _K_END:
            break
        if pid == _K_PACK_INFO:
            pack_pos = r.number()
            n_pack = r.number()
            while True:
                p = r.number()
                if p == _K_END:
                    break
                if p == _K_SIZE:
                    pack_sizes = [r.number() for _ in range(n_pack)]
                elif p == _K_CRC:
                    defined = r.bitvector_or_all(n_pack)
                    for d in defined:
                        if d:
                            r.bytes(4)
                else:
                    raise ValueError(f"7z: unexpected PackInfo prop {p}")
        elif pid == _K_UNPACK_INFO:
            if r.number() != _K_FOLDER:
                raise ValueError("7z: UnpackInfo without kFolder")
            n_folders = r.number()
            if r.byte() != 0:
                raise NotImplementedError("7z: external folder data")
            raw_folders = []
            for _ in range(n_folders):
                n_coders = r.number()
                coders = []
                total_in = total_out = 0
                for _c in range(n_coders):
                    flag = r.byte()
                    coder_id = r.bytes(flag & 0x0F)
                    if flag & 0x10:  # complex coder: explicit counts
                        n_in, n_out = r.number(), r.number()
                    else:
                        n_in = n_out = 1
                    props = b""
                    if flag & 0x20:
                        props = r.bytes(r.number())
                    coders.append((coder_id, props, n_in, n_out))
                    total_in += n_in
                    total_out += n_out
                bind_pairs = [
                    (r.number(), r.number())
                    for _ in range(total_out - 1)
                ]
                n_packed = total_in - len(bind_pairs)
                if n_packed == 1:
                    bound_in = {i for i, _o in bind_pairs}
                    packed_idx = [
                        i for i in range(total_in) if i not in bound_in
                    ]
                else:
                    packed_idx = [r.number() for _ in range(n_packed)]
                raw_folders.append((coders, bind_pairs, packed_idx))
            if r.number() != _K_UNPACK_SIZES:
                raise ValueError("7z: missing kCodersUnpackSize")
            folders = []
            for coders, bind_pairs, packed_idx in raw_folders:
                n_out = sum(c[3] for c in coders)
                out_sizes = [r.number() for _ in range(n_out)]
                folders.append(
                    _linearize_folder(
                        coders, bind_pairs, packed_idx, out_sizes
                    )
                )
            folder_crcs = [None] * len(folders)
            while True:
                p = r.number()
                if p == _K_END:
                    break
                if p == _K_CRC:
                    defined = r.bitvector_or_all(len(folders))
                    for fi, d in enumerate(defined):
                        if d:
                            folder_crcs[fi] = struct.unpack(
                                "<I", r.bytes(4)
                            )[0]
                else:
                    raise ValueError(f"7z: unexpected UnpackInfo prop {p}")
        elif pid == _K_SUBSTREAMS:
            n_per_folder = [1] * len(folders)
            sub_sizes = None
            while True:
                p = r.number()
                if p == _K_END:
                    break
                if p == _K_NUM_UNPACK_STREAM:
                    n_per_folder = [r.number() for _ in folders]
                elif p == _K_SIZE:
                    sub_sizes = []
                    for fi, n in enumerate(n_per_folder):
                        sizes = [r.number() for _ in range(n - 1)]
                        sizes.append(folders[fi][2] - sum(sizes))
                        sub_sizes.append(sizes)
                elif p == _K_CRC:
                    # spec: digests cover only streams whose CRC is not
                    # already known — a single-substream folder with a
                    # defined folder CRC is excluded
                    known = [
                        n == 1 and fc is not None
                        for n, fc in zip(
                            n_per_folder, folder_crcs or [None] * len(folders)
                        )
                    ]
                    n_unknown = sum(
                        n for n, k in zip(n_per_folder, known) if not k
                    )
                    defined = r.bitvector_or_all(n_unknown)
                    unk_vals = [
                        struct.unpack("<I", r.bytes(4))[0] if d else None
                        for d in defined
                    ]
                    sub_crcs = []
                    ui = 0
                    for fi, n in enumerate(n_per_folder):
                        if known[fi]:
                            sub_crcs.append(folder_crcs[fi])
                        else:
                            for _ in range(n):
                                sub_crcs.append(unk_vals[ui])
                                ui += 1
                else:
                    raise ValueError(f"7z: unexpected SubStreams prop {p}")
            if sub_sizes is None:
                sub_sizes = [
                    [folders[fi][2]] if n == 1 else None
                    for fi, n in enumerate(n_per_folder)
                ]
                if any(s is None for s in sub_sizes):
                    raise ValueError("7z: multi-stream folder without sizes")
        else:
            raise ValueError(f"7z: unexpected StreamsInfo prop {pid}")
    if sub_sizes is None:
        sub_sizes = [[f[2]] for f in folders]
    if (
        sub_crcs is None
        and any(fc is not None for fc in folder_crcs)
        and all(len(x) == 1 for x in sub_sizes)
    ):
        # no SubStreamsInfo digests, but folder digests exist and every
        # folder is a single stream — the folder CRC IS the stream CRC
        sub_crcs = list(folder_crcs)
    return pack_pos, pack_sizes, folders, sub_sizes, sub_crcs


def _decode_all_folders(data: bytes, base: int, pack_pos, pack_sizes,
                        folders) -> list[bytes]:
    out = []
    off = base + pack_pos
    for (chain, _np, _usize), psize in zip(folders, pack_sizes):
        out.append(_decode_chain(chain, data[off:off + psize]))
        off += psize
    return out


def parse_7z(data: bytes, members=None) -> list[tuple[str, bytes]]:
    """Parse a 7z archive into ``[(name, payload)]``. Empty files yield
    empty payloads; directory entries are marked with a trailing '/'.
    Carried CRC32 digests (folder or substream) are VERIFIED against
    the decoded payloads. With ``members`` (an iterable of names), only
    the folders containing a requested member are decompressed — the
    single-member-from-a-big-archive case never decodes the rest."""
    if data[:6] != _SIGNATURE:
        raise ValueError("not a 7z archive")
    crc_stored = struct.unpack("<I", data[8:12])[0]
    start = data[12:32]
    if zlib.crc32(start) != crc_stored:
        raise ValueError("7z: start-header CRC mismatch")
    nh_off, nh_size, nh_crc = struct.unpack("<QQI", start)
    header = data[32 + nh_off:32 + nh_off + nh_size]
    if len(header) != nh_size:
        raise ValueError("7z: truncated end header")
    if zlib.crc32(header) != nh_crc:
        raise ValueError("7z: end-header CRC mismatch")

    r = _Reader(header)
    tid = r.number()
    if tid == _K_ENCODED_HEADER:
        pack_pos, pack_sizes, folders, _sub, _crc = _parse_streams_info(r)
        decoded = _decode_all_folders(data, 32, pack_pos, pack_sizes, folders)
        r = _Reader(b"".join(decoded))
        tid = r.number()
    if tid != _K_HEADER:
        raise ValueError("7z: missing header marker")

    folders = []
    pack_pos = 0
    pack_sizes: list[int] = []
    sub_sizes = [[0]]
    sub_crcs = None
    names: list[str] = []
    empty_stream: list[bool] = []
    empty_file: list[bool] = []
    n_files = 0
    while True:
        pid = r.number()
        if pid == _K_END:
            break
        if pid == _K_MAIN_STREAMS:
            pack_pos, pack_sizes, folders, sub_sizes, sub_crcs = (
                _parse_streams_info(r)
            )
        elif pid == _K_FILES_INFO:
            n_files = r.number()
            empty_stream = [False] * n_files
            empty_file = []
            while True:
                p = r.number()
                if p == _K_END:
                    break
                size = r.number()
                end = r.i + size
                if p == _K_EMPTY_STREAM:
                    empty_stream = r.bitvector(n_files)
                elif p == _K_NAME:
                    if r.byte() != 0:
                        raise NotImplementedError("7z: external names")
                    # UTF-16LE names, NUL-terminated back to back
                    u = r.bytes(end - r.i).decode("utf-16-le")
                    names = [part for part in u.split("\x00") if part != ""]
                elif p == _K_EMPTY_FILE:
                    n_empty = sum(empty_stream)
                    empty_file = r.bitvector(n_empty)
                else:
                    pass  # mtime/attributes: skipped
                r.i = end
        else:
            raise ValueError(f"7z: unexpected header prop {pid}")

    if not names:
        names = [f"member{i}" for i in range(n_files)]
    # directory entries: empty stream WITHOUT the empty-file flag
    ei = 0
    is_dir = [False] * n_files
    for fi in range(n_files):
        if empty_stream[fi]:
            is_empty_file = empty_file[ei] if ei < len(empty_file) else True
            is_dir[fi] = not empty_file or not is_empty_file
            if not empty_file:
                # no kEmptyFile record at all: 7z convention is that
                # bare empty streams are directories — but archives our
                # writer produces carry no directories, and telling the
                # two apart without the record is impossible; treat as
                # empty FILES unless attributes say otherwise
                is_dir[fi] = False
            ei += 1

    # map each non-empty file to its (folder, offset, size, crc)
    stream_meta = []  # (folder_idx, offset_in_folder, size, expected_crc)
    si = 0
    for fi_, sizes in enumerate(sub_sizes):
        off = 0
        for sz in sizes:
            crc = sub_crcs[si] if sub_crcs else None
            stream_meta.append((fi_, off, sz, crc))
            off += sz
            si += 1
    file_stream = []  # per file: stream index or None
    pi = 0
    for fi in range(n_files):
        if empty_stream[fi]:
            file_stream.append(None)
        else:
            file_stream.append(pi)
            pi += 1

    want = None if members is None else {m.rstrip("/") for m in members}
    needed_folders = set()
    for fi in range(n_files):
        st = file_stream[fi]
        if st is None:
            continue
        if want is None or names[fi] in want:
            needed_folders.add(stream_meta[st][0])

    decoded: dict[int, bytes] = {}
    if folders and needed_folders:
        off = 32 + pack_pos
        offs = []
        for psize in pack_sizes:
            offs.append(off)
            off += psize
        for fidx in sorted(needed_folders):
            chain, _np, _usize = folders[fidx]
            fb = _decode_chain(
                chain, data[offs[fidx]:offs[fidx] + pack_sizes[fidx]]
            )
            decoded[fidx] = fb

    out = []
    for fi in range(n_files):
        name = names[fi] + ("/" if is_dir[fi] else "")
        st = file_stream[fi]
        if st is None:
            if want is None or names[fi] in want:
                out.append((name, b""))
            continue
        if want is not None and names[fi] not in want:
            continue
        fidx, off_in, sz, crc = stream_meta[st]
        payload = decoded[fidx][off_in:off_in + sz]
        if crc is not None and zlib.crc32(payload) != crc:
            raise ValueError(f"7z: CRC mismatch for member {names[fi]!r}")
        out.append((name, payload))
    return out


# ---------------------------------------------------------------------------
# writer (fixtures / tests)


class _Writer:
    def __init__(self) -> None:
        self.b = bytearray()

    def byte(self, v: int) -> None:
        self.b.append(v)

    def raw(self, v: bytes) -> None:
        self.b += v

    def number(self, v: int) -> None:
        """Spec-conformant variable-length number: ``i`` extra bytes
        means the first byte carries ``i`` leading 1-bits, a 0, then
        the value's high bits; the low ``8*i`` bits follow
        little-endian."""
        if v < 0x80:
            self.b.append(v)
            return
        for i in range(1, 8):
            if v < (1 << (8 * i + 7 - i)):
                high = v >> (8 * i)
                first = ((0xFF << (8 - i)) & 0xFF) | high
                self.b.append(first)
                self.b += (v & ((1 << (8 * i)) - 1)).to_bytes(i, "little")
                return
        self.b.append(0xFF)
        self.b += v.to_bytes(8, "little")


def _lzma2_raw(payload: bytes) -> bytes:
    return lzma.compress(
        payload, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}],
    )


def write_7z(
    members: list[tuple[str, bytes]],
    codec: str = "lzma2",
    encode_header: bool = False,
    delta_dist: int = 4,
) -> bytes:
    """Write a single-folder solid 7z archive. ``codec`` is ``copy``,
    ``lzma1``, ``lzma2``, ``bcj+lzma2`` (x86 filter chain) or
    ``delta+lzma2``; ``encode_header=True`` compresses the end header
    itself (the 0x17 path every real 7-Zip archive uses). Filter-chain
    archives carry two coders and a bind pair, exactly the folder
    grammar 7-Zip emits for executables (BCJ) and audio (Delta)."""
    payload = b"".join(p for _n, p in members)
    sizes = [len(p) for _n, p in members]
    bind_pairs: list[tuple[int, int]] = []
    if codec == "copy":
        coders = [(_COPY, b"")]
        out_sizes = [len(payload)]
        packed = payload
    elif codec == "lzma2":
        coders = [(_LZMA2, bytes([22]))]  # 8 MiB dictionary
        out_sizes = [len(payload)]
        packed = _lzma2_raw(payload)
    elif codec == "lzma1":
        # FORMAT_ALONE = 5 props bytes + 8-byte size + raw LZMA1 stream;
        # 7z stores exactly those 5 props bytes as the coder property
        alone = lzma.compress(
            payload, format=lzma.FORMAT_ALONE,
            filters=[{"id": lzma.FILTER_LZMA1, "preset": 6,
                      "dict_size": 1 << 23}],
        )
        coders = [(_LZMA1, alone[:5])]
        out_sizes = [len(payload)]
        packed = alone[13:]
    elif codec == "bcj+lzma2":
        # decode flow packed → LZMA2 → BCJ: coder 0 = LZMA2 (fed by the
        # pack stream), coder 1 = BCJ, bind pair BCJ.in(1) ← LZMA2.out(0)
        filtered = _x86_convert(payload, encoding=True)
        coders = [(_LZMA2, bytes([22])), (_BCJ_X86, b"")]
        bind_pairs = [(1, 0)]
        out_sizes = [len(filtered), len(payload)]
        packed = _lzma2_raw(filtered)
    elif codec == "delta+lzma2":
        filtered = _delta_encode(payload, delta_dist)
        coders = [(_LZMA2, bytes([22])), (_DELTA, bytes([delta_dist - 1]))]
        bind_pairs = [(1, 0)]
        out_sizes = [len(filtered), len(payload)]
        packed = _lzma2_raw(filtered)
    else:
        raise ValueError(
            "codec must be 'copy', 'lzma1', 'lzma2', 'bcj+lzma2' or "
            "'delta+lzma2'"
        )

    def streams_info(w: _Writer, pack_pos: int, packed_len: int,
                     sub: list[int] | None,
                     crcs: list[int] | None = None) -> None:
        w.number(_K_PACK_INFO)
        w.number(pack_pos)
        w.number(1)
        w.number(_K_SIZE)
        w.number(packed_len)
        w.number(_K_END)
        w.number(_K_UNPACK_INFO)
        w.number(_K_FOLDER)
        w.number(1)
        w.byte(0)  # not external
        w.number(len(coders))
        for coder_id, props in coders:
            w.byte(len(coder_id) | (0x20 if props else 0))
            w.raw(coder_id)
            if props:
                w.number(len(props))
                w.raw(props)
        for in_i, out_j in bind_pairs:
            w.number(in_i)
            w.number(out_j)
        # n_packed == 1 → the pack-stream index is implicit
        w.number(_K_UNPACK_SIZES)
        for s in out_sizes:
            w.number(s)
        w.number(_K_END)
        if sub is not None and (len(sub) != 1 or crcs):
            w.number(_K_SUBSTREAMS)
            if len(sub) != 1:
                w.number(_K_NUM_UNPACK_STREAM)
                w.number(len(sub))
                w.number(_K_SIZE)
                for s in sub[:-1]:
                    w.number(s)
            if crcs:
                w.number(_K_CRC)
                w.byte(1)  # all digests defined
                for c in crcs:
                    w.raw(struct.pack("<I", c))
            w.number(_K_END)
        w.number(_K_END)

    crcs = [zlib.crc32(pme) for _n, pme in members]
    hw = _Writer()
    hw.number(_K_HEADER)
    hw.number(_K_MAIN_STREAMS)
    streams_info(hw, 0, len(packed), sizes, crcs)
    hw.number(_K_FILES_INFO)
    hw.number(len(members))
    names_raw = b"".join(
        n.encode("utf-16-le") + b"\x00\x00" for n, _p in members
    )
    hw.number(_K_NAME)
    hw.number(len(names_raw) + 1)
    hw.byte(0)  # not external
    hw.raw(names_raw)
    hw.number(_K_END)
    hw.number(_K_END)
    header = bytes(hw.b)

    body = packed
    if encode_header:
        hpacked = lzma.compress(
            header, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}],
        )
        ew = _Writer()
        ew.number(_K_ENCODED_HEADER)
        # reuse the same single-coder LZMA2 grammar for the header folder
        ew.number(_K_PACK_INFO)
        ew.number(len(packed))  # header pack stream sits after the data
        ew.number(1)
        ew.number(_K_SIZE)
        ew.number(len(hpacked))
        ew.number(_K_END)
        ew.number(_K_UNPACK_INFO)
        ew.number(_K_FOLDER)
        ew.number(1)
        ew.byte(0)
        ew.number(1)
        ew.byte(len(_LZMA2) | 0x20)
        ew.raw(_LZMA2)
        ew.number(1)
        ew.raw(bytes([22]))
        ew.number(_K_UNPACK_SIZES)
        ew.number(len(header))
        ew.number(_K_END)
        ew.number(_K_END)
        body = packed + hpacked
        header = bytes(ew.b)

    nh_off = len(body)  # header bytes follow the body
    out_header = header
    start = struct.pack("<QQI", nh_off, len(out_header),
                        zlib.crc32(out_header))
    return (
        _SIGNATURE
        + b"\x00\x04"
        + struct.pack("<I", zlib.crc32(start))
        + start
        + body
        + out_header
    )
