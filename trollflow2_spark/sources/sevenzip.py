"""7z archive reader/writer — stdlib only (``lzma`` + ``zlib``).

The archive dispatcher (`sources/scene.py`) already round-trips
zip/tar/gz/bz2/xz; 7z is the one mainstream container that previously
raised with guidance. The stdlib has no 7z module, but it DOES have raw
LZMA1/LZMA2 codecs (``lzma.FORMAT_RAW``), and the 7z container itself
is a parseable property grammar (7zFormat.txt, public spec): a start
header pointing at an end header that describes pack streams, folders
(coder chains), substream sizes and file names.

Scope — the shapes real single-volume archives use:

- coders: Copy (0x00), LZMA1 (0x030101), LZMA2 (0x21); one coder per
  folder (the default for non-filtered archives). BCJ/delta filter
  chains and encryption raise with guidance.
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
    else:
        raise NotImplementedError(
            f"7z coder {coder_id.hex()} not supported (Copy/LZMA1/LZMA2 "
            "are; BCJ filter chains and AES need libs outside stdlib)"
        )
    if len(out) != unpack_size:
        raise ValueError("7z: folder decoded to the wrong size")
    return out


def _parse_streams_info(r: _Reader):
    """Parse a StreamsInfo block -> (pack_pos, pack_sizes, folders,
    sub_sizes, sub_crcs) where folders = [(coder_id, props,
    unpack_size)], sub_sizes = per-folder substream sizes, and
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
                if n_coders != 1:
                    raise NotImplementedError(
                        "7z: multi-coder folders (filter chains) not "
                        "supported"
                    )
                flag = r.byte()
                id_size = flag & 0x0F
                coder_id = r.bytes(id_size)
                if flag & 0x10:  # complex coder
                    raise NotImplementedError("7z: complex coders")
                props = b""
                if flag & 0x20:
                    props = r.bytes(r.number())
                raw_folders.append((coder_id, props))
            if r.number() != _K_UNPACK_SIZES:
                raise ValueError("7z: missing kCodersUnpackSize")
            sizes = [r.number() for _ in range(len(raw_folders))]
            folders = [
                (cid, props, size)
                for (cid, props), size in zip(raw_folders, sizes)
            ]
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
    for (cid, props, usize), psize in zip(folders, pack_sizes):
        out.append(_decode_folder(cid, props, data[off:off + psize], usize))
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
            cid, props, usize = folders[fidx]
            fb = _decode_folder(
                cid, props,
                data[offs[fidx]:offs[fidx] + pack_sizes[fidx]], usize,
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


def write_7z(
    members: list[tuple[str, bytes]],
    codec: str = "lzma2",
    encode_header: bool = False,
) -> bytes:
    """Write a single-folder solid 7z archive. ``codec`` is ``copy`` or
    ``lzma2``; ``encode_header=True`` compresses the end header itself
    (the 0x17 path every real 7-Zip archive uses)."""
    payload = b"".join(p for _n, p in members)
    sizes = [len(p) for _n, p in members]
    if codec == "copy":
        coder_id, props = _COPY, b""
        packed = payload
    elif codec == "lzma2":
        coder_id, props = _LZMA2, bytes([22])  # 8 MiB dictionary
        packed = lzma.compress(
            payload, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}],
        )
    elif codec == "lzma1":
        # FORMAT_ALONE = 5 props bytes + 8-byte size + raw LZMA1 stream;
        # 7z stores exactly those 5 props bytes as the coder property
        alone = lzma.compress(
            payload, format=lzma.FORMAT_ALONE,
            filters=[{"id": lzma.FILTER_LZMA1, "preset": 6,
                      "dict_size": 1 << 23}],
        )
        coder_id, props = _LZMA1, alone[:5]
        packed = alone[13:]
    else:
        raise ValueError("codec must be 'copy', 'lzma1' or 'lzma2'")

    def streams_info(w: _Writer, pack_pos: int, packed_len: int,
                     unpack_len: int, sub: list[int] | None,
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
        w.number(1)  # one coder
        w.byte(len(coder_id) | (0x20 if props else 0))
        w.raw(coder_id)
        if props:
            w.number(len(props))
            w.raw(props)
        w.number(_K_UNPACK_SIZES)
        w.number(unpack_len)
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
    streams_info(hw, 0, len(packed), len(payload), sizes, crcs)
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
