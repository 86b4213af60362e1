"""From-scratch Brotli (RFC 7932) decoder for the WARC intake.

A large minority of real Common Crawl HTTP bodies arrive with
``content-encoding: br``; until this module the crawl tier kept them raw
(quarantined by the encoding-hygiene gates). This is the same
from-scratch, conformance-pinned approach as the repo's zstd decoder
(``zstdcodec.py``): the ALGORITHM is implemented here from the public
RFC, and the suite pins byte-exactness against the system ``libbrotli``
across content shapes and quality levels
(``tests/test_brotli_conformance.py``).

The RFC's large DATA tables — the 122,784-byte static dictionary
(Appendix A), the 121 word transforms (Appendix B), and the UTF-8 /
signed context lookup tables (Section 7.1) — are pure data, published in
the RFC itself; rather than vendoring ~125 KB of constants, they are
read at import-from-first-use time out of the system
``libbrotlicommon`` (which exports them: ``BrotliGetDictionary``,
``BrotliGetTransforms``, ``_kBrotliContextLookupTable``) and validated
against RFC-known invariants. Where the library is absent, streams that
never touch the dictionary or the table-driven context modes still
decode; the rest raise ``ValueError`` with guidance.

Every corruption path raises ``ValueError`` — the WARC intake's
keep-raw-on-corruption contract (see ``warc.py:_CORRUPT_BODY``).

Reference behavior parity: the reference pipeline outsources all content
decoding to fsspec/satpy readers (e.g. ``/root/reference/trollflow2/
launcher.py`` reads only zip archives); crawl-format decoding is a
beyond-reference extension of this repo's intake tier.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from functools import lru_cache

# ---------------------------------------------------------------------------
# RFC data tables (extracted from libbrotlicommon, validated)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1)
def _common_lib():
    for name in ("libbrotlicommon.so.1", "libbrotlicommon.so",
                 ctypes.util.find_library("brotlicommon")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


class _BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


class _BrotliTransforms(ctypes.Structure):
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
        ("cut_off", ctypes.c_int16 * 10),
    ]


@lru_cache(maxsize=1)
def _static_dictionary():
    """(size_bits_by_length[32], offsets_by_length[32], data bytes)."""
    lib = _common_lib()
    if lib is None:
        raise ValueError(
            "brotli static dictionary unavailable (libbrotlicommon not "
            "found); streams referencing RFC 7932 Appendix A cannot decode"
        )
    lib.BrotliGetDictionary.restype = ctypes.POINTER(_BrotliDictionary)
    d = lib.BrotliGetDictionary().contents
    data = bytes(
        ctypes.cast(
            d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)
        ).contents
    )
    bits = list(d.size_bits_by_length)
    offs = list(d.offsets_by_length)
    # RFC invariants: 122,784 bytes; word lengths 4..24 populated
    if len(data) != 122784 or bits[4] != 10 or bits[24] != 5:
        raise ValueError("libbrotlicommon returned an unexpected dictionary")
    return bits, offs, data


@lru_cache(maxsize=1)
def _transforms():
    """List of (prefix bytes, transform type int, suffix bytes)."""
    lib = _common_lib()
    if lib is None:
        raise ValueError(
            "brotli transform table unavailable (libbrotlicommon not found)"
        )
    lib.BrotliGetTransforms.restype = ctypes.POINTER(_BrotliTransforms)
    t = lib.BrotliGetTransforms().contents
    if t.num_transforms != 121:
        raise ValueError("libbrotlicommon returned an unexpected transform set")
    ps = bytes(
        ctypes.cast(
            t.prefix_suffix,
            ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size),
        ).contents
    )

    def s(idx: int) -> bytes:
        off = t.prefix_suffix_map[idx]
        n = ps[off]
        return ps[off + 1 : off + 1 + n]

    out = []
    for i in range(121):
        p, ty, sf = (t.transforms[3 * i + j] for j in range(3))
        out.append((s(p), ty, s(sf)))
    return out


@lru_cache(maxsize=1)
def _context_lut():
    """2048-byte context lookup table: per mode m in {LSB6, MSB6, UTF8,
    Signed}, ctx = t[m*512 + p1] | t[m*512 + 256 + p2]."""
    lib = _common_lib()
    if lib is None:
        raise ValueError(
            "brotli context tables unavailable (libbrotlicommon not found)"
        )
    tbl = bytes((ctypes.c_uint8 * 2048).in_dll(lib, "_kBrotliContextLookupTable"))
    # RFC invariants: LSB6 is p1 & 0x3f with a zero p2 half
    if tbl[:64] != bytes(range(64)) or any(tbl[256:512]):
        raise ValueError("libbrotlicommon returned an unexpected context table")
    return tbl


# ---------------------------------------------------------------------------
# fixed RFC tables (small; stated in the spec text)
# ---------------------------------------------------------------------------

# RFC 7932 section 3.5: order in which code-length-code lengths appear
_CLC_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# fixed prefix code for the code-length code: peek 4 bits -> (value, nbits)
_CLC_VALUE = (0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)
_CLC_NBITS = (2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)

# RFC 7932 section 6: block count code ranges (offset, extra bits)
_BLOCK_LEN = (
    (1, 2), (5, 2), (9, 2), (13, 2), (17, 3), (25, 3), (33, 3), (41, 3),
    (49, 4), (65, 4), (81, 4), (97, 4), (113, 5), (145, 5), (177, 5),
    (209, 5), (241, 6), (305, 6), (369, 7), (497, 8), (753, 9), (1265, 10),
    (2289, 11), (4337, 12), (8433, 13), (16625, 24),
)

# RFC 7932 section 5: insert / copy length code ranges (offset, extra bits)
_INSERT_LEN = (
    (0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 1), (8, 1),
    (10, 2), (14, 2), (18, 3), (26, 3), (34, 4), (50, 4), (66, 5), (98, 5),
    (130, 6), (194, 7), (322, 8), (578, 9), (1090, 10), (2114, 12),
    (6210, 14), (22594, 24),
)
_COPY_LEN = (
    (2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0), (8, 0), (9, 0),
    (10, 1), (12, 1), (14, 2), (18, 2), (22, 3), (30, 3), (38, 4), (54, 4),
    (70, 5), (102, 5), (134, 6), (198, 7), (326, 8), (582, 9), (1094, 10),
    (2118, 24),
)

# RFC 7932 section 5: the 704 insert-and-copy codes split into 11 cells
# of 64; cell -> (insert code base, copy code base); cells 0-1 carry the
# implicit distance-code-0 flag
_CMD_CELL = (
    (0, 0), (0, 8), (0, 0), (0, 8), (8, 0), (8, 8),
    (0, 16), (16, 0), (8, 16), (16, 8), (16, 16),
)

# RFC 7932 section 4: distance short codes over the ring buffer
# (ring index delta, distance delta); index 0 = last distance
_DIST_SHORT = (
    (0, 0), (1, 0), (2, 0), (3, 0),
    (0, -1), (0, 1), (0, -2), (0, 2), (0, -3), (0, 3),
    (1, -1), (1, 1), (1, -2), (1, 2), (1, -3), (1, 3),
)


class _BitReader:
    """LSB-first bit reader over a bytes object."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def read(self, nbits: int) -> int:
        p = self.pos
        if p + nbits > self.n:
            raise ValueError("brotli: unexpected end of stream")
        self.pos = p + nbits
        byte, bit = p >> 3, p & 7
        v = int.from_bytes(
            self.data[byte : byte + ((bit + nbits + 7) >> 3)], "little"
        )
        return (v >> bit) & ((1 << nbits) - 1)

    def peek(self, nbits: int) -> int:
        p = self.pos
        byte, bit = p >> 3, p & 7
        v = int.from_bytes(
            self.data[byte : byte + ((bit + nbits + 7) >> 3)], "little"
        )
        return (v >> bit) & ((1 << nbits) - 1)

    def align_byte(self) -> None:
        pad = (-self.pos) & 7
        if pad and self.read(pad) != 0:
            raise ValueError("brotli: nonzero padding bits")

    def read_bytes(self, n: int) -> bytes:
        if self.pos & 7:
            raise ValueError("brotli: byte read while not byte-aligned")
        byte = self.pos >> 3
        if byte + n > len(self.data):
            raise ValueError("brotli: unexpected end of stream")
        self.pos += n * 8
        return self.data[byte : byte + n]


class _Prefix:
    """Canonical prefix code decoded by first-code walking (MSB-first
    code bits pulled from the LSB-first stream, per RFC 7932 s3.2)."""

    __slots__ = ("single", "count", "first_code", "syms_at", "max_len")

    def __init__(self, lengths_by_symbol: dict[int, int]):
        # lengths_by_symbol: symbol -> code length (>0); canonical order
        # is (length, symbol) ascending
        nz = sorted(lengths_by_symbol.items(), key=lambda kv: (kv[1], kv[0]))
        if len(nz) == 1:
            self.single = nz[0][0]
            return
        self.single = None
        max_len = nz[-1][1]
        count = [0] * (max_len + 1)
        for _, ln in nz:
            count[ln] += 1
        # kraft check: must be exactly full
        used = 0
        for ln in range(1, max_len + 1):
            used += count[ln] << (max_len - ln)
        if used != 1 << max_len:
            raise ValueError("brotli: prefix code is not exactly full")
        first_code = [0] * (max_len + 2)
        code = 0
        syms_at = [None] * (max_len + 1)
        i = 0
        for ln in range(1, max_len + 1):
            first_code[ln] = code
            syms_at[ln] = [s for s, l2 in nz[i : i + count[ln]]]
            i += count[ln]
            code = (code + count[ln]) << 1
        self.count = count
        self.first_code = first_code
        self.syms_at = syms_at
        self.max_len = max_len

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            idx = code - self.first_code[ln]
            if 0 <= idx < self.count[ln]:
                return self.syms_at[ln][idx]
        raise ValueError("brotli: invalid prefix code word")


def _simple_prefix(br: _BitReader, alphabet: int) -> _Prefix:
    nsym = br.read(2) + 1
    bits = max(1, (alphabet - 1).bit_length())
    syms = []
    for _ in range(nsym):
        s = br.read(bits)
        if s >= alphabet:
            raise ValueError("brotli: simple-code symbol out of alphabet")
        syms.append(s)
    if len(set(syms)) != nsym:
        raise ValueError("brotli: duplicate simple-code symbols")
    if nsym == 1:
        p = _Prefix.__new__(_Prefix)
        p.single = syms[0]
        return p
    if nsym == 2:
        syms.sort()
        lens = [1, 1]
    elif nsym == 3:
        syms = [syms[0]] + sorted(syms[1:])
        lens = [1, 2, 2]
    else:
        if br.read(1):  # tree-select: depth-3 shape
            syms = syms[:2] + sorted(syms[2:])
            lens = [1, 2, 3, 3]
        else:
            syms.sort()
            lens = [2, 2, 2, 2]
    # canonical assignment in the post-sort listed order: build a
    # lengths map keyed so (length, symbol) canonical order reproduces
    # the listed order — lengths here are already non-decreasing and
    # equal-length runs are sorted by symbol, so the plain canonical
    # constructor matches huffman.c exactly
    return _Prefix(dict(zip(syms, lens)))


def _complex_prefix(br: _BitReader, alphabet: int, hskip: int) -> _Prefix:
    # code lengths for the code-length code
    clc_len = {}
    space = 32
    num_codes = 0
    for sym in _CLC_ORDER[hskip:]:
        if space <= 0:
            break
        v = br.peek(4)
        ln = _CLC_NBITS[v]
        br.read(ln)
        clen = _CLC_VALUE[v]
        if clen:
            clc_len[sym] = clen
            space -= 32 >> clen
            num_codes += 1
    if num_codes == 0:
        raise ValueError("brotli: empty code-length code")
    if num_codes > 1 and space != 0:
        raise ValueError("brotli: code-length code over/under-subscribed")
    clc = _Prefix(clc_len)

    # symbol code lengths via the code-length code
    lengths: dict[int, int] = {}
    space = 32768
    sym = 0
    prev_len = 8  # RFC: initial repeated code length
    repeat = 0
    repeat_len = 0  # value being repeated (0 for code 17)
    last_was = 0  # 16 / 17 / 0
    while sym < alphabet and space > 0:
        code = clc.read(br)
        if code < 16:
            last_was = 0
            repeat = 0
            if code:
                lengths[sym] = code
                prev_len = code
                space -= 32768 >> code
            sym += 1
        else:
            extra = 2 if code == 16 else 3
            new_len = prev_len if code == 16 else 0
            if last_was == code:
                old = repeat
                repeat = ((repeat - 2) << extra) + 3 + br.read(extra)
                added = repeat - old
            else:
                repeat = 3 + br.read(extra)
                added = repeat
            last_was = code
            repeat_len = new_len
            if sym + added > alphabet:
                raise ValueError("brotli: code-length repeat overflows alphabet")
            for _ in range(added):
                if repeat_len:
                    lengths[sym] = repeat_len
                    space -= 32768 >> repeat_len
                sym += 1
    if space < 0:
        raise ValueError("brotli: code lengths over-subscribed")
    if len(lengths) == 0:
        raise ValueError("brotli: no symbols in prefix code")
    if len(lengths) == 1:
        p = _Prefix.__new__(_Prefix)
        p.single = next(iter(lengths))
        return p
    if space != 0:
        raise ValueError("brotli: code lengths under-subscribed")
    return _Prefix(lengths)


def _read_prefix(br: _BitReader, alphabet: int) -> _Prefix:
    hskip = br.read(2)
    if hskip == 1:
        return _simple_prefix(br, alphabet)
    return _complex_prefix(br, alphabet, hskip)


def _varlen_uint8(br: _BitReader) -> int:
    if not br.read(1):
        return 0
    n = br.read(3)
    if n == 0:
        return 1
    return br.read(n) + (1 << n)


def _read_block_count(br: _BitReader, tree: _Prefix) -> int:
    code = tree.read(br)
    if code >= 26:
        raise ValueError("brotli: invalid block count code")
    off, nbits = _BLOCK_LEN[code]
    return off + br.read(nbits)


def _read_context_map(br: _BitReader, size: int, ntrees: int) -> list[int]:
    rlemax = (br.read(4) + 1) if br.read(1) else 0
    tree = _read_prefix(br, ntrees + rlemax)
    cmap: list[int] = []
    while len(cmap) < size:
        sym = tree.read(br)
        if sym == 0:
            cmap.append(0)
        elif sym <= rlemax:
            reps = (1 << sym) + br.read(sym)
            if len(cmap) + reps > size:
                raise ValueError("brotli: context-map run overflows")
            cmap.extend([0] * reps)
        else:
            cmap.append(sym - rlemax)
    if br.read(1):  # inverse move-to-front
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            val = mtf[v]
            cmap[i] = val
            if v:
                del mtf[v]
                mtf.insert(0, val)
    if any(v >= ntrees for v in cmap):
        raise ValueError("brotli: context map value out of range")
    return cmap


def _uppercase_first(word: bytearray, pos: int = 0) -> int:
    """RFC 7932 Appendix B 'ferment' step; returns bytes consumed."""
    c = word[pos]
    if c < 192:
        if 97 <= c <= 122:
            word[pos] = c ^ 32
        return 1
    if c < 224:
        if pos + 1 < len(word):
            word[pos + 1] ^= 32
        return 2
    if pos + 2 < len(word):
        word[pos + 2] ^= 5
    return 3


def _apply_transform(word: bytes, tid: int) -> bytes:
    prefix, ty, suffix = _transforms()[tid]
    w = bytearray(word)
    if 12 <= ty <= 20:  # OmitFirst1..9
        cut = ty - 11
        w = w[cut:] if cut < len(w) else bytearray()
    elif 1 <= ty <= 9:  # OmitLast1..9
        cut = ty
        w = w[:-cut] if cut < len(w) else bytearray()
    elif ty == 10:  # UppercaseFirst
        if w:
            _uppercase_first(w, 0)
    elif ty == 11:  # UppercaseAll
        i = 0
        while i < len(w):
            i += _uppercase_first(w, i)
    elif ty != 0:
        raise ValueError(f"brotli: unknown transform type {ty}")
    return bytes(prefix) + bytes(w) + bytes(suffix)


class _BlockState:
    """Block-type / block-count machinery for one category."""

    __slots__ = ("n", "btype", "prev", "blen", "type_tree", "count_tree")

    def __init__(self, br: _BitReader):
        self.n = _varlen_uint8(br) + 1
        self.btype = 0
        self.prev = 1
        if self.n >= 2:
            self.type_tree = _read_prefix(br, self.n + 2)
            self.count_tree = _read_prefix(br, 26)
            self.blen = _read_block_count(br, self.count_tree)
        else:
            self.type_tree = None
            self.count_tree = None
            self.blen = 1 << 28

    def tick(self, br: _BitReader) -> None:
        """Consume one element; switch block type when the count runs out."""
        if self.blen == 0:
            sym = self.type_tree.read(br)
            if sym == 0:
                new = self.prev
            elif sym == 1:
                new = (self.btype + 1) % self.n
            else:
                new = sym - 2
            self.prev, self.btype = self.btype, new
            self.blen = _read_block_count(br, self.count_tree)
        self.blen -= 1


def brotli_decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Decompress one brotli stream. Raises ``ValueError`` on any
    corruption (the WARC intake contract)."""
    if not data:
        raise ValueError("brotli: empty input")
    br = _BitReader(data)

    # window bits (RFC 7932 section 9.1)
    if br.read(1) == 0:
        wbits = 16
    else:
        n = br.read(3)
        if n != 0:
            wbits = 17 + n
        else:
            n = br.read(3)
            if n == 0:
                wbits = 17
            elif n == 1:
                raise ValueError("brotli: reserved window-bits value")
            else:
                wbits = 8 + n
    window = (1 << wbits) - 16

    out = bytearray()
    # the distance ring buffer is per-STREAM, not per-meta-block: the
    # first command of a new meta-block may reference the last
    # distances of the previous one
    rb_state = [[16, 15, 11, 4], 0]
    islast = False
    while not islast:
        islast = bool(br.read(1))
        if islast and br.read(1):  # ISLASTEMPTY
            break
        mnib_code = br.read(2)
        if mnib_code == 3:  # metadata block
            if br.read(1):
                raise ValueError("brotli: reserved metadata bit set")
            mskipbytes = br.read(2)
            skip = 0
            for i in range(mskipbytes):
                b = br.read(8)
                if i == mskipbytes - 1 and mskipbytes > 1 and b == 0:
                    raise ValueError("brotli: non-minimal metadata length")
                skip |= b << (8 * i)
            mskiplen = skip + 1 if mskipbytes else 0
            br.align_byte()
            br.read_bytes(mskiplen)
            if islast:
                raise ValueError("brotli: metadata block cannot be last")
            continue
        nibbles = 4 + mnib_code
        mlen = 0
        for i in range(nibbles):
            nib = br.read(4)
            if i == nibbles - 1 and nibbles > 4 and nib == 0:
                raise ValueError("brotli: non-minimal MLEN encoding")
            mlen |= nib << (4 * i)
        mlen += 1
        if len(out) + mlen > max_output:
            raise ValueError("brotli: output exceeds max_output")

        if not islast and br.read(1):  # ISUNCOMPRESSED
            br.align_byte()
            out += br.read_bytes(mlen)
            continue

        _decode_meta_block(br, out, mlen, window, rb_state)

    br.align_byte()
    if br.pos != br.n:
        raise ValueError("brotli: trailing bytes after final meta-block")
    return bytes(out)


def _decode_meta_block(
    br: _BitReader, out: bytearray, mlen: int, window: int, rb_state: list
) -> None:
    blk_l = _BlockState(br)
    blk_i = _BlockState(br)
    blk_d = _BlockState(br)

    npostfix = br.read(2)
    ndirect = br.read(4) << npostfix

    cmodes = [br.read(2) for _ in range(blk_l.n)]

    ntrees_l = _varlen_uint8(br) + 1
    if ntrees_l >= 2:
        cmap_l = _read_context_map(br, blk_l.n * 64, ntrees_l)
    else:
        cmap_l = [0] * (blk_l.n * 64)
    ntrees_d = _varlen_uint8(br) + 1
    if ntrees_d >= 2:
        cmap_d = _read_context_map(br, blk_d.n * 4, ntrees_d)
    else:
        cmap_d = [0] * (blk_d.n * 4)

    lit_trees = [_read_prefix(br, 256) for _ in range(ntrees_l)]
    cmd_trees = [_read_prefix(br, 704) for _ in range(blk_i.n)]
    dist_alphabet = 16 + ndirect + (48 << npostfix)
    dist_trees = [_read_prefix(br, dist_alphabet) for _ in range(ntrees_d)]

    lut = None  # lazy: only table-driven context modes need it
    if any(m >= 2 for m in cmodes):
        lut = _context_lut()

    rb, rb_idx = rb_state[0], rb_state[1]
    produced = 0
    postfix_mask = (1 << npostfix) - 1

    while produced < mlen:
        blk_i.tick(br)
        cmd_code = cmd_trees[blk_i.btype].read(br)
        cell = cmd_code >> 6
        implicit_d0 = cell < 2
        ins_base, copy_base = _CMD_CELL[cell]
        low = cmd_code & 63
        ins_code = ins_base + (low >> 3)
        copy_code = copy_base + (low & 7)
        ioff, ibits = _INSERT_LEN[ins_code]
        insert_len = ioff + br.read(ibits)
        coff, cbits = _COPY_LEN[copy_code]
        copy_len = coff + br.read(cbits)

        # literals
        mode = cmodes[blk_l.btype]
        for _ in range(insert_len):
            blk_l.tick(br)
            mode = cmodes[blk_l.btype]
            p1 = out[-1] if len(out) >= 1 else 0
            p2 = out[-2] if len(out) >= 2 else 0
            if mode == 0:
                ctx = p1 & 0x3F
            elif mode == 1:
                ctx = p1 >> 2
            else:
                off = mode * 512
                ctx = lut[off + p1] | lut[off + 256 + p2]
            tree = lit_trees[cmap_l[(blk_l.btype << 6) + ctx]]
            out.append(tree.read(br))
            produced += 1
            if produced > mlen:
                raise ValueError("brotli: literals overflow MLEN")
        if produced >= mlen:
            break

        max_distance = min(len(out), window)

        if implicit_d0:
            distance = rb[(rb_idx - 1) & 3]
            dcode = 0
        else:
            blk_d.tick(br)
            # RFC s7.2: distance context is min(copy_len, 5) - 2
            ctx = min(copy_len, 5) - 2
            tree = dist_trees[cmap_d[(blk_d.btype << 2) + ctx]]
            dcode = tree.read(br)
            if dcode < 16:
                di, dd = _DIST_SHORT[dcode]
                distance = rb[(rb_idx - 1 - di) & 3] + dd
                if distance <= 0:
                    raise ValueError("brotli: non-positive short distance")
            elif dcode < 16 + ndirect:
                distance = dcode - 16 + 1
            else:
                dx = dcode - ndirect - 16
                hcode = dx >> npostfix
                lcode = dx & postfix_mask
                ndistbits = 1 + (hcode >> 1)
                extra = br.read(ndistbits)
                offset = ((2 + (hcode & 1)) << ndistbits) - 4
                distance = ((offset + extra) << npostfix) + lcode + ndirect + 1

        if distance <= max_distance:
            if dcode != 0:
                rb[rb_idx & 3] = distance
                rb_idx += 1
            if produced + copy_len > mlen:
                raise ValueError("brotli: copy overflows MLEN")
            start = len(out) - distance
            for j in range(copy_len):
                out.append(out[start + j])
            produced += copy_len
        else:
            # static dictionary reference
            bits, offs, dict_data = _static_dictionary()
            if copy_len < 4 or copy_len > 24 or bits[copy_len] == 0:
                raise ValueError("brotli: invalid dictionary word length")
            word_id = distance - max_distance - 1
            shift = bits[copy_len]
            index = word_id & ((1 << shift) - 1)
            tid = word_id >> shift
            if tid >= 121:
                raise ValueError("brotli: transform id out of range")
            base = offs[copy_len] + index * copy_len
            word = dict_data[base : base + copy_len]
            piece = _apply_transform(word, tid)
            out += piece
            produced += len(piece)
            if produced > mlen:
                raise ValueError("brotli: dictionary word overflows MLEN")
    if produced != mlen:
        raise ValueError("brotli: meta-block underfilled")
    rb_state[1] = rb_idx


# ---------------------------------------------------------------------------
# store-mode encoder (fixtures only — spec-valid uncompressed meta-blocks)
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit writer (the RFC 7932 bit order)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def align_byte(self) -> None:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0


def brotli_compress_store(data: bytes) -> bytes:
    """Spec-valid brotli stream holding ``data`` as ISUNCOMPRESSED
    meta-blocks (RFC 7932 section 9.2) plus the final last-empty block —
    the same fixture-only role as ``zstd_compress_store``: any brotli
    implementation decodes it, and no reference encoder is needed on
    executors. Real compressed streams are decode-only here, pinned
    against libbrotli by the conformance suite."""
    bw = _BitWriter()
    bw.write(0, 1)  # WBITS = 16
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + (1 << 24)]
        pos += len(chunk)
        bw.write(0, 1)  # ISLAST = 0
        mlen = len(chunk) - 1
        nibbles = max(4, (mlen.bit_length() + 3) // 4)
        if nibbles > 6:
            raise ValueError("brotli store: meta-block too large")
        bw.write(nibbles - 4, 2)  # MNIBBLES code
        for i in range(nibbles):
            bw.write((mlen >> (4 * i)) & 0xF, 4)
        bw.write(1, 1)  # ISUNCOMPRESSED
        bw.align_byte()
        bw.out += chunk
    bw.write(1, 1)  # ISLAST
    bw.write(1, 1)  # ISLASTEMPTY
    bw.align_byte()
    return bytes(bw.out)
