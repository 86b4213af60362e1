"""7z container round-trips, number-codec properties, and corruption
behavior for the stdlib-lzma parser (`sources/sevenzip.py`).

No 7z reference implementation exists in this environment (no 7-Zip
CLI, no py7zr), so container conformance is self-consistency plus
hand-pinned header bytes; the LZMA payloads themselves go through
stdlib ``lzma`` both ways, which IS the reference codec. The BCJ/delta
branch filters DO have a reference here: liblzma ships the same x86
and delta filters (``lzma.FILTER_X86`` / ``lzma.FILTER_DELTA``), so
our from-scratch transforms are pinned against it in both directions.
"""

from __future__ import annotations

import lzma
import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from trollflow2_spark.sources.sevenzip import (
    _Reader,
    _Writer,
    _delta_decode,
    _delta_encode,
    _x86_convert,
    parse_7z,
    write_7z,
)

MEMBERS = [
    ("a.txt", b"hello world " * 100),
    ("dir/b.bin", bytes(range(256)) * 10),
    ("empty.txt", b""),
]


@pytest.mark.parametrize(
    "codec", ["copy", "lzma1", "lzma2", "bcj+lzma2", "delta+lzma2"]
)
@pytest.mark.parametrize("encode_header", [False, True])
def test_roundtrip_all_codecs_and_header_forms(codec, encode_header):
    blob = write_7z(MEMBERS, codec=codec, encode_header=encode_header)
    assert parse_7z(blob) == MEMBERS


def _x86ish(seed: int, n: int) -> bytes:
    """Pseudo-machine-code: random bytes with E8/E9 call/jump opcodes
    and near/far displacement high bytes sprinkled in."""
    rng = np.random.RandomState(seed)
    buf = bytearray(rng.randint(0, 256, n, dtype=np.uint8).tobytes())
    for i in range(0, max(0, n - 8), 13):
        buf[i] = 0xE8 if i % 2 else 0xE9
        buf[i + 4] = 0x00 if i % 3 else 0xFF
    return bytes(buf)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(0, 4000))
def test_x86_bcj_conformance_vs_liblzma(seed, n):
    """Our Bra86 transform IS liblzma's x86 filter: encode with ours →
    decode with liblzma, and encode with liblzma → decode with ours,
    over adversarial pseudo-code buffers."""
    data = _x86ish(seed, n)
    lzma2 = [{"id": lzma.FILTER_LZMA2, "preset": 1}]
    chain = [{"id": lzma.FILTER_X86}] + lzma2
    # ours encodes, liblzma decodes
    packed = lzma.compress(
        _x86_convert(data, encoding=True), format=lzma.FORMAT_RAW,
        filters=lzma2,
    )
    assert lzma.decompress(
        packed, format=lzma.FORMAT_RAW, filters=chain
    ) == data
    # liblzma encodes, ours decodes
    lib_enc = lzma.decompress(
        lzma.compress(data, format=lzma.FORMAT_RAW, filters=chain),
        format=lzma.FORMAT_RAW, filters=lzma2,
    )
    assert _x86_convert(lib_enc, encoding=False) == data


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(0, 2000),
    dist=st.integers(1, 32),
)
def test_delta_conformance_vs_liblzma(seed, n, dist):
    rng = np.random.RandomState(seed)
    data = rng.randint(0, 256, n, dtype=np.uint8).tobytes()
    lzma2 = [{"id": lzma.FILTER_LZMA2, "preset": 1}]
    chain = [{"id": lzma.FILTER_DELTA, "dist": dist}] + lzma2
    packed = lzma.compress(
        _delta_encode(data, dist), format=lzma.FORMAT_RAW, filters=lzma2
    )
    assert lzma.decompress(
        packed, format=lzma.FORMAT_RAW, filters=chain
    ) == data
    lib_enc = lzma.decompress(
        lzma.compress(data, format=lzma.FORMAT_RAW, filters=chain),
        format=lzma.FORMAT_RAW, filters=lzma2,
    )
    assert _delta_decode(lib_enc, dist) == data


def test_filter_chain_crc_verified():
    """A filter-chain archive still verifies member CRCs: corrupting
    the pack stream surfaces as an error, never a silent mis-decode."""
    members = [("code.bin", _x86ish(7, 3000))]
    blob = bytearray(write_7z(members, codec="bcj+lzma2"))
    blob[40] ^= 0x01
    with pytest.raises(Exception):
        parse_7z(bytes(blob))


def test_bcj2_style_complex_coder_raises_with_guidance():
    """A multi-stream coder graph (BCJ2) raises NotImplementedError
    naming the linear-chain scope instead of mis-decoding."""
    from trollflow2_spark.sources.sevenzip import _linearize_folder

    # BCJ2: one coder with 4 inputs / 1 output
    with pytest.raises(NotImplementedError, match="complex"):
        _linearize_folder(
            [(b"\x03\x03\x01\x1b", b"", 4, 1)], [], [0, 1, 2, 3], [100]
        )


def test_scene_dispatch_reads_filter_chain_7z(tmp_path):
    from trollflow2_spark.sources.scene import _extract_archive_members

    members = [("exe/payload.bin", _x86ish(3, 2048))]
    arc = tmp_path / "m.7z"
    arc.write_bytes(write_7z(members, codec="bcj+lzma2",
                             encode_header=True))
    out = _extract_archive_members(
        str(arc), ["exe/payload.bin"], workdir=str(tmp_path / "x"),
        kind="7z",
    )
    with open(out[0], "rb") as fh:
        assert fh.read() == members[0][1]


def test_single_member_and_unicode_names():
    members = [("päivä/tiedosto ☃.bin", b"\x00\xff" * 33)]
    assert parse_7z(write_7z(members)) == members


@settings(max_examples=80, deadline=None)
@given(v=st.integers(0, 2**63 - 1))
def test_number_codec_roundtrip(v):
    w = _Writer()
    w.number(v)
    assert _Reader(bytes(w.b)).number() == v
    # small values stay single-byte (the spec's density property)
    if v < 0x80:
        assert len(w.b) == 1


def test_crc_guards_catch_corruption():
    blob = bytearray(write_7z(MEMBERS, codec="lzma2"))
    # flip a bit inside the end header
    nh_off, nh_size, _crc = struct.unpack("<QQI", bytes(blob[12:32]))
    blob[32 + nh_off + nh_size // 2] ^= 0x01
    with pytest.raises(ValueError):
        parse_7z(bytes(blob))
    # flip the signature
    with pytest.raises(ValueError):
        parse_7z(b"xx" + bytes(blob)[2:])


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), size=st.integers(0, 300))
def test_garbage_terminates(seed, size):
    rng = np.random.RandomState(seed)
    junk = rng.randint(0, 256, size, dtype=np.uint8).tobytes()
    try:
        parse_7z(b"7z\xbc\xaf\x27\x1c" + junk)
    except Exception:
        pass  # raising is expected; hanging is the failure


def test_unsupported_coder_raises_with_guidance():
    """An out-of-scope coder (AES id 0x06f10701) raises
    NotImplementedError naming the supported set, not a silent
    mis-decode."""
    from trollflow2_spark.sources.sevenzip import _decode_folder

    with pytest.raises(NotImplementedError):
        _decode_folder(b"\x06\xf1\x07\x01", b"", b"", 0)


def test_scene_dispatch_reads_7z(tmp_path):
    from trollflow2_spark.sources.scene import _extract_archive_members

    blob = write_7z(MEMBERS, codec="lzma2", encode_header=True)
    arc = tmp_path / "m.7z"
    arc.write_bytes(blob)
    out = _extract_archive_members(
        str(arc), ["dir/b.bin"], workdir=str(tmp_path / "x"), kind="7z"
    )
    with open(out[0], "rb") as fh:
        assert fh.read() == MEMBERS[1][1]


def test_payload_crc_verified_on_parse():
    """The writer emits substream digests and the parser VERIFIES them:
    a bit flip inside a Copy-codec pack stream (which still 'decodes')
    is caught by CRC, not passed through silently."""
    blob = bytearray(write_7z(MEMBERS, codec="copy"))
    # corrupt the first payload byte (data starts at offset 32)
    blob[40] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_7z(bytes(blob))


def test_selective_member_decode():
    """members= returns only the requested entries (and at scale skips
    decompressing folders that hold none of them)."""
    blob = write_7z(MEMBERS, codec="lzma2")
    got = parse_7z(blob, members=["dir/b.bin"])
    assert got == [("dir/b.bin", MEMBERS[1][1])]
    assert parse_7z(blob, members=["nope"]) == []


def test_scene_dispatch_rejects_traversal(tmp_path):
    from trollflow2_spark.sources.scene import (
        SceneCreationError,
        _extract_archive_members,
    )

    arc = tmp_path / "m.7z"
    arc.write_bytes(write_7z(MEMBERS))
    with pytest.raises(SceneCreationError, match="unsafe"):
        _extract_archive_members(str(arc), [".."], kind="7z")
    with pytest.raises(SceneCreationError, match="unsafe"):
        _extract_archive_members(str(arc), ["a/../b"], kind="7z")
