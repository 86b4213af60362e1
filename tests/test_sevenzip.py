"""7z container round-trips, number-codec properties, and corruption
behavior for the stdlib-lzma parser (`sources/sevenzip.py`).

No 7z reference implementation exists in this environment (no 7-Zip
CLI, no py7zr), so conformance is self-consistency plus hand-pinned
header bytes; the LZMA payloads themselves go through stdlib ``lzma``
both ways, which IS the reference codec.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from trollflow2_spark.sources.sevenzip import (
    _Reader,
    _Writer,
    parse_7z,
    write_7z,
)

MEMBERS = [
    ("a.txt", b"hello world " * 100),
    ("dir/b.bin", bytes(range(256)) * 10),
    ("empty.txt", b""),
]


@pytest.mark.parametrize("codec", ["copy", "lzma1", "lzma2"])
@pytest.mark.parametrize("encode_header", [False, True])
def test_roundtrip_all_codecs_and_header_forms(codec, encode_header):
    blob = write_7z(MEMBERS, codec=codec, encode_header=encode_header)
    assert parse_7z(blob) == MEMBERS


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
