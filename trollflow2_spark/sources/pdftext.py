"""Text extraction from PDF blobs — stdlib-only, header-and-stream
level (no external PDF library).

A crawl's document corpus is full of PDFs; for training-data intake
the needed operation is "give me the text and basic structure", not
full rendering. This module parses the COS object layer sequentially
(object regexes — no xref required, which also makes it robust to the
truncated/append-updated files crawls actually see), inflates
FlateDecode content streams with ``zlib``, and evaluates the
text-showing operators of each page content stream:

- ``(...) Tj`` and ``(...) '`` — literal strings with the full escape
  set (``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal ``\\ooo``, and
  line continuations);
- ``<...> Tj`` — hex strings (single-byte codes);
- ``[...] TJ`` — arrays interleaving strings with kerning numbers
  (numbers are ignored; large negative kerning is NOT turned into
  spaces — that heuristic is a renderer concern);
- ``T* '`` / ``Td`` / ``TD`` / ``ET`` boundaries insert separators so
  distinct show operations don't fuse into one word.

Simple single-byte encodings only (Standard/WinAnsi Latin text): CID /
Type0 composite fonts need a CMap table and are reported as
``has_cid=1`` with their text skipped, a documented boundary in the
same spirit as the media codecs' quarantine taxonomy.

Reference parity: none — the reference ingests satellite granules
(`/root/reference/trollflow2/launcher.py`); PDF intake is
beyond-reference training-data surface.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _literal_string(data: bytes, start: int) -> tuple[str, int]:
    """Decode a PDF literal string starting at the '(' at ``start``;
    returns (text, index after the closing ')')."""
    out: list[str] = []
    depth = 1
    i = start + 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = []
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(data[i] - 0x30)
                    i += 1
                code = 0
                for d in oct_digits:
                    code = code * 8 + d
                out.append(chr(code & 0xFF))
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _hex_string(data: bytes, start: int) -> tuple[str, int]:
    end = data.index(b">", start)
    hexpart = re.sub(rb"\s", b"", data[start + 1 : end])
    if len(hexpart) % 2:
        hexpart += b"0"
    return bytes.fromhex(hexpart.decode("ascii")).decode(
        "latin-1"
    ), end + 1


def _content_text(data: bytes) -> list[str]:
    """Evaluate text-showing operators of one content stream; returns
    the shown strings in order (one entry per show op)."""
    shows: list[str] = []
    i, n = 0, len(data)
    pending: list[str] = []  # strings seen since the last operator
    while i < n:
        c = data[i]
        if c == 0x28:  # (
            text, i = _literal_string(data, i)
            pending.append(text)
        elif c == 0x3C and not data.startswith(b"<<", i):  # < hex string
            text, i = _hex_string(data, i)
            pending.append(text)
        elif c == 0x5B:  # [ ... ] TJ array: strings gathered by the loop
            i += 1
        elif (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c == 0x27:
            m = re.match(rb"[A-Za-z'*]+", data[i:])
            op = m.group(0)
            i += len(op)
            if op in (b"Tj", b"TJ", b"'", b'"'):
                if pending:
                    shows.append("".join(pending))
                pending = []
            elif op in (b"Td", b"TD", b"T*", b"ET", b"BT"):
                pending = []
        else:
            i += 1
    return shows


def extract_pdf_text(blob: bytes) -> dict:
    """Parse one PDF blob: concatenated page text (show ops joined
    with spaces, pages with newlines), page count, object count, CID
    flag, producer string.

    Returns ``{"ok": 0}`` for payloads without a PDF header."""
    if not blob.startswith(b"%PDF-"):
        return {"ok": 0}
    out = {
        "ok": 1,
        "version": blob[5:8].decode("latin-1", "replace"),
        "n_pages": 0,
        "n_objects": 0,
        "has_cid": 0,
        "producer": None,
    }
    page_texts: list[str] = []
    content_refs: list[int] = []
    streams: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(blob):
        out["n_objects"] += 1
        num = int(m.group(1))
        body = m.group(3)
        if b"/Type0" in body or b"/Identity-H" in body:
            out["has_cid"] = 1
        if b"/Type" in body and b"/Page" in body and b"/Pages" not in body:
            out["n_pages"] += 1
            cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
            if cm:
                content_refs.append(int(cm.group(1)))
        pm = re.search(rb"/Producer\s*\(([^)]*)\)", body)
        if pm:
            out["producer"] = pm.group(1).decode("latin-1", "replace")
        sm = _STREAM_RE.search(body)
        if sm:
            data = sm.group(1)
            if b"/FlateDecode" in body:
                try:
                    data = zlib.decompress(data)
                except zlib.error:
                    continue
            streams[num] = data
    for ref in content_refs:
        data = streams.get(ref)
        if data is None:
            continue
        page_texts.append(" ".join(_content_text(data)))
    out["text"] = "\n".join(page_texts)
    return out


PDF_TEXT_SCHEMA = "doc_id long, ok int, version string, n_pages int, n_objects int, has_cid int, producer string, text string"


def pdf_text_table(df, media_col: str = "media", id_col: str = "doc_id"):
    """Arrow ``mapInPandas`` wrapper over :func:`extract_pdf_text`:
    one row of (ok, version, n_pages, n_objects, has_cid, producer,
    text) per blob. Header-and-stream work only — non-PDF payloads
    yield ok=0 rows, never task failures."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, blob in zip(pdf[id_col], pdf[media_col]):
                try:
                    meta = extract_pdf_text(
                        bytes(blob) if blob is not None else b""
                    )
                except Exception:
                    meta = {"ok": 0}
                rows.append(
                    (
                        int(d),
                        meta.get("ok", 0),
                        meta.get("version"),
                        meta.get("n_pages"),
                        meta.get("n_objects"),
                        meta.get("has_cid"),
                        meta.get("producer"),
                        meta.get("text"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "ok", "version", "n_pages", "n_objects",
                    "has_cid", "producer", "text",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        kernel, PDF_TEXT_SCHEMA
    )
