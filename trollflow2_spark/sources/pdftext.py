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

Composite (CID / Type0) fonts — the dominant class in post-2010
real-world PDFs — are decoded through the **embedded ToUnicode CMap**
(``beginbfchar``/``beginbfrange`` sections, both the continuous-range
and array-destination forms, destinations interpreted as UTF-16BE):
the page's ``/Resources → /Font`` dict maps font names to font
objects, a ``Tf`` operator tracks the current font, and 2-byte CIDs
in show strings are looked up in the font's CMap. A Type0 font
WITHOUT a ToUnicode CMap still has its text suppressed (there is
nothing to decode it with) and the document stays flagged
``has_cid=1`` — the same quarantine-taxonomy spirit as the media
codecs.

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


def _hex_bytes(data: bytes, start: int) -> tuple[bytes, int]:
    """Raw bytes of a PDF hex string starting at the '<' at ``start``;
    returns (bytes, index after the closing '>')."""
    end = data.index(b">", start)
    hexpart = re.sub(rb"[^0-9A-Fa-f]", b"", data[start + 1 : end])
    if len(hexpart) % 2:
        hexpart += b"0"
    return bytes.fromhex(hexpart.decode("ascii")), end + 1


def _skip_dict(data: bytes, start: int) -> int:
    """Index just past the balanced ``<<...>>`` dictionary starting at
    ``start`` (BDC/DP marked-content and inline-image dicts appear
    inside content streams and must not be parsed as hex strings)."""
    depth, i, n = 0, start, len(data)
    while i < n:
        if data.startswith(b"<<", i):
            depth += 1
            i += 2
        elif data.startswith(b">>", i):
            depth -= 1
            i += 2
            if depth == 0:
                return i
        else:
            i += 1
    return n


_SUPPRESS = object()  # Type0 font with no ToUnicode CMap: show nothing


def _decode_cid(raw: bytes, cmap: dict) -> str:
    """Decode big-endian 2-byte CIDs through a ToUnicode CMap;
    unmapped codes are skipped (nothing meaningful to emit)."""
    out = []
    for j in range(0, len(raw) - 1, 2):
        ch = cmap.get((raw[j] << 8) | raw[j + 1])
        if ch is not None:
            out.append(ch)
    return "".join(out)


def _content_text(data: bytes, fontmaps: dict | None = None) -> list[str]:
    """Evaluate text-showing operators of one content stream; returns
    the shown strings in order (one entry per show op).

    ``fontmaps`` maps content-stream font names (``b"/F1"``) either to
    a ToUnicode CID map (Type0 font — strings decode as 2-byte CIDs)
    or to ``None`` (Type0 WITHOUT a CMap — strings suppressed). Fonts
    absent from the map are simple single-byte fonts (latin-1 pass
    through). ``Tf`` switches the current font."""
    fontmaps = fontmaps or {}
    shows: list[str] = []
    i, n = 0, len(data)
    pending: list[str] = []  # strings seen since the last operator
    cur = object()  # current font's entry: missing-sentinel = simple
    last_name: bytes | None = None  # most recent /Name token (Tf operand)

    def _push(raw: bytes) -> None:
        if cur is _SUPPRESS:
            return
        if isinstance(cur, dict):
            pending.append(_decode_cid(raw, cur))
        else:
            pending.append(raw.decode("latin-1"))

    while i < n:
        c = data[i]
        if c == 0x28:  # (
            text, i = _literal_string(data, i)
            _push(text.encode("latin-1", "replace"))
        elif c == 0x3C:
            if data.startswith(b"<<", i):  # dictionary, not a string
                i = _skip_dict(data, i)
            else:  # < hex string
                try:
                    raw, i = _hex_bytes(data, i)
                except ValueError:  # unterminated run: skip the '<'
                    i += 1
                    continue
                _push(raw)
        elif c == 0x2F:  # /Name token (Tf's font operand among others)
            m = re.match(rb"/([^\s/<>\[\]()%]*)", data[i:])
            last_name = b"/" + m.group(1)
            i += len(m.group(0))
        elif c == 0x5B:  # [ ... ] TJ array: strings gathered by the loop
            i += 1
        elif c == 0x22:  # the '"' show operator (aw ac string ")
            if pending:
                shows.append("".join(pending))
            pending = []
            i += 1
        elif (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c == 0x27:
            m = re.match(rb"[A-Za-z'*]+", data[i:])
            op = m.group(0)
            i += len(op)
            if op in (b"Tj", b"TJ", b"'"):
                if pending:
                    shows.append("".join(pending))
                pending = []
            elif op in (b"Td", b"TD", b"T*", b"ET", b"BT"):
                pending = []
            elif op == b"Tf" and last_name is not None:
                if last_name in fontmaps:
                    cm = fontmaps[last_name]
                    cur = cm if cm is not None else _SUPPRESS
                else:
                    cur = object()
        else:
            i += 1
    return shows


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)


def parse_tounicode(data: bytes) -> dict[int, str]:
    """Parse a ToUnicode CMap stream into {CID: unicode string}.

    Handles ``beginbfchar`` single mappings, continuous
    ``beginbfrange`` spans (<lo> <hi> <dstBase>, destination
    incrementing), and the array-destination bfrange form
    (<lo> <hi> [<d0> <d1> ...]). Destination hex is UTF-16BE, so a
    single CID may map to a multi-code-unit string."""
    cmap: dict[int, str] = {}

    def u16(hexs: bytes) -> str:
        return bytes.fromhex(hexs.decode("ascii")).decode(
            "utf-16-be", "replace"
        )

    for sec in _BFCHAR_RE.findall(data):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", sec
        ):
            cmap[int(src, 16)] = u16(dst)
    for sec in _BFRANGE_RE.findall(data):
        for m in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(\[(?:\s*<[0-9A-Fa-f]+>)+\s*\]|<[0-9A-Fa-f]+>)",
            sec,
        ):
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            dst = m.group(3)
            if dst.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for k, dh in enumerate(dsts):
                    if lo + k <= hi:
                        cmap[lo + k] = u16(dh)
            else:
                base = bytes.fromhex(dst[1:-1].decode("ascii"))
                start, width = int.from_bytes(base, "big"), len(base)
                for k in range(hi - lo + 1):
                    cmap[lo + k] = (start + k).to_bytes(
                        width, "big"
                    ).decode("utf-16-be", "replace")
    return cmap


_OBJSTM_TYPE_RE = re.compile(rb"/Type\s*/ObjStm\b")
_ENCRYPT_RE = re.compile(rb"/Encrypt\s+\d+\s+\d+\s+R")


def _unpack_objstm(body: bytes, data: bytes) -> list[tuple[int, bytes]]:
    """Unpack one ``/Type /ObjStm`` object stream (PDF 1.5+): ``data``
    is the INFLATED stream payload whose first section is ``/N``
    whitespace-separated (objnum, offset) integer pairs; object bodies
    start at ``/First`` and run to the next object's offset. Returns
    [(objnum, body), ...] — malformed headers yield []."""
    nm = re.search(rb"/N\s+(\d+)", body)
    fm = re.search(rb"/First\s+(\d+)", body)
    if not (nm and fm):
        return []
    n, first = int(nm.group(1)), int(fm.group(1))
    ints = re.findall(rb"\d+", data[:first])
    if len(ints) < 2 * n:
        return []
    pairs = [
        (int(ints[2 * i]), int(ints[2 * i + 1])) for i in range(n)
    ]
    out: list[tuple[int, bytes]] = []
    for i, (num, off) in enumerate(pairs):
        lo = first + off
        hi = first + pairs[i + 1][1] if i + 1 < n else len(data)
        if 0 <= lo <= hi <= len(data):
            out.append((num, data[lo:hi]))
    return out


def extract_pdf_text(blob: bytes) -> dict:
    """Parse one PDF blob: concatenated page text (show ops joined
    with spaces, pages with newlines), page count, object count, CID
    flag, encryption flag, producer string.

    PDF 1.5+ **object streams** are resolved: any top-level object
    whose dict says ``/Type /ObjStm`` has its (Flate-inflated) payload
    unpacked — ``/N`` (objnum, offset) header pairs, bodies from
    ``/First`` — and the packed objects (where modern writers put the
    page tree and font dicts) join the object table, so CID/ToUnicode
    decoding reaches fonts that never appear as top-level ``N M obj``
    patterns. Packed objects do not override same-numbered top-level
    ones (sequential scan: the uncompressed body is the one a
    no-xref reader trusts). ``/Encrypt`` in the trailer flags
    ``encrypted=1`` — streams are then ciphertext, so text stays empty
    but the document is accounted, not failed.

    Returns ``{"ok": 0}`` for payloads without a PDF header."""
    if not blob.startswith(b"%PDF-"):
        return {"ok": 0}
    out = {
        "ok": 1,
        "version": blob[5:8].decode("latin-1", "replace"),
        "n_pages": 0,
        "n_objects": 0,
        "has_cid": 0,
        "encrypted": 1 if _ENCRYPT_RE.search(blob) else 0,
        "producer": None,
    }
    page_texts: list[str] = []
    pages: list[tuple[int | None, bytes]] = []  # (content ref, page body)
    bodies: dict[int, bytes] = {}
    streams: dict[int, bytes] = {}
    objstms: list[tuple[bytes, bytes]] = []  # (dict body, inflated data)
    for m in _OBJ_RE.finditer(blob):
        num = int(m.group(1))
        body = m.group(3)
        bodies[num] = body
        sm = _STREAM_RE.search(body)
        if sm:
            data = sm.group(1)
            if b"/FlateDecode" in body:
                try:
                    data = zlib.decompress(data)
                except zlib.error:
                    continue
            streams[num] = data
            if _OBJSTM_TYPE_RE.search(body):
                objstms.append((body, data))
    for body, data in objstms:
        for num, packed in _unpack_objstm(body, data):
            bodies.setdefault(num, packed)
    for body in bodies.values():
        out["n_objects"] += 1
        if b"/Type0" in body or b"/Identity-H" in body:
            out["has_cid"] = 1
        if b"/Type" in body and b"/Page" in body and b"/Pages" not in body:
            out["n_pages"] += 1
            cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
            pages.append((int(cm.group(1)) if cm else None, body))
        pm = re.search(rb"/Producer\s*\(([^)]*)\)", body)
        if pm:
            out["producer"] = pm.group(1).decode("latin-1", "replace")
    if out["encrypted"]:
        out["text"] = ""
        return out
    for ref, page_body in pages:
        data = streams.get(ref) if ref is not None else None
        if data is None:
            continue
        fontmaps = _page_fontmaps(page_body, bodies, streams)
        page_texts.append(" ".join(_content_text(data, fontmaps)))
    out["text"] = "\n".join(page_texts)
    return out


def _page_fontmaps(
    page_body: bytes, bodies: dict[int, bytes], streams: dict[int, bytes]
) -> dict:
    """Resolve a page's ``/Resources → /Font`` dict into
    {b"/Name": ToUnicode-CID-map | None}. Only composite (Type0 /
    Identity-H) fonts are entered: a mapping decodes their 2-byte CID
    strings, ``None`` marks a Type0 font with no ToUnicode CMap (text
    suppressed, document stays flagged). Simple fonts are left out —
    the content evaluator passes their bytes through as latin-1."""
    res = page_body
    rm = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", page_body)
    if rm:
        res = bodies.get(int(rm.group(1)), b"")
    fm = re.search(rb"/Font\s*<<(.*?)>>", res, re.DOTALL)
    if not fm:
        return {}
    maps: dict = {}
    for name, ref in re.findall(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fm.group(1)):
        fbody = bodies.get(int(ref), b"")
        if b"/Type0" not in fbody and b"/Identity-H" not in fbody:
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fbody)
        data = streams.get(int(tm.group(1))) if tm else None
        maps[b"/" + name] = parse_tounicode(data) if data else None
    return maps


PDF_TEXT_SCHEMA = "doc_id long, ok int, version string, n_pages int, n_objects int, has_cid int, encrypted int, producer string, text string"


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
                        meta.get("encrypted"),
                        meta.get("producer"),
                        meta.get("text"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "ok", "version", "n_pages", "n_objects",
                    "has_cid", "encrypted", "producer", "text",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        kernel, PDF_TEXT_SCHEMA
    )
