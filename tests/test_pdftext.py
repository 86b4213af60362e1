"""PDF text extraction: COS object parse, FlateDecode, the
text-showing operator set, and degradation for non-PDF payloads."""

from __future__ import annotations

import zlib


def _pdf(content: bytes, extra: bytes = b"", flate: bool = False) -> bytes:
    filt = b""
    if flate:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    return (
        b"%PDF-1.7\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << " + filt + b"/Length "
        + str(len(content)).encode()
        + b" >> stream\n" + content + b"\nendstream endobj\n"
        + extra + b"%%EOF"
    )


def test_escapes_hex_octal_and_tj_arrays():
    from trollflow2_spark.sources.pdftext import extract_pdf_text

    c = (
        rb"BT (a\(b\)c) Tj (l1\nl2) Tj (\101\61) Tj "
        rb"[(ker) -200 (ned)] TJ <48692A> Tj (back\\slash) Tj ET"
    )
    out = extract_pdf_text(_pdf(c))
    assert out["ok"] == 1 and out["n_pages"] == 1
    assert out["text"] == "a(b)c l1\nl2 A1 kerned Hi* back\\slash"


def test_flate_stream_and_nested_parens():
    from trollflow2_spark.sources.pdftext import extract_pdf_text

    c = b"BT ((nested (deep)) ok) Tj ET"
    out = extract_pdf_text(_pdf(c, flate=True))
    assert out["text"] == "(nested (deep)) ok"


def test_cid_flag_and_non_pdf():
    from trollflow2_spark.sources.pdftext import extract_pdf_text

    extra = b"5 0 obj << /Subtype /Type0 >> endobj\n"
    out = extract_pdf_text(_pdf(b"BT (x) Tj ET", extra=extra))
    assert out["has_cid"] == 1 and out["text"] == "x"
    assert extract_pdf_text(b"GIF89a...") == {"ok": 0}
    # corrupt flate stream: page counted, text skipped, no crash
    broken = _pdf(b"BT (x) Tj ET", flate=True).replace(b"stream\nx", b"stream\nZ")
    res = extract_pdf_text(broken)
    assert res["ok"] == 1
