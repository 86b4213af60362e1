"""EML/MIME email intake.

Mailing-list archives, support tickets, and enterprise dumps are a
standard LLM-corpus source and arrive as RFC 5322 messages with MIME
multipart bodies — base64/quoted-printable transfer encodings,
RFC 2047 encoded-word headers, nested parts, attachments. The
reference has no mail surface; this intake rides the stdlib
``email`` package (policy.default gives modern header decoding) the
same way the WAV tier rides ``wave``: a real parser, executor-side,
one Arrow ``mapInPandas`` pass.

Extraction contract per message:

- ``from_addr`` / ``subject`` / ``date``: header values with
  RFC 2047 encoded-words decoded to text;
- ``body_text``: the FIRST ``text/plain`` leaf part, transfer
  decoding + charset applied (the LLM-ready text);
- ``n_parts``: MIME leaf count; ``n_attachments`` + the first
  attachment's filename/size: the media inventory that routes
  non-text payloads into the multimodal tier;
- unparseable bytes -> ``error`` column (quarantine), never an
  exception out of the scan.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, types as T

__all__ = ["read_eml"]

EML_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("from_addr", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("n_parts", T.IntegerType()),
        T.StructField("body_text", T.StringType()),
        T.StructField("n_attachments", T.IntegerType()),
        T.StructField("att0_name", T.StringType()),
        T.StructField("att0_bytes", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def read_eml(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """RFC 5322/MIME blobs -> typed rows (see module docstring)."""

    def kernel(batches: Iterator) -> Iterator:
        import email
        import email.policy

        import pandas as pd

        def parse(blob: bytes):
            msg = email.message_from_bytes(
                bytes(blob), policy=email.policy.default
            )
            leaves = [p for p in msg.walk() if not p.is_multipart()]
            body = None
            for p in leaves:
                if p.get_content_type() == "text/plain" and (
                    p.get_content_disposition() != "attachment"
                ):
                    body = p.get_content()
                    break
            atts = [
                p for p in leaves
                if p.get_content_disposition() == "attachment"
            ]
            a0 = atts[0] if atts else None
            a0_payload = a0.get_payload(decode=True) if a0 else None
            return (
                str(msg["From"]) if msg["From"] else None,
                str(msg["Subject"]) if msg["Subject"] else None,
                str(msg["Date"]) if msg["Date"] else None,
                len(leaves),
                body,
                len(atts),
                a0.get_filename() if a0 else None,
                len(a0_payload) if a0_payload is not None else None,
            )

        for pdf in batches:
            rows = []
            for d, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    rows.append((int(d), *parse(blob), None))
                except Exception as e:  # stdlib parser: defect taxonomy
                    rows.append(
                        (int(d), None, None, None, None, None, None,
                         None, None, f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in EML_SCHEMA.fields]
            )

    return df.select(id_col, blob_col).mapInPandas(kernel, EML_SCHEMA)
