"""Arrow IPC stream intake.

Feather v2 / Arrow IPC is the interchange format ML feature stores and
dataframe tools hand each other (and what Spark itself speaks to
Python workers), so a lakehouse ingests `.arrow` blobs as routinely as
parquet. pyarrow ships in this container (it IS Spark's Python data
plane), so unlike the from-scratch wire tiers (msgpack/protobuf/avro)
this reader uses the reference implementation directly — the
engineering here is the SPARK shape, the same contract as the other
binary intakes:

- blobs decode in one Arrow ``mapInPandas`` pass, one row per record,
  rendered to canonical sorted-key JSON so every downstream cut is
  native ``from_json`` Column algebra;
- a truncated/corrupt stream yields ONE quarantine row with ``error``
  set — the loud-failure taxonomy, never silent garbage;
- multi-batch streams concatenate in batch order with a stable
  ``row_idx``.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, types as T

__all__ = ["read_arrow_ipc", "write_ipc_blob"]

ARROW_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("json", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def write_ipc_blob(columns: dict, batch_rows: int | None = None) -> bytes:
    """Serialize a column dict to Arrow IPC stream bytes (fixture
    author; splits into multiple record batches when ``batch_rows``
    is set, exercising the multi-batch read path)."""
    import io

    import pyarrow as pa

    table = pa.table(columns)
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        if batch_rows:
            for b in table.to_batches(max_chunksize=batch_rows):
                w.write_batch(b)
        else:
            w.write_table(table)
    return sink.getvalue()


def _canonical(v):
    import datetime

    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, dict):
        return {k: _canonical(x) for k, x in sorted(v.items())}
    if isinstance(v, list):
        return [_canonical(x) for x in v]
    return v


def read_arrow_ipc(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Parse an Arrow IPC stream blob column to one canonical-JSON row
    per record (+ quarantine rows for unreadable streams)."""

    def kernel(batches) -> Iterator:
        import pandas as pd
        import pyarrow as pa

        for pdf in batches:
            out = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                did = int(did)
                try:
                    with pa.ipc.open_stream(pa.BufferReader(blob)) as r:
                        table = r.read_all()
                    recs = table.to_pylist()
                except (pa.lib.ArrowInvalid, OSError, ValueError) as e:
                    out.append((did, None, None, f"{type(e).__name__}: {e}"))
                    continue
                for i, rec in enumerate(recs):
                    out.append(
                        (
                            did,
                            i,
                            json.dumps(
                                _canonical(rec),
                                sort_keys=True,
                                separators=(",", ":"),
                            ),
                            None,
                        )
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "row_idx", "json", "error"]
            )

    return df.mapInPandas(kernel, ARROW_ROWS_SCHEMA)
