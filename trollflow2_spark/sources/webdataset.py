"""WebDataset shard intake.

WebDataset is the de-facto shard format for large-scale multimodal
training (LAION, OpenCLIP, torchdata pipelines): a plain ``.tar``
whose members group into samples by basename — ``000123.jpg`` +
``000123.txt`` + ``000123.json`` is one sample — with samples stored
contiguously so shards stream. The reference has no shard surface;
this intake turns shard blobs into one ROW PER SAMPLE with the parts
typed out, which is exactly the boundary where a Spark curation
pipeline (dedup/quality/pair-gating tiers here) meets a training
loader.

Sample-key contract (the WebDataset rule): the key is the member
basename up to the FIRST dot — everything after is the (possibly
multi-part, e.g. ``seg.png``) extension. Members are grouped by
CONTIGUOUS runs of equal keys; a key reappearing later in the shard
is a DIFFERENT sample occurrence and is flagged (``dup_key``), since
loaders that stream would silently split it. Directory prefixes are
stripped (shards often nest under a split dir).

Shape: stdlib ``tarfile`` over each blob in one Arrow
``mapInPandas`` pass; malformed shards degrade to a single error row
(quarantine), never a task failure.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, types as T

__all__ = ["read_webdataset", "write_webdataset"]

WDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_key", T.StringType()),
        T.StructField("ord", T.IntegerType()),
        T.StructField("n_parts", T.IntegerType()),
        T.StructField("exts", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("meta_json", T.StringType()),
        T.StructField("image_bytes", T.IntegerType()),
        T.StructField("dup_key", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)

_IMAGE_EXTS = {"jpg", "jpeg", "png", "webp", "gif", "bmp", "ppm"}


def write_webdataset(samples: list[dict]) -> bytes:
    """Author a shard (fixtures/round-trips): ``samples`` is a list
    of ``{key: str, parts: {ext: bytes}}``; members are emitted
    contiguously per sample, parts in sorted-extension order."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for s in samples:
            for ext in sorted(s["parts"]):
                data = s["parts"][ext]
                info = tarfile.TarInfo(name=f"{s['key']}.{ext}")
                info.size = len(data)
                info.mtime = 1_700_000_000
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def read_webdataset(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Shard blobs -> one row per sample (see module docstring)."""

    def kernel(batches: Iterator) -> Iterator:
        import io
        import os
        import tarfile

        import pandas as pd

        def parse(d: int, blob: bytes):
            rows = []
            with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                members = [m for m in tf if m.isfile()]
                groups: list[tuple[str, dict]] = []
                for m in members:
                    base = os.path.basename(m.name)
                    if "." in base:
                        key, ext = base.split(".", 1)
                    else:
                        key, ext = base, ""
                    data = tf.extractfile(m).read()
                    if groups and groups[-1][0] == key:
                        groups[-1][1][ext] = data
                    else:
                        groups.append((key, {ext: data}))
            seen: dict[str, int] = {}
            for i, (key, parts) in enumerate(groups):
                seen[key] = seen.get(key, 0) + 1
                caption = None
                if "txt" in parts:
                    caption = parts["txt"].decode("utf-8", "replace")
                meta = None
                if "json" in parts:
                    meta = parts["json"].decode("utf-8", "replace")
                img = sum(
                    len(v) for e, v in parts.items()
                    if e.split(".")[-1] in _IMAGE_EXTS
                )
                rows.append(
                    (d, key, i, len(parts),
                     ",".join(sorted(parts)), caption, meta,
                     img, 1 if seen[key] > 1 else 0, None)
                )
            return rows

        for pdf in batches:
            rows = []
            for d, blob in zip(pdf[id_col], pdf[blob_col]):
                d = int(d)
                try:
                    rows.extend(parse(d, blob))
                except Exception as e:
                    rows.append(
                        (d, None, -1, None, None, None, None, None,
                         None, f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WDS_SCHEMA.fields]
            )

    return df.select(id_col, blob_col).mapInPandas(kernel, WDS_SCHEMA)
