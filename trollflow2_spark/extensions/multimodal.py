"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (per the 100 TB pipeline brief): media rides in a ``binary``
column next to a metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``
so bytes never round-trip through Python row-at-a-time. The decode step
itself is STUBBED in this environment (no image/audio libs): the Spark
plumbing — schema, batch iteration, partition sizing — is real and
tested; the kernel raises ``NotImplementedError`` unless the
deterministic fake decoder is requested.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive an opaque binary payload + deterministic metadata from a text
    column — the test stand-in for real image bytes (container has no
    media files). Width/height are md5-derived so every engine agrees.
    """
    blob = F.encode(F.col(text_col), "UTF-8")
    h = F.md5(F.col(text_col))
    width = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 1024 + 16).alias("width")
    height = (F.conv(F.substring(h, 5, 4), 16, 10).cast("int") % 1024 + 16).alias("height")
    return df.withColumn("media", blob).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("media_type"),
            width,
            height,
            F.length(blob).cast("long").alias("n_bytes"),
        ),
    )


def decode_media(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    fake: bool = False,
    batch_rows_hint: int = 64,
) -> DataFrame:
    """Decode the binary column into per-item features via mapInPandas.

    Real decoders (PIL/librosa/av) are not in this container — with
    ``fake=False`` the kernel raises ``NotImplementedError`` (clearly
    marked stub). With ``fake=True`` a deterministic byte-statistics
    "decoder" exercises the identical plumbing: Arrow batches in,
    feature rows out, schema pinned below.

    Scale notes: mapInPandas streams Arrow record batches, so executor
    memory is bounded by batch size, not partition size; set
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (driver config) to
    keep media batches small — decoded frames are much larger than their
    compressed bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("mean_byte", T.DoubleType()),
            T.StructField("max_byte", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires an image/audio library not present "
                    "in this environment; pass fake=True for the deterministic "
                    "byte-statistics decoder"
                )
            payload = pdf[media_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payload.map(len).astype("int64"),
                    "mean_byte": payload.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "max_byte": payload.map(
                        lambda b: int(max(b)) if len(b) else 0
                    ).astype("int32"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(kernel, out_schema)


def media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Project the typed metadata struct into flat columns (pure Column
    ops — the oracle-checkable part of the multimodal surface)."""
    return df.select(
        F.col(id_col),
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )
