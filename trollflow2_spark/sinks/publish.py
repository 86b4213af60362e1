"""Publisher sink: one message per produced file.

Maps ``FilePublisher`` (``/root/reference/trollflow2/plugins/__init__.py:
476-579``) to a message-DataFrame sink: the manifest becomes rows of
``(topic, payload-json)``; the payload carries uri/uid/product/area plus
selected input metadata, and optional *dispatch* orders fan out one extra
message per configured target (``plugins/__init__.py:551-569``).

In production this writes to Kafka
(``df.write.format("kafka").option("topic", ...)``); in this container we
write JSON-lines files — identical row shape, swappable sink.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from trollflow2_spark.sinks.save import SaveResult, compose_filename

#: metadata keys forwarded from the input message into published messages
#: (≙ the explicit key list at ``plugins/__init__.py:511-527``)
FORWARDED_MDA_KEYS = (
    "platform_name",
    "sensor",
    "orbit_number",
    "start_time",
    "end_time",
)


def publish_messages_df(
    spark: SparkSession,
    result: SaveResult,
    base_mda: dict | None = None,
    topic_pattern: str = "/{format}/{area}",
    dispatch_targets: Sequence[str] | None = None,
) -> DataFrame:
    """Build the publisher message DataFrame from a save result.

    One row per produced file: ``topic`` composed from the work item
    (≙ topic composition at ``plugins/__init__.py:528``), ``message`` a
    JSON document with file + forwarded metadata. ``dispatch_targets``
    adds one extra row per (file, target) with a ``dispatch`` field.
    """
    mda = base_mda or {}
    rows = []
    for p in result.produced:
        topic = compose_filename(topic_pattern, {**mda, **p})
        base = {
            "uri": p["filename"],
            "uid": os.path.basename(p["filename"]),
            "product": p.get("product"),
            "area": p.get("area"),
            "format": p.get("format"),
            "size_bytes": p.get("size_bytes"),
            **{k: mda.get(k) for k in FORWARDED_MDA_KEYS if mda.get(k) is not None},
        }
        rows.append((topic, None, *[base.get(k) for k in _PAYLOAD_KEYS]))
        for target in dispatch_targets or []:
            rows.append((topic, target, *[base.get(k) for k in _PAYLOAD_KEYS]))
    schema = (
        "topic string, dispatch string, uri string, uid string, product string,"
        " area string, format string, size_bytes long, platform_name string,"
        " sensor string, orbit_number long, start_time string, end_time string"
    )
    df = spark.createDataFrame(rows, schema)
    payload = F.to_json(
        F.struct(*[F.col(k) for k in _PAYLOAD_KEYS], F.col("dispatch"))
    )
    return df.select("topic", payload.alias("message"))


_PAYLOAD_KEYS = [
    "uri",
    "uid",
    "product",
    "area",
    "format",
    "size_bytes",
    "platform_name",
    "sensor",
    "orbit_number",
    "start_time",
    "end_time",
]


def publish_to_json_dir(messages: DataFrame, out_dir: str) -> str:
    """Write publisher messages as JSON-lines (the local Kafka stand-in:
    same rows you would hand to ``format("kafka")``)."""
    path = os.path.join(out_dir, "published_messages")
    messages.write.mode("append").json(path)
    return path


def kafka_sink_options(bootstrap_servers: str) -> tuple[str, dict[str, str]]:
    """(format, options) for the Kafka publisher sink. A pure builder so
    the constructed options are testable without the connector jar or a
    broker (the wire path needs a real deployment)."""
    return "kafka", {"kafka.bootstrap.servers": bootstrap_servers}


def to_kafka_rows(messages: DataFrame, key_col: str | None = None) -> DataFrame:
    """Shape publisher messages into the Kafka sink's expected columns:
    ``topic`` (per-row routing — the composed ``/{format}/{area}`` topic
    rides along, matching the reference's per-file topic composition),
    ``value`` (the JSON payload), and optionally ``key`` (for partition
    affinity, e.g. by area so one area's files stay ordered)."""
    cols = [
        F.col("topic").cast("string").alias("topic"),
        F.col("message").cast("string").alias("value"),
    ]
    if key_col is not None:
        cols.append(F.col(key_col).cast("string").alias("key"))
    return messages.select(*cols)


def publish_to_kafka(
    messages: DataFrame, bootstrap_servers: str, key_col: str | None = None
) -> None:
    """Publish messages to Kafka (one record per produced file, per-row
    topic routing). Requires the ``spark-sql-kafka`` connector on the
    classpath — absent here; shape pinned by tests."""
    fmt, opts = kafka_sink_options(bootstrap_servers)
    to_kafka_rows(messages, key_col=key_col).write.format(fmt).options(**opts).save()
