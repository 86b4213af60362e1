"""Apache Iceberg snapshot reading (metadata core).

The second lakehouse table format next to `delta_snapshot`'s _delta_log
replay: Iceberg tracks state as a METADATA TREE — table metadata JSON
(schemas, snapshots, current pointer) -> one manifest LIST per
snapshot (Avro) -> many manifest FILES (Avro) whose entries carry data
files with status (1 added / 0 existing / 2 deleted) and per-file
stats. A snapshot's live file set is the union of its manifests'
non-deleted entries — that indirection is what makes O(1) commits and
time travel possible on a million-file table.

This reader implements the documented CORE of that contract on the
repo's own from-scratch Avro container codec (`sources/avro.py`):

- table metadata JSON: snapshots list (id, timestamp, manifest list
  path), current-snapshot-id;
- manifest lists: one Avro record per manifest (path + counts);
- manifest files: Avro records ``(status, file_path, partition,
  record_count, file_size)`` — the stats columns a scan planner
  prunes with.

Iceberg v2 (merge-on-read) row-level deletes are supported for the
POSITION-delete form: manifest-list entries carry ``content``
(0 = data, 1 = deletes); delete manifests list position-delete FILES
whose rows ``(file_path, pos)`` mark deleted row positions in data
files. A snapshot's live row count per data file is its
``record_count`` minus its DISTINCT deleted positions (distinct makes
re-applied/rewritten delete files idempotent). Equality deletes
(delete-file ``content = 2``) raise with guidance — they need the
table schema + data-page reads, outside the metadata core.

Scale shape: the metadata JSON and manifest LISTS are control-plane
(one tiny file per snapshot, parsed on the driver exactly as real
engines do); the manifest FILES are the data plane — thousands on a
real table — and decode in a distributed Arrow ``mapInPandas`` pass,
one blob per row, then pure Column filtering/aggregation. Unknown
paths and undecodable manifests raise loudly.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "MANIFEST_SCHEMA",
    "MANIFEST_LIST_SCHEMA",
    "MANIFEST_LIST_V2_SCHEMA",
    "DELETE_MANIFEST_SCHEMA",
    "POSITION_DELETE_SCHEMA",
    "parse_table_metadata",
    "snapshot_as_of",
    "read_manifest_entries",
    "read_delete_manifest_entries",
    "read_position_deletes",
    "snapshot_partition_summary",
]

# Documented-subset Avro schemas (field names follow the Iceberg spec)
MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "added_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
    ],
}
# v2 manifest list: `content` routes each manifest to the data or the
# delete plane (0 = data, 1 = deletes). v1 lists lack the field; the
# Avro container decodes with its embedded WRITER schema, so v1
# records simply have no "content" key and default to data.
MANIFEST_LIST_V2_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "added_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "content", "type": "int"},
    ],
}
# delete manifests list DELETE files; entry `content` is 1 for
# position deletes, 2 for equality deletes (unsupported, loud)
DELETE_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "delete_manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "content", "type": "int"},
        {"name": "record_count", "type": "long"},
        {"name": "file_size", "type": "long"},
    ],
}
# position-delete file rows per the spec: the target data file and
# the 0-based row position deleted from it
POSITION_DELETE_SCHEMA = {
    "type": "record",
    "name": "position_delete",
    "fields": [
        {"name": "file_path", "type": "string"},
        {"name": "pos", "type": "long"},
    ],
}
MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "partition", "type": "string"},
        {"name": "record_count", "type": "long"},
        {"name": "file_size", "type": "long"},
    ],
}

ENTRY_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("manifest_path", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("partition", T.StringType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("file_size", T.LongType()),
    ]
)


def parse_table_metadata(metadata_json: str) -> dict:
    """Table metadata: snapshots + current pointer, validated."""
    md = json.loads(metadata_json)
    if "snapshots" not in md or "current-snapshot-id" not in md:
        raise ValueError("not an Iceberg table metadata document")
    snaps = {}
    for s in md["snapshots"]:
        snaps[int(s["snapshot-id"])] = {
            "timestamp_ms": int(s["timestamp-ms"]),
            "manifest_list": s["manifest-list"],
        }
    cur = int(md["current-snapshot-id"])
    if cur not in snaps:
        raise ValueError(f"current-snapshot-id {cur} not in snapshots")
    return {"snapshots": snaps, "current": cur}


def snapshot_as_of(md: dict, ts_ms: int) -> int:
    """Timestamp time travel per the spec's semantics: the LATEST
    snapshot whose commit timestamp is ≤ ``ts_ms`` (what
    ``FOR SYSTEM_TIME AS OF`` resolves to). Raises if the timestamp
    precedes the table's first snapshot — silently returning the
    oldest state would fabricate history."""
    best = None
    for sid, s in md["snapshots"].items():
        if s["timestamp_ms"] <= int(ts_ms) and (
            best is None
            or s["timestamp_ms"] > md["snapshots"][best]["timestamp_ms"]
        ):
            best = sid
    if best is None:
        raise ValueError(
            f"no snapshot at or before timestamp {ts_ms} "
            "(table history starts later)"
        )
    return best


def read_manifest_entries(blob_df: DataFrame) -> DataFrame:
    """Decode manifest Avro blobs (path, blob) -> one row per entry,
    via the from-scratch container codec; a bad manifest FAILS the
    task loudly (metadata corruption is not quarantine material —
    a scan that silently drops a manifest returns wrong data)."""

    def kernel(batches) -> Iterator:
        import pandas as pd

        from trollflow2_spark.sources.avro import read_container

        for pdf in batches:
            out = []
            for path, blob in zip(pdf["path"], pdf["blob"]):
                _meta, records = read_container(bytes(blob))
                for r in records:
                    out.append(
                        (
                            path,
                            r["status"],
                            r["file_path"],
                            r["partition"],
                            r["record_count"],
                            r["file_size"],
                        )
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in ENTRY_ROWS_SCHEMA.fields]
            )

    return blob_df.mapInPandas(kernel, ENTRY_ROWS_SCHEMA)


DELETE_ENTRY_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("manifest_path", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("content", T.IntegerType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("file_size", T.LongType()),
    ]
)

POSITION_DELETE_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("delete_file", T.StringType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("pos", T.LongType()),
    ]
)


def read_delete_manifest_entries(blob_df: DataFrame) -> DataFrame:
    """Decode DELETE-manifest Avro blobs -> one row per delete file.
    Equality deletes (content = 2) FAIL the task loudly: applying
    them needs the table schema and data-page reads — silently
    skipping one would return rows the table says are gone."""

    def kernel(batches) -> Iterator:
        import pandas as pd

        from trollflow2_spark.sources.avro import read_container

        for pdf in batches:
            out = []
            for path, blob in zip(pdf["path"], pdf["blob"]):
                _meta, records = read_container(bytes(blob))
                for r in records:
                    if int(r["content"]) == 2:
                        raise NotImplementedError(
                            "Iceberg equality deletes (content=2) are "
                            "not supported by the metadata-core "
                            "reader; rewrite them to position deletes "
                            "or compact the table (delete file "
                            f"{r['file_path']!r} in manifest {path!r})"
                        )
                    out.append(
                        (
                            path,
                            r["status"],
                            r["file_path"],
                            r["content"],
                            r["record_count"],
                            r["file_size"],
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[f.name for f in DELETE_ENTRY_ROWS_SCHEMA.fields],
            )

    return blob_df.mapInPandas(kernel, DELETE_ENTRY_ROWS_SCHEMA)


def read_position_deletes(blob_df: DataFrame) -> DataFrame:
    """Decode position-delete file blobs -> (delete_file, file_path,
    pos) rows, one task per blob, via the same Arrow kernel shape as
    the manifests."""

    def kernel(batches) -> Iterator:
        import pandas as pd

        from trollflow2_spark.sources.avro import read_container

        for pdf in batches:
            out = []
            for path, blob in zip(pdf["path"], pdf["blob"]):
                _meta, records = read_container(bytes(blob))
                for r in records:
                    out.append((path, r["file_path"], r["pos"]))
            yield pd.DataFrame(
                out,
                columns=[
                    f.name for f in POSITION_DELETE_ROWS_SCHEMA.fields
                ],
            )

    return blob_df.mapInPandas(kernel, POSITION_DELETE_ROWS_SCHEMA)


def snapshot_partition_summary(
    spark,
    metadata_json: str,
    blob_df: DataFrame,
) -> DataFrame:
    """Per-(snapshot, partition) live rollup across EVERY snapshot in
    the table (time travel as a table): manifest lists resolve on the
    driver (control plane, as real engines do), manifest blobs decode
    distributed, deleted entries (status=2) drop, and one hash agg
    yields live file counts / record counts / bytes.

    v2 merge-on-read: manifest-list entries with ``content = 1``
    route to the delete plane — their delete files decode to
    (file_path, pos) rows, DISTINCT positions per (snapshot, data
    file) count as gone, and the rollup's ``n_rows`` subtracts them.
    Distinct-per-snapshot makes rewritten/re-applied delete files
    idempotent; a fully-deleted data file still counts in
    ``n_files`` (it exists until a compaction rewrites it) with its
    rows at zero."""
    from trollflow2_spark.sources.avro import read_container

    md = parse_table_metadata(metadata_json)
    list_blobs = {
        r["path"]: bytes(r["blob"])
        for r in blob_df.where(
            F.col("path").isin(
                [s["manifest_list"] for s in md["snapshots"].values()]
            )
        ).collect()  # one tiny blob per snapshot: control plane
    }
    membership = []  # (snapshot_id, manifest_path, content)
    for sid, s in md["snapshots"].items():
        if s["manifest_list"] not in list_blobs:
            raise ValueError(
                f"manifest list {s['manifest_list']!r} missing"
            )
        _m, records = read_container(list_blobs[s["manifest_list"]])
        for r in records:
            membership.append(
                (sid, r["manifest_path"], int(r.get("content", 0)))
            )
    member_df = spark.createDataFrame(
        membership, "snapshot_id long, manifest_path string, content int"
    )
    data_member = member_df.where(F.col("content") == 0).drop("content")
    entries = read_manifest_entries(
        blob_df.join(
            data_member.select("manifest_path").distinct(),
            blob_df["path"] == F.col("manifest_path"),
            "left_semi",
        )
    )
    live = entries.where(F.col("status") != 2).join(
        F.broadcast(data_member), "manifest_path"
    )

    del_member = member_df.where(F.col("content") == 1).drop("content")
    if any(c == 1 for _sid, _mp, c in membership):
        # delete manifests -> live delete FILES per snapshot
        dm_entries = read_delete_manifest_entries(
            blob_df.join(
                del_member.select("manifest_path").distinct(),
                blob_df["path"] == F.col("manifest_path"),
                "left_semi",
            )
        )
        del_files = (
            dm_entries.where(F.col("status") != 2)
            .join(F.broadcast(del_member), "manifest_path")
            .select("snapshot_id", F.col("file_path").alias("delete_file"))
        )
        # delete-file blobs -> (file_path, pos) rows, decoded once
        # per blob however many snapshots reference it
        pos_rows = read_position_deletes(
            blob_df.join(
                del_files.select(
                    F.col("delete_file").alias("manifest_path")
                ).distinct(),
                blob_df["path"] == F.col("manifest_path"),
                "left_semi",
            )
        )
        gone = (
            pos_rows.join(F.broadcast(del_files), "delete_file")
            .select("snapshot_id", "file_path", "pos")
            .distinct()
            .groupBy("snapshot_id", "file_path")
            .agg(F.count(F.lit(1)).alias("__gone"))
        )
        live = live.join(
            gone, ["snapshot_id", "file_path"], "left"
        ).withColumn(
            "record_count",
            F.col("record_count") - F.coalesce(F.col("__gone"), F.lit(0)),
        )

    return (
        live.groupBy("snapshot_id", "partition")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("record_count").alias("n_rows"),
            F.sum("file_size").alias("total_bytes"),
        )
    )
