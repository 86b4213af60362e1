"""Semantics tests for the Iceberg metadata-tree reader."""

import json

import pytest
from pyspark.sql import Row

from trollflow2_spark.sources.avro import write_container
from trollflow2_spark.sources.iceberg import (
    MANIFEST_LIST_SCHEMA,
    MANIFEST_SCHEMA,
    parse_table_metadata,
    snapshot_partition_summary,
)


def _entry(status, path, part, rc=10, fs=100):
    return {
        "status": status,
        "file_path": path,
        "partition": part,
        "record_count": rc,
        "file_size": fs,
    }


def _mlist(paths):
    return write_container(
        [
            {
                "manifest_path": p,
                "added_files_count": 0,
                "deleted_files_count": 0,
            }
            for p in paths
        ],
        MANIFEST_LIST_SCHEMA,
    )


def _metadata(snaps, current):
    return json.dumps(
        {
            "format-version": 2,
            "current-snapshot-id": current,
            "snapshots": [
                {
                    "snapshot-id": sid,
                    "timestamp-ms": sid * 1000,
                    "manifest-list": ml,
                }
                for sid, ml in snaps
            ],
        }
    )


def test_metadata_parse_and_validation():
    md = parse_table_metadata(_metadata([(1, "l1"), (2, "l2")], 2))
    assert md["current"] == 2 and set(md["snapshots"]) == {1, 2}
    with pytest.raises(ValueError):
        parse_table_metadata("{}")
    with pytest.raises(ValueError):
        parse_table_metadata(_metadata([(1, "l1")], 9))


def test_snapshot_live_sets_and_deletes(spark):
    m1 = write_container(
        [_entry(1, "a", "p0"), _entry(1, "b", "p1")], MANIFEST_SCHEMA
    )
    # snapshot 2 rewrites m1: file "a" deleted, "b" existing; adds "c"
    m2 = write_container(
        [_entry(2, "a", "p0"), _entry(0, "b", "p1")], MANIFEST_SCHEMA
    )
    m3 = write_container([_entry(1, "c", "p0", rc=7)], MANIFEST_SCHEMA)
    blobs = spark.createDataFrame(
        [
            Row(path="m1", blob=m1),
            Row(path="m2", blob=m2),
            Row(path="m3", blob=m3),
            Row(path="l1", blob=_mlist(["m1"])),
            Row(path="l2", blob=_mlist(["m2", "m3"])),
        ]
    )
    out = snapshot_partition_summary(
        spark, _metadata([(1, "l1"), (2, "l2")], 2), blobs
    )
    got = {(r.snapshot_id, r.partition): r for r in out.collect()}
    assert got[(1, "p0")].n_files == 1 and got[(1, "p1")].n_files == 1
    assert (2, "p1") in got  # "b" survives as existing
    assert got[(2, "p0")].n_files == 1  # "a" deleted, "c" added
    assert got[(2, "p0")].n_rows == 7


def test_missing_manifest_list_fails_loudly(spark):
    blobs = spark.createDataFrame([Row(path="x", blob=b"zz")])
    with pytest.raises(ValueError):
        snapshot_partition_summary(
            spark, _metadata([(1, "l-missing")], 1), blobs
        )
