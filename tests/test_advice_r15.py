"""Pins for the r15 ADVICE fixes: DV-mask completeness without
dv_files, live_records null-gating on statless adds, roaring run
bounds, and the recall-audit sample-budget guard."""

import json
import struct
import uuid

import pytest
from pyspark.sql import Row

from trollflow2_spark.sources.roaring import (
    RoaringError,
    decode_rbm_array,
    z85_encode,
)


def test_run_container_overflow_raises():
    # run 65530 + length 10 crosses the 16-bit container boundary;
    # must raise, not bleed into the next high-container
    rb = (
        struct.pack("<I", 12347)
        + b"\x01"
        + struct.pack("<HH", 0, 8)
        + struct.pack("<HHH", 1, 65530, 10)
    )
    arr = struct.pack("<qi", 1, 0) + rb
    with pytest.raises(RoaringError, match="16-bit"):
        decode_rbm_array(arr)


def test_dv_positions_without_dv_files_raises_on_ondisk(spark):
    """dv_files=None + an on-disk ('u') descriptor: the positions
    mask would be incomplete, so the decode must fail loudly instead
    of silently returning only the inline DVs."""
    from trollflow2_spark.extensions.profile import (
        delta_dv_positions,
        delta_log_snapshot,
    )

    u1 = uuid.uuid5(uuid.NAMESPACE_DNS, "advice-r15")
    line = json.dumps({"add": {
        "path": "x", "size": 1,
        "stats": json.dumps({"numRecords": 5}),
        "deletionVector": {
            "storageType": "u",
            "pathOrInlineDv": z85_encode(u1.bytes),
            "offset": 1, "sizeInBytes": 8, "cardinality": 2,
        },
    }})
    log = spark.createDataFrame([(0, line)], "version int, line string")
    snap = delta_log_snapshot(log, stats=True)
    with pytest.raises(Exception, match="not found in dv_files"):
        delta_dv_positions(snap).collect()


def test_statless_add_live_records_is_null(spark):
    """An add action with no stats must surface live_records=NULL
    (absent evidence), not 0 — greatest() skips nulls."""
    from trollflow2_spark.extensions.profile import delta_log_snapshot

    lines = [
        (0, json.dumps({"add": {"path": "nostats", "size": 10}})),
        (0, json.dumps({"add": {
            "path": "stats", "size": 10,
            "stats": json.dumps({"numRecords": 7}),
        }})),
    ]
    log = spark.createDataFrame(lines, "version int, line string")
    rows = {
        r["path"]: r
        for r in delta_log_snapshot(log, stats=True).collect()
    }
    assert rows["nostats"]["live_records"] is None
    assert rows["nostats"]["num_records"] is None
    assert rows["stats"]["live_records"] == 7


def test_recall_audit_row_guard(spark):
    from trollflow2_spark.extensions.dedup import lsh_recall_audit

    df = spark.range(50).selectExpr(
        "id AS doc_id", "concat('w', id % 7, ' w', id % 5) AS text"
    )
    with pytest.raises(ValueError, match="max_sample_rows"):
        lsh_recall_audit(df, max_sample_rows=10)
    # under the cap still runs
    out = lsh_recall_audit(df, max_sample_rows=100).collect()
    assert len(out) == 1
