"""Permanent oracle type audit (VERDICT r7 #2).

DuckDB types ``SUM`` over integers as HUGEINT (int128), which the
driver's harness serializes as float64 (``2206.0``) while Spark emits
bigint (``2206``) — a guaranteed hash mismatch even when every value is
identical (the r7 ``q12_shipping_delay`` red row).  This test binds
every registered oracle through DuckDB's planner (``rel.types`` — no
execution) and fails on any HUGEINT/UHUGEINT output column, so the bug
class can never sit latent in an un-sampled query again.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "lineitem.parquet")),
    reason="testdata not present",
)


def _bound_types():
    from trollflow2_spark.oracles import all_oracles
    from trollflow2_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    out = {}
    for name, sql in all_oracles(SF_DIR).items():
        rel = con.sql(sql)  # binds/plans only; .types never executes
        out[name] = list(zip(rel.columns, [str(t).upper() for t in rel.types]))
    return out


def test_no_hugeint_oracle_outputs():
    offenders = {
        name: [(c, t) for c, t in cols if "HUGEINT" in t]
        for name, cols in _bound_types().items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, (
        "oracles with HUGEINT/UHUGEINT output columns (wrap in "
        f"CAST(... AS BIGINT)): {offenders}"
    )
