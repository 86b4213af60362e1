"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
stay consistent, and a sampled subset hash-matches DuckDB locally
(the full sweep lives in tools/check_oracle.py)."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from trollflow2_spark.tables import TABLE_NAMES

SAMPLE = [
    "q1_pricing_summary",
    "priority_batches",
    "dedup_exact",
    "embedding_topk",
]


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle without a query"
    # every oracle-checked operator is callable
    assert all(callable(f) for f in q.values())
    assert len(q) >= 30


@pytest.mark.parametrize("name", SAMPLE)
def test_sampled_oracle_match(spark, sf_dir, name):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sdf = entrymod.queries()[name](spark, sf_dir)
    srows = sorted([tuple(r) for r in sdf.collect()], key=str)
    cur = con.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = sorted([tuple(r) for r in cur.fetchall()], key=str)
    assert sdf.columns == ocols
    assert len(srows) == len(orows)
    for a, b in zip(srows, orows):
        for va, vb in zip(a, b):
            if isinstance(va, float) and isinstance(vb, float):
                assert va == pytest.approx(vb, abs=0, rel=0) or va == vb
            else:
                assert str(va) == str(vb)
