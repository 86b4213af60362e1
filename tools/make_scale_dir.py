#!/usr/bin/env python
"""Generate a K-times-scaled copy of a fixture SF directory for the
scaling demonstration (VERDICT r15 #7): sf0.1 cannot show parallel
speedup (single-row-group tables, fixed-cost-dominated), so this
builds an "sf1-like" directory by unioning K key-shifted replicas of
each FACT table (documents/events/lineitem/orders/customer/embeddings)
while leaving dimension tables (nation/region/supplier/part) alone.
Replica texts get a per-replica prefix so exact-duplicate classes do
not multiply by K. Output tables are written as multi-file parquet so
scans actually split.

    python tools/make_scale_dir.py [--src sf0.1] [--dst /tmp/sfscale] [--k 10]

This is measurement tooling only — nothing in the engine or the bench
reads the generated directory unless pointed at it explicitly.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 10_000_000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sfscale")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--files", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from trollflow2_spark.session import get_spark

    spark = get_spark("make-scale-dir")
    os.makedirs(args.dst, exist_ok=True)

    shifts = {
        "documents": ["doc_id"],
        "events": ["event_id", "user_id"],
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "embeddings": ["vec_id"],
    }
    copy_only = ["nation", "region", "supplier", "part"]

    for name in copy_only:
        df = spark.read.parquet(os.path.join(args.src, f"{name}.parquet"))
        df.write.mode("overwrite").parquet(
            os.path.join(args.dst, f"{name}.parquet")
        )
        print(f"{name}: copied")

    for name, keys in shifts.items():
        src = spark.read.parquet(os.path.join(args.src, f"{name}.parquet"))
        parts = []
        for i in range(args.k):
            rep = src
            for kcol in keys:
                rep = rep.withColumn(
                    kcol, (F.col(kcol) + F.lit(i * STRIDE)).cast("long")
                )
            if name == "documents" and i > 0:
                # distinct content per replica: exact-dup classes and
                # LSH buckets keep their per-replica size instead of
                # growing K-fold (which would change the workload's
                # complexity class, not just its volume)
                rep = rep.withColumn(
                    "text", F.concat(F.lit(f"replica{i} "), F.col("text"))
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(args.files).write.mode("overwrite").parquet(
            os.path.join(args.dst, f"{name}.parquet")
        )
        n = spark.read.parquet(
            os.path.join(args.dst, f"{name}.parquet")
        ).count()
        print(f"{name}: {n} rows x {args.files} files")
    print("done ->", args.dst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
