#!/usr/bin/env python
"""Isolated per-query measurement for the optimization round: times the
named queries with the bench protocol (fresh tuned session, noop sink,
min-of-N) and optionally dumps `explain("formatted")` to a file per
query. Usage:

    python tools/bench_some.py [--sf DIR] [--runs N] [--plans OUTDIR \
        --suffix before|after] query [query ...]

Prints one line per query: name, min, all samples. This is the guide
section 1 protocol (measure first, isolate with the noop sink, keep
plan evidence) applied to a hand-picked subset so a full 363-query
suite run is not needed per iteration.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain() here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--shared-session",
        action="store_true",
        help="one session for all queries (default: fresh per query, "
        "the adjudication protocol — session wear from heavy "
        "localCheckpoint queries otherwise inflates later entries)",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from bench import _fresh_session

    from trollflow2_spark.queries import QUERIES

    spark = _fresh_session(args.sf)
    for qi, name in enumerate(args.queries):
        if qi and not args.shared_session:
            spark.stop()
            spark = _fresh_session(args.sf)
        fn = QUERIES[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(f"bench_some:{name}")
        samples = []
        for _ in range(args.runs):
            spark.catalog.clearCache()  # bench.py's cold-run protocol
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        print(f"{name}: min {min(samples):.3f}s runs {samples}", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
