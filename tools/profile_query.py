#!/usr/bin/env python
"""Per-job/stage wall-clock profile of one query via the Spark event
log (guide §1/§7: find WHERE the time goes before touching anything).

    python tools/profile_query.py [--sf DIR] [--runs N] query [query...]

For each query: runs it against the noop sink with event logging on,
then prints every job (description, wall seconds, stage task counts)
plus the gap time between jobs (driver-side planning / py4j / control
plane). The LAST run's profile prints (warmed JVM)."""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    logdir = "/tmp/sparklogs"
    os.makedirs(logdir, exist_ok=True)
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from trollflow2_spark.session import get_spark

    for attr in ("_instantiatedSession", "_activeSession"):
        setattr(SparkSession, attr, None)
    import pyspark

    builder = (
        SparkSession.builder.master("local[32]")
        .appName("profile")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", "file://" + logdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from trollflow2_spark.session import tune_for_oracle

    tune_for_oracle(spark)
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()

    from trollflow2_spark.queries import QUERIES

    for name in args.queries:
        fn = QUERIES[name]
        for r in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}#r{r}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            print(f"== {name} run {r}: {wall:.2f}s", flush=True)
        spark.sparkContext.setJobDescription(None)

    spark.stop()

    # parse the single event log
    cands = sorted(glob.glob(logdir + "/*"))
    evfile = cands[0]
    if os.path.isdir(evfile):  # Spark 4 rolling event log dir
        evfile = sorted(
            p
            for p in glob.glob(evfile + "/*")
            if "appstatus" not in os.path.basename(p)
        )[0]
    jobs = {}
    stages = {}
    with open(evfile) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "tasks": si["Number of Tasks"],
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "ms": (si.get("Completion Time", 0) or 0)
                    - (si.get("Submission Time", 0) or 0),
                }
    by_desc: dict[str, list] = {}
    for jid in sorted(jobs):
        j = jobs[jid]
        by_desc.setdefault(j["desc"], []).append((jid, j))
    for desc, js in by_desc.items():
        if not desc:
            continue
        total = sum(j["end"] - j["start"] for _, j in js if "end" in j)
        first = min(j["start"] for _, j in js)
        last = max(j.get("end", 0) for _, j in js)
        print(
            f"\n### {desc}: {len(js)} jobs, job-time {total/1000:.2f}s, "
            f"span {(last-first)/1000:.2f}s (gaps {(last-first-total)/1000:.2f}s)"
        )
        for jid, j in js:
            dur = (j.get("end", j["start"]) - j["start"]) / 1000
            stg = [
                f"{stages.get(s, {}).get('tasks', '?')}t/"
                f"{stages.get(s, {}).get('ms', 0)/1000:.1f}s"
                f"({stages.get(s, {}).get('name', '')[:28]})"
                for s in j["stages"]
                if s in stages
            ]
            print(f"  job {jid}: {dur:6.2f}s  stages[{' '.join(stg)}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
