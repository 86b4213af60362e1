#!/usr/bin/env python
"""Merge per-run BENCH_DETAIL files into the committed artifact: the
per-query MIN across exclusive-host runs (the round-9 adjudication
protocol), keeping every run's raw numbers in bench_runs_r{N}/ for
provenance. Usage:

    python tools/merge_bench.py BENCH_DETAIL_r12.json run1.json run2.json
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path, *run_paths = sys.argv[1:]
    runs = []
    for p in run_paths:
        with open(p) as fh:
            runs.append(json.load(fh))
    base = json.loads(json.dumps(runs[-1]))  # newest run's structure
    merged_q: dict[str, float] = {}
    for r in runs:
        for k, v in r.get("queries", {}).items():
            if k not in merged_q or v < merged_q[k]:
                merged_q[k] = v
    base["queries"] = merged_q
    base["value"] = round(sum(merged_q.values()), 2)
    base["n_queries"] = len(merged_q)
    base["merged_from_runs"] = len(runs)
    # stress sections merge by min too, runs lists concatenate
    stress: dict[str, dict] = {}
    for r in runs:
        for k, v in r.get("stress", {}).items():
            cur = stress.setdefault(
                k, {"min": v["min"], "runs": [], "rows": v.get("rows")}
            )
            cur["min"] = min(cur["min"], v["min"])
            cur["runs"].extend(v.get("runs", []))
    if stress:
        base["stress"] = stress
        base["stress_total"] = round(
            sum(v["min"] for v in stress.values()), 2
        )
    with open(out_path, "w") as fh:
        json.dump(base, fh, indent=1, sort_keys=True)
    print(
        f"merged {len(runs)} runs -> {out_path}: "
        f"{base['value']}s over {len(merged_q)} queries"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
