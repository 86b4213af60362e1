#!/usr/bin/env python
"""Benchmark runner: executes the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total-sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is timed over a FULL materialization: the result writes to
Spark's ``noop`` sink, which evaluates every output column but discards
the rows. (A bare ``count()`` is NOT a valid harness here — Catalyst
prunes every column a count doesn't need, so projection-shaped queries
like pii_scrub would bench an empty scan; rounds 1-4 measured exactly
that, which is why several per-query numbers step up in round 5.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — scan+agg, join chain, window,
# spatial join, LSH dedup, similarity, text. Keep this list stable so
# BENCH_r{N}.json is comparable across rounds.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "block_aggregate",
    "resolution_top1",
    "sessionize",
    "nearest_join_asof",
    "weighted_resample",
    "resample_2d_nearest",
    # round 2 additions (new operator families)
    "resample_2d_nearest_left",
    "resample_grid_mapped",
    "resample_coarsest",
    "weighted_resample_2d",
    "coverage_real",
    "multimodal_decode",
    "frame_sample",
    "overview_pyramid",
    "sza_filter",
    "valid_fraction_filter",
    "minhash_signatures",
    "simhash",
    "embedding_topk",
    "embedding_neardup",
    "minhash_lsh_pairs",
    "text_quality",
    "token_count",
    "dedup_exact",
    # round 3 additions
    "q3_bucketed",  # zero-Exchange fact join (vs q3_shipping_priority)
    "embedding_ivf",
    "multimodal_decode_png",
    "pipeline_roundtrip",
    "dataset_split",
    "pack_sequences",
    "global_shuffle",
    "interleave_mixture",
    "duplicate_clusters",
    "pii_scrub",
    "contamination_check",
    "quality_filter",
    "corpus_stats",
    "vocab_topk",
    "tfidf_top_terms",
    "ngram_containment_pairs",
    "embedding_centroids",
    "source_quality",
    "funnel_conversion",
    "event_counts_salted",
    # round 5 additions
    "ngram_jaccard_pairs",  # now LSH-candidate-fed (was quadratic blocking)
    "simhash_pairs",
    "multimodal_decode_tiff",
    "multimodal_decode_jpeg",
    "multimodal_decode_jpeg_color",
    "frame_sample_tiff",
    "frame_sample_mjpeg",
    "skew_seq_plain",  # hot-key baseline: one task owns 50% of rows
    "skew_seq_salted",  # salted two-stage twin — must beat the baseline
    "minhash_lsh_pairs_fast",  # xxhash64 production path vs the md5 oracle hash
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from trollflow2_spark.queries import QUERIES
    from trollflow2_spark.session import get_spark

    spark = get_spark("bench")

    # warm the JVM + parquet footers so per-query times measure the query,
    # not session startup
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # best-of-2 per query: the first run pays Catalyst analysis + codegen
    # and absorbs host-noise spikes; the min is the reproducible number a
    # warmed cluster would see.
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        runs = []
        for _ in range(2):
            t0 = time.time()
            # noop sink: full evaluation of every output column, no
            # column pruning, nothing written
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        times[name] = round(min(runs), 3)
        print(
            f"# {name}: {times[name]:.3f}s (runs {[round(r, 3) for r in runs]})",
            file=sys.stderr,
        )

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall clock",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
