#!/usr/bin/env python
"""Regenerate PLANS_r{N}.md: `explain('formatted')` dumps of the flagship
queries whose physical-plan properties the plan-quality tests pin.

Usage: python tools/dump_plans.py [sf_dir] [out_md]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

FLAGSHIP = [
    ("q1_pricing_summary",
     "Scan+agg: filters pushed to parquet, pruned ReadSchema, "
     "partial+final HashAggregate in one whole-stage-codegen span."),
    ("q3_bucketed",
     "Bucketed fact join: zero Exchange on the fact side (bucket "
     "co-location replaces the shuffle)."),
    ("crawl_pipeline",
     "End-to-end crawl chain: exactly two hash exchanges (capture "
     "window, digest window); parse/extract/canonicalize/gate all live "
     "in the scan stage."),
    ("incremental_dedup",
     "Daily increment vs corpus: both joins BroadcastHashJoin; the "
     "corpus never hash-partitions."),
    ("semantic_dedup",
     "SemDeDup: Arrow-matmul cell assignment map-side; only (id, cell) "
     "and id-pairs shuffle; label propagation rounds with bounded "
     "lineage."),
    ("bpe_tokenize",
     "Subword encode: Exchange-free — broadcast vocab, one Arrow UDF "
     "pass inside the scan stage."),
    ("temperature_mixture",
     "p^alpha mixture sample: zero exchanges — one map-side hash "
     "predicate over the scan."),
    ("embedding_ivf_quantized",
     "Quantized IVF serving: int8 store scanned, cell equi-join bounds "
     "candidates, broadcast query side."),
    ("embedding_pq_topk",
     "PQ asymmetric-distance serving: one scan of the m-byte code "
     "store serves every query via literal lookup tables; no float "
     "vectors read, one exchange for the per-query top-k."),
    ("line_dedup",
     "C4-style line dedup: first-occurrence tier is a map-side-"
     "combinable hash agg on the line digest (no per-line window); "
     "digest equi-join + one per-doc rebuild agg."),
    ("concat_chunks",
     "Concat-then-chunk: sharded cumsum windows (partitioned by the "
     "contiguous id range), broadcast base offsets, map-side example "
     "fan-out."),
    ("dsir_resample",
     "DSIR selection: both unigram models broadcast into one pass "
     "over the corpus token stream; portable-hash keep decision "
     "map-side."),
    ("bigram_logprob",
     "Interpolated bigram LM: top-k transition table + unigram model "
     "both broadcast; scoring is one pass over the exploded pairs."),
    ("warc_ingest_zst",
     ".warc.zst intake: executor-side frame decode in the parse "
     "kernel; HTML->text stays a scan-stage regex chain."),
    # round 7 flagships
    ("q19_disjunctive_revenue",
     "Disjunctive pushdown: the three OR'd brand/size/quantity "
     "branches reach BOTH parquet scans as PushedFilters."),
    ("q21_waiting_suppliers",
     "EXISTS + NOT-EXISTS decorrelated into ONE fact pass: per-order "
     "late-supplier sets (bounded by suppliers-per-order) replace the "
     "second fact scan."),
    ("q11_part_value_concentration",
     "Scalar-subquery HAVING: the per-part agg exchange is reused at "
     "runtime for the 1-row total — the fact table scans once."),
    ("interval_join_events",
     "Range join via time buckets: interval explode + shuffled "
     "equi-join + exact verify; no BroadcastNestedLoopJoin."),
    ("rollup_revenue",
     "ROLLUP in one pass: Expand feeds a single partial+final hash "
     "agg; the fact side shuffles once for all three grouping levels."),
    # round 8 flagships
    ("fuzzy_lev_pairs",
     "True levenshtein<=1: wildcard same-position join (substitution) "
     "unioned with the one-deletion equi-join (indel) over DISTINCT "
     "strings; adaptive id re-attachment — the distinct-heavy fast "
     "path plans the single-aggregation closure with no chunk "
     "machinery."),
    ("bm25_retrieval",
     "Okapi BM25: one (doc, term) hash agg + window doc length; "
     "query-term df and 1-row stats broadcast (two BroadcastHashJoin "
     "+ one 1-row BNLJ); micro-unit sums make scores order-free."),
    ("scrub_repeated_spans",
     "Exact-substring span scrub: shared span build, bounded span "
     "array per affected doc LEFT-joined back, nested higher-order "
     "cut in whole-stage codegen."),
    ("weighted_sample",
     "Efraimidis-Spirakis weighted draw: map-side hash+pow key, one "
     "per-stratum top-k window — the only exchange."),
    ("media_container_metadata",
     "Container metadata: closed-form blob build + header-only parse, "
     "two chained Arrow mapInPandas stages, zero exchanges."),
    ("corpus_recipe",
     "Config-driven 4-stage recipe: quality semi-join (cached once) -> "
     "span scrub -> digest-window dedup -> map-side split; the "
     "orchestration adds no shuffles of its own."),
    ("pdf_text",
     "PDF intake: closed-form blob build + COS parse/FlateDecode, two "
     "chained Arrow mapInPandas stages, zero exchanges."),
    ("html_markdown",
     "HTML -> markdown: one pure regexp-chain projection inside the "
     "scan stage, zero exchanges, zero Python."),
    # round 9 flagships
    ("bm25_multi_query",
     "Multi-query BM25: corpus stats map-side off the raw scan, doc "
     "length rides the explode, the broadcast term filter sits BEFORE "
     "the (doc, term) agg so only query-matched tokens shuffle; two "
     "corpus scans total, independent of the query count."),
    ("hybrid_multi_retrieval",
     "Per-query RRF fusion: both rankers' top-k run as the exact "
     "salted two-stage window (k per (query, sub-bucket), then the "
     "bounded final rank) — no corpus-wide single-partition window; "
     "fuse is a full-outer join of two (nq x k)-row sides."),
    ("fuzzy_long_pairs",
     "Ed-join over 100+-char strings: rarest q-gram prefix joins the "
     "partner's full gram set under length/position bands; exact "
     "levenshtein verify before id expansion; no quadratic join."),
    ("mp4_frame_index",
     "mp4 keyframe index: closed-form blob build + header-only "
     "sample-table/SPS parse, two chained Arrow mapInPandas stages, "
     "zero exchanges."),
    ("audio_neardup",
     "Audio near-dup: WAV decode + integer envelope fingerprint "
     "map-side; pairs through the guarded hamming-band equi-join, "
     "same machinery as simhash/dHash."),
    ("compaction_plan",
     "Compaction planner: one per-stratum window over the "
     "manifest-sized file table — a single exchange on the stratum "
     "key, everything else map-side."),
    ("wet_ingest",
     "WET sidecar intake: planted .wet.gz round-trip through the real "
     "WARC parser in one Arrow mapInPandas stage; text/line-count "
     "derivation is scan-stage Column algebra. The single Exchange is "
     "the fixture's deliberate repartition (spread the planted-blob "
     "build); the intake itself adds none."),
    ("wat_frontier",
     "WAT -> frontier: typed from_json + posexplode + host/PSL regexp "
     "algebra all in the scan stage; the only shuffles are the "
     "two-phase distinct aggregate's pair of exchanges for the "
     "per-domain rollup (plus the fixture repartition)."),
    ("incremental_ivf_drift",
     "Frozen-quantizer increment audit: one Arrow matmul assignment "
     "pass over base-union-increment; the only exchange carries the "
     "k-row per-cell aggregate."),
    ("contamination_semantic",
     "Embedding-space contamination: corpus assigned map-side, the "
     "multi-probed held side broadcasts (BroadcastHashJoin on the "
     "cell) — the corpus never hash-partitions; one exchange for the "
     "per-held rollup."),
    ("corpus_recipe_decontam",
     "Decontaminate -> dedup -> split recipe: held shingle digests "
     "broadcast into a map-side semi-join, leaky ids leave via "
     "left-anti, then the digest window and the map-side split "
     "predicate."),
    # round 9, third pass
    ("blocklist_filter",
     "Wordlist gate: zero Exchange, zero Python — higher-order token "
     "algebra and integer rules inside the scan stage, ReadSchema "
     "pruned to (doc_id, text)."),
    ("logreg_train",
     "Distributed-GD scoring plan: map-only projection over the "
     "checkpointed integer feature table (ExistingRDD) — the 16 "
     "training aggregates ran as identical-shape 1-row jobs."),
    ("cdc_chunks",
     "Content-defined chunking: staged projections materialize the "
     "hash array once per row, then posexplode — no Exchange, the "
     "whole operator lives in the scan stage."),
    ("rerank_retrieval",
     "Retrieve -> rerank: the fused candidate x term table reaches "
     "the doc-text join as a BroadcastHashJoin build side; the rank "
     "window partitions per query over <= 2k rows."),
    ("domain_quality_gate",
     "Site-level gate: one hash agg to domain grain; the verdict join "
     "is NOT hint-forced — AQE broadcasts from measured size at small "
     "k and falls back to SortMergeJoin at crawl-scale domain "
     "cardinality (both paths plan-pinned)."),
    ("vocab_drift",
     "Snapshot drift audit: one conditional-sum token hash agg, "
     "1-row totals broadcast, distributed TakeOrdered top-K — every "
     "output an integer ppm."),
    ("corpus_release",
     "Release capstone in one plan: scan-stage gates, LSH band "
     "joins, CC label rounds, the best-representative argmax window "
     "riding the cluster partitioning, map-side cluster-keyed split."),
    # round 10 flagships
    ("pdf_text_objstm",
     "PDF 1.5+ intake: ObjStm unpack happens inside the same "
     "per-file Arrow mapInPandas kernel — two chained Python stages, "
     "zero exchanges, no new distribution surface."),
    ("cdc_monster_doc",
     "Linear CDC proof: boundary-position array + per-chunk slices "
     "in the scan stage; the only exchange is the per-doc rollup of "
     "the 8-row control-plane output."),
    ("kmeans_train",
     "Distributed Lloyd output plan: map-only distance/argmin "
     "projection over the checkpointed micro-unit table "
     "(ExistingRDD) — the training iterations ran as "
     "identical-shape k-row agg jobs."),
    ("cms_heavy_hitters",
     "CMS audit: sketch = one map-side-combinable (row, cell) hash "
     "agg; exact top-k via TakeOrdered (no single-partition "
     "window); the k-row candidate side broadcasts into the "
     "estimate join."),
    ("sft_chat_masks",
     "SFT assembly: tokenize/slice/concat/digest all higher-order "
     "Column algebra inside the scan stage — zero exchanges, zero "
     "Python."),
    ("dpo_pairs",
     "DPO pairs: same scan-stage shape as the SFT op — one shared "
     "prompt truncation, two digests, both gates as integer "
     "predicates; zero exchanges."),
    ("h264_slice_index",
     "Slice-type index: closed-form blob build + NAL walk in two "
     "chained Arrow mapInPandas stages, zero exchanges."),
    ("mp3_frame_index",
     "MPEG-audio frame index: same two-stage mapInPandas intake "
     "shape, zero exchanges."),
    ("table_expectations",
     "Expectations report: one aggregation per rule unioned; the FK "
     "rule joins DISTINCT parent keys (broadcast at dimension "
     "size)."),
    ("ann_dim_truncation_audit",
     "Truncation audit: both exact rankings ride the broadcast-"
     "query brute-force plan; the per-query set intersection is a "
     "3-row join."),
    # round 11 flagships (continuation session)
    ("cidr_enrich",
     "IP longest-prefix join: CIDRs exploded onto the /16 grid and "
     "broadcast — the match is an EQUI BroadcastHashJoin with a "
     "range residual (never a BroadcastNestedLoopJoin); precedence "
     "is one map-side-combinable max_by keyed by the point id."),
    ("geo_radius_join",
     "Radius join: sites explode to the 3x3 cell neighborhood and "
     "broadcast; EQUI hash join on the cell struct + haversine "
     "residual — no CartesianProduct, points never shuffle for the "
     "match."),
    ("cdc_apply",
     "CDC MERGE: one max_by hash agg keyed by entity — hot CDC keys "
     "collapse map-side before the shuffle; no window sort over the "
     "feed."),
    ("moments_profile",
     "Moments sketch: one partial+final hash agg carrying the "
     "7-number DECIMAL state; derived stats are scan-stage "
     "projections over the k-group output."),
    ("binary_metrics",
     "Exact AUC: hash agg to the bounded distinct-score table, the "
     "rank window runs over THAT (never the raw rows), one final "
     "per-group agg."),
    ("downsample_ohlc",
     "OHLC rollup: a single min_by/max_by aggregate pair — no "
     "Window operator in the plan."),
    ("delta_snapshot",
     "Delta-log replay: from_json in the scan stage; one path-keyed "
     "max_by agg — the log never sorts."),
    ("avro_ingest",
     "Avro intake: fixture build + container decode as two chained "
     "Arrow mapInPandas stages; from_json cuts stay in the scan "
     "stage (the one Exchange is the fixture's deliberate "
     "repartition)."),
    ("point_in_polygon",
     "Geofence tagging: the polygon catalog compiles INTO the scan "
     "stage as literal Column terms — zero Exchange, zero Join, no "
     "Python; rows never leave their input partition."),
    ("access_log_parse",
     "Combined-log parse: ONE regexp_replace evaluation per row "
     "rendered to delimited fields + split — zero Exchange, the "
     "whole parse in whole-stage codegen."),
    ("touch_attribution",
     "Conversion attribution: RANGE [-7d,-1s] frame over epoch "
     "seconds — one Exchange on the user key, no time-band "
     "self-join fan-out."),
    ("link_prediction",
     "Link prediction: hub-pruned pair self-join shuffles once on "
     "the shared-neighbor key; degree side tables broadcast; "
     "Adamic-Adar terms DECIMAL-summed map-side."),
    ("tree_flatten",
     "Hierarchy flatten: ceil(log2 D) pointer-doubling self-joins, "
     "each round's plan a constant-size LogicalRDD join."),
    ("spatial_join_pip",
     "Grid-bucketed PIP join: cover-cell explode + equi join on "
     "(cx, cy), no cartesian; ray-cast verify is a Column fold in "
     "the joined stage."),
    ("link_prediction",
     "Degree tables UNHINTED (r13): AQE still picks "
     "BroadcastHashJoin at this size; hub guard before the pair "
     "join."),
    ("kendall_tau",
     "Pair stage: broadcast bounded series + salted repartition; "
     "C-D one map-side agg; tie pairs never build a pair table."),
    ("wilcoxon_shift",
     "Signed-rank: distinct-|d| reduction before the only window; "
     "row-level data never enters a rank window."),
    ("delta_snapshot_dv",
     "Deletion vectors (r14): the DV descriptor rides the max_by "
     "payload (still ONE path-keyed hash agg over the log); decode "
     "is one Arrow MapInPandas pass, inline Z85 join-free."),
    ("iceberg_eq_deletes",
     "Equality deletes (r14): the delete-file dimension broadcasts "
     "into the seq-number scoping join BEFORE any row decode; only "
     "affected data files read rows; gone rows union-dedup."),
    ("dbscan_blobs_3d",
     "k-D DBSCAN (r14): equi join on THREE cell-key columns, 27 "
     "plan-literal neighbor offsets, no cartesian/BNLJ."),
    ("outlier_mad_filter",
     "Percentile retirement (r14): both medians via GK-bracket "
     "selection — no percentile ObjectHashAggregate anywhere in "
     "the plan; medians broadcast back."),
    ("iceberg_partition_transforms",
     "Hidden partitioning (r14): bucket is the only Arrow hop; "
     "truncate/year/month stay in whole-stage codegen."),
    ("delta_cdf_window",
     "CDF routing (r14): per-version cdc/synthesize decision is a "
     "left-anti join off ONE parsed scan — no driver loop."),
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLANS_r8.md"

    from trollflow2_spark.queries import QUERIES
    from trollflow2_spark.session import get_spark

    spark = get_spark("plans")
    out = [
        "# PLANS — physical plans of flagship queries (round 7, sf0.01)",
        "",
        "Generated with `df.explain('formatted')`. These are the plans the",
        "plan-quality tests in `tests/test_plans.py` pin; regenerate with",
        "`python tools/dump_plans.py`.",
        "",
    ]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, note in FLAGSHIP:
        df = QUERIES[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        lines = plan.splitlines()
        out += [f"## {name}", "", note, "", "```"]
        out += lines[:120]
        if len(lines) > 120:
            out.append(f"... ({len(lines) - 120} detail lines trimmed)")
        out += ["```", ""]
    with open(out_path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
