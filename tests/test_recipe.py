"""Config-driven corpus recipes: name-addressed stage registry, YAML
loading, fail-fast on unknown stages."""

from __future__ import annotations

import pytest


def test_recipe_runs_and_filters(spark):
    from pyspark.sql import functions as F

    from trollflow2_spark.extensions.recipe import run_recipe

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 3),
        (2, "the quick brown fox jumps over the lazy dog " * 3),  # dup
        (3, "tiny"),  # fails the token floor
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = run_recipe(
        docs,
        [
            {"stage": "quality_filter", "min_tokens": 10},
            {"stage": "exact_dedup"},
            {"stage": "split", "fractions": {"train": 0.8, "val": 0.2}},
        ],
    ).collect()
    assert [r["doc_id"] for r in out] == [1]  # dup 2 dropped, 3 filtered
    assert out[0]["split"] in ("train", "val")


def test_recipe_yaml_roundtrip(tmp_path):
    from trollflow2_spark.extensions.recipe import read_recipe

    p = tmp_path / "recipe.yaml"
    p.write_text(
        "- stage: quality_filter\n"
        "- stage: exact_dedup\n"
        "- stage: split\n  fractions:\n    train: 0.9\n    val: 0.1\n"
    )
    recipe = read_recipe(str(p))
    assert [r["stage"] for r in recipe] == [
        "quality_filter", "exact_dedup", "split",
    ]
    assert recipe[2]["fractions"] == {"train": 0.9, "val": 0.1}


def test_unknown_stage_fails_fast(spark):
    from trollflow2_spark.extensions.recipe import run_recipe

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown stage 'nope'"):
        run_recipe(docs, [{"stage": "nope"}])


def test_extended_stages(spark):
    """near_dedup keeps one doc per near-duplicate class; lang_filter
    gates on the marker guess; pii_scrub rewrites the text column."""
    from trollflow2_spark.extensions.recipe import run_recipe

    base = "the quick brown fox jumps over the lazy dog and runs on"
    rows = [
        (1, base + " fields"),
        (2, base + " fields"),  # exact near-dup of 1
        (3, "le chat et le chien sont dans la maison avec les enfants"),
        (4, "the contact email is bob@example.com for all questions here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = run_recipe(
        docs,
        [
            {"stage": "lang_filter", "allowed": ["en"]},
            {"stage": "near_dedup", "threshold": 0.2},
            {"stage": "pii_scrub"},
        ],
    ).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert 3 not in ids  # french dropped
    assert not (1 in ids and 2 in ids)  # near-dup class collapsed
    scrubbed = {r["doc_id"]: r["text"] for r in out}
    assert "[EMAIL]" in scrubbed[4] and "bob@" not in scrubbed[4]


def test_streaming_recipe_first_seen_across_batches(spark):
    """The incremental recipe keeps the FIRST-SEEN doc of every content
    class across micro-batches (later duplicates anti-join against the
    digest state), stateless stages run per batch unchanged, and the
    result equals the batch recipe on the concatenation when arrival
    order matches id order."""
    from trollflow2_spark.extensions.recipe import (
        replay_recipe_batches,
        run_recipe,
    )

    text_a = (
        "the quick brown fox jumps over the lazy dog while the keeper "
        "watches the gate and the visitors walk slowly past the old "
        "stone wall toward the garden where the fountain splashes"
    )
    text_b = text_a.replace("fox", "cat")
    batches = [
        [{"doc_id": 10, "text": text_a}, {"doc_id": 11, "text": text_b}],
        [{"doc_id": 20, "text": text_a}],  # dup of 10 -> dropped
        [{"doc_id": 30, "text": text_b}, {"doc_id": 31, "text": "tiny"}],
    ]
    recipe = [
        {"stage": "quality_filter"},
        {"stage": "exact_dedup"},
        {"stage": "split", "fractions": {"train": 0.8, "val": 0.2}},
    ]
    out = replay_recipe_batches(
        spark, batches, "doc_id long, text string", recipe
    )
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert sorted(got) == [10, 11]  # first-seen survive; 31 fails quality
    # equals the batch recipe on the concatenation
    allrows = [(r["doc_id"], r["text"]) for b in batches for r in b]
    ref = run_recipe(
        spark.createDataFrame(allrows, "doc_id long, text string"), recipe
    )
    want = {r["doc_id"]: r["split"] for r in ref.collect()}
    assert got == want


def test_streaming_near_dedup_drops_cross_batch_neardups(spark):
    """A later batch's near-duplicate (jittered, not exact) of an
    admitted survivor is dropped by the incremental verify against the
    survivor state; novel docs are admitted."""
    from trollflow2_spark.extensions.recipe import replay_recipe_batches

    base = (
        "the quick brown fox jumps over the lazy dog while the keeper "
        "watches the gate and the visitors walk slowly past the old "
        "stone wall toward the garden where the fountain splashes"
    )
    other = (
        "completely different content about spark partitions shuffles "
        "joins aggregations windows and the adaptive query execution "
        "engine that replans stages from runtime statistics today"
    )
    batches = [
        [{"doc_id": 1, "text": base + " v0"}],
        [{"doc_id": 2, "text": base + " v1"},  # near-dup of 1 -> drop
         {"doc_id": 3, "text": other + " v0"}],
        [{"doc_id": 4, "text": other + " v1"}],  # near-dup of 3 -> drop
    ]
    out = replay_recipe_batches(
        spark, batches, "doc_id long, text string",
        [{"stage": "near_dedup", "threshold": 0.6}],
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_run_recipe_audited_accounting(spark):
    """The audit's row accounting must be internally consistent
    (rows_in - rows_dropped == rows_out, each stage's rows_in == the
    previous stage's rows_out) and match the stages' actual effects."""
    from trollflow2_spark.extensions.recipe import (
        run_recipe,
        run_recipe_audited,
    )

    rows = [
        # long quality docs, one exact-dup pair, one blocklisted doc
        (1, "the quick brown fox jumps over the lazy dog again and "
            "again while the keeper watches the gate all day long"),
        (2, "the quick brown fox jumps over the lazy dog again and "
            "again while the keeper watches the gate all day long"),
        (3, "the slow dup big slow dup big the slow dup big slow dup "
            "big the slow dup big slow dup big the slow dup big slow"),
        (4, "a completely different document about the spark engine "
            "and the adaptive execution of shuffles and the windows"),
        (5, "x"),  # fails the token floor
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    recipe = [
        {"stage": "quality_filter", "min_tokens": 10},
        {"stage": "blocklist", "terms": ("slow", "dup", "big"),
         "min_distinct": 3, "max_density_bp": 900},
        {"stage": "exact_dedup"},
    ]
    audit = {r["stage_idx"]: r for r in run_recipe_audited(df, recipe).collect()}
    assert audit[0]["rows_out"] == 5
    for i in range(1, 4):
        r = audit[i]
        assert r["rows_in"] == audit[i - 1]["rows_out"]
        assert r["rows_in"] - r["rows_dropped"] == r["rows_out"]
    assert audit[1]["rows_dropped"] == 1  # doc 5
    assert audit[2]["rows_dropped"] == 1  # doc 3
    assert audit[3]["rows_dropped"] == 1  # dup of the 1/2 pair
    # the audited run's final width equals the plain run's
    assert audit[3]["rows_out"] == run_recipe(df, recipe).count()


def test_neardup_candidate_state_never_shuffles(spark):
    """The carried band state is the corpus-sized side of the
    incremental near-dup probe: the batch bands must broadcast, and no
    exchange keyed on (band, bh) may form on the state side — at 100 TB
    that shuffle IS the cost the carried state exists to avoid."""
    from trollflow2_spark.extensions.recipe import neardup_candidates

    state = spark.createDataFrame(
        [(1, 0, "aa"), (1, 1, "bb"), (2, 0, "aa")],
        "doc_id long, band int, bh string",
    )
    batch = spark.createDataFrame(
        [(10, 0, "aa"), (11, 2, "zz")], "doc_id long, band int, bh string"
    )
    cand = neardup_candidates(state, batch)
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert got == {(10, 1), (10, 2)}
    qe = cand._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = qe.explainString(mode)
    assert "BroadcastHashJoin" in plan
    import re

    assert not re.search(r"Exchange hashpartitioning\(band", plan), plan


def test_neardup_increment_bounds_state_text_reads(spark):
    """Jaccard confirmation touches only candidate-matched state text
    (semi-join bound), and confirmed batch docs anti-join away."""
    from trollflow2_spark.extensions.dedup import (
        _band_buckets,
        minhash_signatures,
    )
    from trollflow2_spark.extensions.recipe import neardup_increment

    state_docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "totally unrelated content here now")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),
         (11, "fresh novel text with new words")],
        "doc_id long, text string",
    )
    sb = _band_buckets(minhash_signatures(state_docs), "doc_id", 8, 4)
    bb = _band_buckets(minhash_signatures(batch), "doc_id", 8, 4)
    out = neardup_increment(batch, bb, sb, state_docs, threshold=0.5)
    assert {r["doc_id"] for r in out.collect()} == {11}


def test_streaming_state_compaction_bounds_files_and_ttl(spark, tmp_path):
    """Periodic state compaction keeps the carried near-dup state at a
    bounded file count across >= 6 micro-batches (vs one-plus-files
    per batch without it), preserves dedup behavior, and the TTL drops
    state older than the window."""
    import glob

    from trollflow2_spark.extensions.recipe import replay_recipe_batches

    base = (
        "the quick brown fox jumps over the lazy dog while the keeper "
        "watches the gate and the visitors walk slowly past the old "
        "stone wall toward the garden where the fountain splashes"
    )
    # 7 batches: batch 0 admits doc 1; every later batch carries one
    # near-dup of doc 1 (always dropped while state lives) plus one
    # novel doc (always admitted)
    themes = [
        "astronomy telescopes nebulae quasars orbiting satellites",
        "gardening tomatoes compost seedlings irrigation mulching",
        "violin concertos orchestras crescendo sonatas conductors",
        "glaciers moraines permafrost icefields crevasse altitude",
        "baking sourdough levain crumb hydration fermentation",
        "sailing spinnaker halyards regatta windward moorings",
        "ceramics porcelain glazing kilns earthenware wheelwork",
    ]
    novel = [
        f"{t} discussion of {t.split()[0]} practice session {i}"
        for i, t in enumerate(themes)
    ]
    batches = [[{"doc_id": 1, "text": base + " v0"}]] + [
        [
            {"doc_id": 10 * i, "text": base + f" v{i}"},
            {"doc_id": 10 * i + 1, "text": novel[i] + " x"},
        ]
        for i in range(1, 7)
    ]
    wd = str(tmp_path / "compact_run")
    out = replay_recipe_batches(
        spark, batches, "doc_id long, text string",
        [{"stage": "near_dedup", "threshold": 0.6}],
        work_dir=wd, compact_every=2,
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [
        1, 11, 21, 31, 41, 51, 61,
    ]
    # last compaction fired after batch 5 (index), batch 6 appended
    # once more: bounded, far below the 7-batches-of-appends shape
    for suffix in ("_nd", "_ndb"):
        n_files = len(
            glob.glob(wd + f"/state{suffix}/*.parquet")
        )
        assert 1 <= n_files <= 3, (suffix, n_files)
    # TTL run: state older than 1 batch expires at each compaction, so
    # a near-dup arriving after its ancestor's state aged out is
    # re-admitted (the documented bounded-state tradeoff)
    wd2 = str(tmp_path / "ttl_run")
    out2 = replay_recipe_batches(
        spark,
        [
            [{"doc_id": 1, "text": base + " v0"}],
            [{"doc_id": 2, "text": novel[0] + " x"}],
            [{"doc_id": 3, "text": base + " v3"}],  # ancestor expired
        ],
        "doc_id long, text string",
        [{"stage": "near_dedup", "threshold": 0.6}],
        work_dir=wd2, compact_every=1, state_ttl_batches=1,
    )
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 2, 3]


def test_streaming_state_recovery_idempotent_after_compaction(
    spark, tmp_path
):
    """The batch-tag (< batch_id) recovery read survives compaction:
    re-running the LAST batch against the compacted state yields the
    same survivors (its own appended rows are filtered by tag, the
    earlier batches' rows are present post-rewrite)."""
    from trollflow2_spark.extensions.recipe import streaming_recipe_sink

    base = (
        "the quick brown fox jumps over the lazy dog while the keeper "
        "watches the gate and the visitors walk slowly past the old "
        "stone wall toward the garden where the fountain splashes"
    )
    state = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    fn = streaming_recipe_sink(
        [{"stage": "near_dedup", "threshold": 0.6}],
        state,
        out_dir,
        compact_every=2,
    )
    b0 = spark.createDataFrame(
        [(1, base + " v0")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(2, base + " v1"), (3, "novel words about engines " * 8)],
        "doc_id long, text string",
    )
    fn(b0, 0)
    fn(b1, 1)  # compaction fires after this batch
    first = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    )
    assert first == [1, 3]
    # crash-recovery replay of batch 1: same batch_id, compacted state
    fn(b1, 1)
    again = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    )
    # the replay appended the SAME survivors (3; 2 still dropped
    # against doc 1's carried bands) — no self-invalidation
    assert again == [1, 3, 3]


def test_near_dedup_banding_params_from_recipe(spark, tmp_path):
    """num_hashes/bands come from the recipe item (the knobs
    lsh_param_plan chooses), applied consistently to the in-batch
    stage and the carried band state."""
    import glob

    from trollflow2_spark.extensions.recipe import replay_recipe_batches

    base = (
        "the quick brown fox jumps over the lazy dog while the keeper "
        "watches the gate and the visitors walk slowly past the old "
        "stone wall toward the garden where the fountain splashes"
    )
    wd = str(tmp_path / "bands_run")
    out = replay_recipe_batches(
        spark,
        [
            [{"doc_id": 1, "text": base + " v0"}],
            [{"doc_id": 2, "text": base + " v1"}],
        ],
        "doc_id long, text string",
        [{"stage": "near_dedup", "threshold": 0.6,
          "num_hashes": 16, "bands": 8}],
        work_dir=wd,
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1]
    bands = spark.read.parquet(wd + "/state_ndb")
    # 16 hashes / 8 bands -> band ids 0..7 for the single survivor
    from pyspark.sql import functions as F

    got = sorted(
        r["band"] for r in bands.where(F.col("doc_id") == 1).collect()
    )
    assert got == list(range(8))
