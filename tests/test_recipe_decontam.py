"""Decontaminate recipe stage: held-set removal, the distinct-hit
floor, and passthrough of extra columns."""

from trollflow2_spark.extensions.recipe import run_recipe


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


def test_decontaminate_drops_held_and_leaky_train(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        # doc_id % 7 == 3 -> held (eval) docs
        (3, f"{shared} iota kappa", "h"),
        (10, "totally different held content here entirely", "h"),
        # train doc quoting the held 8-gram wholesale -> must drop
        (1, f"prefix words {shared} suffix words", "t"),
        # train doc with no held overlap -> survives
        (2, "unrelated training document about other things", "t"),
    ]
    out = run_recipe(
        _docs(spark, rows),
        [{"stage": "decontaminate", "min_hits": 1}],
    ).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {2}
    # extra columns pass through
    assert out[0]["src"] == "t"


def test_decontaminate_min_hits_floor(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (3, f"{shared} iota kappa", "h"),
        # one shared 8-shingle only (the shingle window never spans the
        # replaced middle) -> below a min_hits=3 floor, survives
        (1, f"{shared} unrelated tail words here now", "t"),
    ]
    out = run_recipe(
        _docs(spark, rows),
        [{"stage": "decontaminate", "min_hits": 30}],
    ).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_decontaminate_unknown_param_fails_fast(spark):
    import pytest

    with pytest.raises(TypeError):
        run_recipe(
            _docs(spark, [(1, "x", "t")]),
            [{"stage": "decontaminate", "bogus": 1}],
        ).collect()


def test_decontaminate_static_held_path(spark, tmp_path):
    """held_path loads the eval set as static state: held ids never
    appear in the output, train docs sharing >= min_hits shingles with
    the FILE's held docs drop even when the leaky doc and the held doc
    would land in different micro-batches (the property the id-derived
    form cannot give a stream)."""
    from trollflow2_spark.extensions.recipe import replay_recipe_batches

    held_text = ("the quick brown fox jumps over the lazy dog near the "
                 "old stone wall beside the quiet garden fountain")
    clean = ("a totally different document about spark adaptive query "
             "execution replanning stages from runtime statistics")
    held_dir = str(tmp_path / "held")
    spark.createDataFrame(
        [(100, held_text)], "doc_id long, text string"
    ).write.parquet(held_dir)
    batches = [
        [{"doc_id": 1, "text": clean + " v1"}],
        # leaks against the STATIC held file, not anything in-batch
        [{"doc_id": 2, "text": held_text + " trailing words"}],
        [{"doc_id": 3, "text": clean + " v3"}],
    ]
    out = replay_recipe_batches(
        spark, batches, "doc_id long, text string",
        [{"stage": "decontaminate", "min_hits": 1, "shingle_words": 8,
          "held_path": held_dir}],
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
