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
