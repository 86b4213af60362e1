"""Round-9 vector-tier additions: incremental IVF drift audit and
embedding-space contamination."""

import numpy as np

from pyspark.sql import functions as F


def _emb_df(spark, vecs, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_ivf_drift_audit_counts_and_micro_means(spark):
    from trollflow2_spark.extensions.similarity import ivf_drift_audit

    # two fixed centroids on the axes; base sits on them, new drifts
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    base = _emb_df(spark, [[1, 0], [2, 0], [0, 3]])
    new = _emb_df(spark, [[1, 0.4], [0.3, 1]], start_id=100)
    out = {
        r["cell"]: r
        for r in ivf_drift_audit(base, new, centroids=cents).collect()
    }
    assert out[0]["n_base"] == 2 and out[0]["n_new"] == 1
    assert out[1]["n_base"] == 1 and out[1]["n_new"] == 1
    # base vectors lie exactly on their centroid: mean similarity 1.0
    assert out[0]["mean_sim_base"] == 1.0
    assert out[1]["mean_sim_base"] == 1.0
    # new members are off-axis: positive drift in both cells
    for cell in (0, 1):
        r = out[cell]
        assert r["mean_sim_new"] < 1.0
        assert r["sim_drift"] == round(
            r["mean_sim_base"] - r["mean_sim_new"], 6
        )
        assert r["growth"] == round(r["n_new"] / max(r["n_base"], 1), 6)


def test_ivf_drift_audit_empty_new_side(spark):
    from trollflow2_spark.extensions.similarity import ivf_drift_audit

    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    base = _emb_df(spark, [[1, 0]])
    new = _emb_df(spark, [], start_id=100).filter("vec_id < 0")
    rows = ivf_drift_audit(base, new, centroids=cents).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_new"] == 0
    assert r["mean_sim_new"] is None and r["sim_drift"] is None
    assert r["growth"] == 0.0


def test_semantic_contamination_flags_planted_copy(spark):
    from trollflow2_spark.extensions.contamination import (
        semantic_contamination,
    )

    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    held = _emb_df(spark, [[0.9, 0.1], [0.1, 0.9]])
    # corpus: a verbatim copy of held vec 0 (shifted id) plus an
    # unrelated same-cell vector
    corpus = _emb_df(spark, [[0.9, 0.1], [1.0, 0.6]], start_id=1000)
    out = {
        r["vec_id"]: r
        for r in semantic_contamination(
            corpus, held, cents, threshold=0.99
        ).collect()
    }
    # held 0 shares cell 0 with both corpus vecs; the verbatim copy
    # verifies at cosine 1.0
    assert out[0]["n_candidates"] == 2
    assert out[0]["n_contaminated"] == 1
    assert out[0]["max_sim"] == 1.0
    # held 1 is alone in cell 1 -> no candidates, no row
    assert 1 not in out


def test_query_fixture_plants_fifth_of_held(spark, sf_dir):
    from trollflow2_spark.queries import QUERIES

    rows = QUERIES["contamination_semantic"](spark, sf_dir).collect()
    contaminated = [r for r in rows if r["n_contaminated"] > 0]
    assert contaminated, "planted leaks must surface"
    assert all(r["max_sim"] == 1.0 for r in contaminated)
