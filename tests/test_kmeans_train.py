"""Distributed full-corpus Lloyd training: the Spark aggregation loop
must equal a sequential reference model under the shared determinism
rules (micro-unit quantization, exact bigint distances, lowest-cell
ties, re-rounded means, empty-cell carry)."""

from __future__ import annotations

import numpy as np


def _round_half_away(x):
    # Spark/DuckDB round(): half away from zero (np.round is half-even)
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype("int64")


def _model(X, k, iters):
    """Sequential reference with the operator's exact arithmetic."""
    Xq = _round_half_away(np.asarray(X, dtype="float64") * 1_000_000.0)
    cents = Xq[:k].copy()
    for _ in range(iters):
        d = ((Xq[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)  # argmin takes the first (lowest) index
        for j in range(k):
            m = Xq[cell == j]
            if len(m):
                cents[j] = _round_half_away(m.mean(axis=0))
    d = ((Xq[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d.min(axis=1)


def test_matches_sequential_model(spark):
    from trollflow2_spark.extensions.similarity import (
        kmeans_train_distributed,
    )

    rng = np.random.default_rng(11)
    X = np.concatenate(
        [rng.normal(c, 0.05, size=(20, 6)) for c in (-0.4, 0.0, 0.4)]
    )
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # the operator quantizes from float32 storage — match it
    cell_m, dist_m = _model(X.astype("float32").astype("float64"), 3, 2)
    got = {
        r["vec_id"]: (r["cell"], r["dist_q"])
        for r in kmeans_train_distributed(df, k=3, iters=2).collect()
    }
    for i in range(len(X)):
        assert got[i] == (int(cell_m[i]), int(dist_m[i])), i


def test_empty_cell_keeps_previous_centroid(spark):
    from trollflow2_spark.extensions.similarity import (
        kmeans_train_distributed,
    )

    # vectors 0 and 1 init the two cells, but EVERYTHING sits on top
    # of vector 0 — cell 1 goes empty on iteration 1 and must carry
    # its init centroid instead of crashing or zeroing
    rows = [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.01, 0.01]),
            (3, [0.02, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["cell"]
        for r in kmeans_train_distributed(df, k=2, iters=2).collect()
    }
    # vec 1 is still closest to the carried (1,1) centroid
    assert out[1] == 1
    assert out[0] == 0 and out[2] == 0 and out[3] == 0


def test_sparse_ids_and_oversized_k(spark):
    """Init takes the k LOWEST ids (ids need not be dense 0..k-1);
    k larger than the corpus degrades to k = n."""
    from trollflow2_spark.extensions.similarity import (
        kmeans_train_distributed,
    )

    df = spark.createDataFrame(
        [(100, [0.0, 0.0]), (200, [1.0, 1.0]), (300, [0.9, 1.1])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["cell"]
        for r in kmeans_train_distributed(df, k=2, iters=2).collect()
    }
    assert out == {100: 0, 200: 1, 300: 1}
    assert len(kmeans_train_distributed(df, k=10, iters=1).collect()) == 3


def test_single_vector_corpus_and_k1(spark):
    """k = 1 (and a 1-vector corpus degrading to k = n = 1) must not
    build a WHEN-less CASE: everything lands in cell 0."""
    from trollflow2_spark.extensions.similarity import (
        kmeans_train_distributed,
    )

    one = spark.createDataFrame(
        [(7, [0.25, -0.5])], "vec_id long, embedding array<float>"
    )
    assert [
        (r["vec_id"], r["cell"], r["dist_q"])
        for r in kmeans_train_distributed(one, k=3, iters=2).collect()
    ] == [(7, 0, 0)]
    many = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [2.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["cell"]
        for r in kmeans_train_distributed(many, k=1, iters=2).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0}


def test_training_never_touches_parent_session_conf(spark, monkeypatch):
    """The interpreted-mode toggle is scoped to a child session: the
    caller's SparkSession keeps whole-stage codegen for the entire
    training loop (concurrent queries are never silently switched)."""
    from pyspark.sql.conf import RuntimeConfig

    from trollflow2_spark.extensions.similarity import (
        kmeans_train_distributed,
    )

    parent_conf_id = id(spark.conf)
    assert spark.conf.get("spark.sql.codegen.wholeStage", "true") == "true"
    calls = []
    real_set = RuntimeConfig.set

    def spy(self, key, value):
        calls.append((id(self), key))
        return real_set(self, key, value)

    monkeypatch.setattr(RuntimeConfig, "set", spy)
    df = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    assert kmeans_train_distributed(df, k=2, iters=2).count() == 8
    # some conf object set the codegen key (the child's) but NEVER the
    # parent session's conf — not before, during, or after iterations
    assert all(
        key != "spark.sql.codegen.wholeStage" or cid != parent_conf_id
        for cid, key in calls
    )
    assert spark.conf.get("spark.sql.codegen.wholeStage", "true") == "true"
