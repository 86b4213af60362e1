"""Semantics tests for knn_label_vote and soundex blocking."""

from pyspark.sql import Row, functions as F


def test_spark_soundex_classic_vectors(spark):
    # the same classic set the SQL oracle is pinned to — if Spark's
    # JVM built-in ever diverges from American Soundex (H/W rule,
    # vowel separation), this fails before the oracle gate does
    expected = {
        "Smith": "S530", "Schmidt": "S530", "Pfister": "P236",
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Tymczak": "T522", "Honeyman": "H555", "Jackson": "J250",
        "Washington": "W252",
    }
    df = spark.createDataFrame([Row(n=n) for n in expected])
    got = {
        r.n: r.c
        for r in df.select("n", F.soundex(F.col("n")).alias("c")).collect()
    }
    assert got == expected


def test_knn_label_vote_fixture(spark):
    # 2 query vectors + 6 corpus vectors in 2D; cosine ranks are
    # unambiguous by construction
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0], label=7),   # query A
        Row(vec_id=1, embedding=[0.0, 1.0], label=9),   # query B
        Row(vec_id=10, embedding=[1.0, 0.1], label=7),
        Row(vec_id=11, embedding=[1.0, 0.2], label=7),
        Row(vec_id=12, embedding=[1.0, 0.3], label=8),
        Row(vec_id=13, embedding=[0.1, 1.0], label=9),
        Row(vec_id=14, embedding=[0.2, 1.0], label=8),
        Row(vec_id=15, embedding=[0.3, 1.0], label=8),
    ]
    emb = spark.createDataFrame(rows)
    from trollflow2_spark.extensions.similarity import brute_force_topk

    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(emb, queries, k=3)
    labels = emb.select("vec_id", "label")
    votes = (
        top.join(labels, "vec_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    key = F.struct((-F.col("v")).alias("nv"), F.col("label").alias("lb"))
    pred = {
        r.query_id: r.p
        for r in votes.groupBy("query_id")
        .agg(F.min_by("label", key).alias("p"))
        .collect()
    }
    # query A's 3 nearest: 10, 11, 12 -> labels 7,7,8 -> majority 7
    assert pred[0] == 7
    # query B's 3 nearest: 13, 14, 15 -> labels 9,8,8 -> majority 8
    assert pred[1] == 8


def test_knn_vote_tie_breaks_to_smaller_label(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0], label=5),
        Row(vec_id=10, embedding=[1.0, 0.1], label=4),
        Row(vec_id=11, embedding=[1.0, 0.2], label=2),
    ]
    emb = spark.createDataFrame(rows)
    from trollflow2_spark.extensions.similarity import brute_force_topk

    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(emb, queries, k=2)
    votes = (
        top.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    key = F.struct((-F.col("v")).alias("nv"), F.col("label").alias("lb"))
    (r,) = votes.groupBy("query_id").agg(
        F.min_by("label", key).alias("p")
    ).collect()
    assert r.p == 2  # one vote each: the smaller label wins
