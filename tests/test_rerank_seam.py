"""The pluggable second-stage reranker seam: custom scorers register
by name and score ONLY the k-bounded candidate set; the candidate
plan (broadcast of nq x 2k rows to the doc-text join) is
scorer-independent."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df, spark):
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def _fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha alpha noise words"),
            (3, "unrelated text entirely here"),
        ],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 20), (1, 3, 10)],
        "query_id int, doc_id long, rrf_score int",
    )
    return docs, cand


def test_custom_scorer_registers_and_ranks(spark):
    from trollflow2_spark.extensions.rerank import (
        RERANK_SCORERS,
        candidate_text,
        register_rerank_scorer,
        rerank,
    )

    @register_rerank_scorer("_test_bylen")
    def bylen(cand_text, **_):
        return cand_text.select(
            "query_id",
            "doc_id",
            "rrf_score",
            F.length("text").cast("bigint").alias("rerank_score"),
        )

    try:
        docs, cand = _fixture(spark)
        out = rerank(candidate_text(docs, cand), scorer="_test_bylen")
        got = {
            (r["query_id"], r["doc_id"]): r["rerank_rank"]
            for r in out.collect()
        }
        # query 0: doc 2 ("alpha alpha noise words", len 23) beats
        # doc 1 (len 22); query 1 has the single doc 3
        assert got == {(0, 2): 1, (0, 1): 2, (1, 3): 1}
    finally:
        RERANK_SCORERS.pop("_test_bylen", None)


def test_unknown_scorer_fails_fast(spark):
    import pytest

    from trollflow2_spark.extensions.rerank import candidate_text, rerank

    docs, cand = _fixture(spark)
    with pytest.raises(ValueError, match="unknown rerank scorer"):
        rerank(candidate_text(docs, cand), scorer="nope")


def test_candidate_plan_is_scorer_independent(spark):
    """The broadcast candidate join must appear identically under the
    default proxy and under a custom scorer — the seam may not change
    what the corpus pays."""
    from trollflow2_spark.extensions.rerank import (
        RERANK_SCORERS,
        candidate_text,
        register_rerank_scorer,
        rerank,
    )

    docs, cand = _fixture(spark)
    ct = candidate_text(docs, cand)
    base_plan = _plan(ct, spark)
    assert "BroadcastHashJoin" in base_plan

    @register_rerank_scorer("_test_passthrough")
    def passthrough(cand_text, **_):
        return cand_text.select(
            "query_id",
            "doc_id",
            "rrf_score",
            F.lit(1).cast("bigint").alias("rerank_score"),
        )

    try:
        plan = _plan(rerank(ct, scorer="_test_passthrough"), spark)
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
    finally:
        RERANK_SCORERS.pop("_test_passthrough", None)


def test_mapinpandas_cross_encoder_slots_in(spark):
    """The production shape: an Arrow-batched 'cross-encoder' (here a
    deterministic stub) scoring the bounded candidate set via
    mapInPandas — the Python stage sits AFTER the broadcast join, so
    it sees nq x 2k rows, never the corpus."""
    from trollflow2_spark.extensions.rerank import (
        RERANK_SCORERS,
        candidate_text,
        register_rerank_scorer,
        rerank,
    )

    @register_rerank_scorer("_test_xenc")
    def xenc(cand_text, **_):
        def kernel(batches):
            for pdf in batches:
                pdf = pdf.copy()
                # stand-in for model inference over (query, doc) pairs
                pdf["rerank_score"] = [
                    int(len(t.split()) * 10) for t in pdf["text"]
                ]
                yield pdf[
                    ["query_id", "doc_id", "rrf_score", "rerank_score"]
                ]

        return cand_text.mapInPandas(
            kernel,
            "query_id int, doc_id long, rrf_score int, rerank_score bigint",
        )

    try:
        docs, cand = _fixture(spark)
        ct = candidate_text(docs, cand)
        out = rerank(ct, scorer="_test_xenc")
        plan = _plan(out, spark)
        assert "MapInPandas" in plan and "BroadcastHashJoin" in plan
        # the Python stage consumes the join output (bounded), not the
        # corpus scan: in the formatted plan the join node id is a
        # child of MapInPandas, i.e. the join appears before it in the
        # operator chain
        got = {
            (r["query_id"], r["doc_id"]): r["rerank_rank"]
            for r in out.collect()
        }
        assert got == {(0, 1): 1, (0, 2): 2, (1, 3): 1}
    finally:
        RERANK_SCORERS.pop("_test_xenc", None)


def test_partial_terms_table_keeps_candidates(spark):
    """A query_id absent from the terms table must keep its candidates
    (scored n_present = 0, rerank_score = 0) — a partial term table
    may not silently drop a whole query's candidate set."""
    from trollflow2_spark.extensions.rerank import candidate_text, rerank

    docs, cand = _fixture(spark)
    # terms only for query 0 — query 1 (doc 3) has no term rows
    terms = spark.createDataFrame(
        [(0, "alpha"), (0, "gamma")], "query_id int, term string"
    )
    out = rerank(candidate_text(docs, cand), terms=terms)
    got = {
        (r["query_id"], r["doc_id"]): (
            r["n_present"],
            r["rerank_score"],
            r["rerank_rank"],
        )
        for r in out.collect()
    }
    assert set(got) == {(0, 1), (0, 2), (1, 3)}
    # doc 1 has alpha+gamma, doc 2 only alpha
    assert got[(0, 1)][0] == 2 and got[(0, 2)][0] == 1
    assert got[(0, 1)][2] == 1 and got[(0, 2)][2] == 2
    # the term-less query survives with a zero score and rank 1
    assert got[(1, 3)] == (0, 0, 1)


def test_retrieval_metrics_known_values(spark):
    """Perfect ranking -> ndcg 1.0 / mrr 1.0 / full recall; a miss at
    rank 1 halves MRR; no-gold queries drop; zero-hit queries score
    0 everywhere."""
    from trollflow2_spark.extensions.rerank import retrieval_metrics

    ranked = spark.createDataFrame(
        # q1: gold docs (10, 11) at ranks 1, 2 -> perfect
        [(1, 10, 1), (1, 11, 2), (1, 99, 3),
         # q2: junk at rank 1, gold 20 at rank 2
         (2, 98, 1), (2, 20, 2),
         # q3: no hits at all
         (3, 97, 1), (3, 96, 2),
         # q4 has ranked rows but NO gold -> must drop
         (4, 95, 1)],
        ["query_id", "doc_id", "rank"],
    )
    gold = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1), (2, 20, 1), (3, 30, 1)],
        ["query_id", "doc_id", "grade"],
    )
    got = {r["query_id"]: r
           for r in retrieval_metrics(ranked, gold, k=10).collect()}
    assert set(got) == {1, 2, 3}
    q1 = got[1]
    assert (q1["n_gold"], q1["n_hits"], q1["recall_pm"], q1["mrr"]) == (
        2, 2, 1000, 1.0)
    assert q1["ndcg"] == 1.0  # grades 2@r1 + 1@r2 IS the ideal order
    assert got[2]["mrr"] == 0.5
    assert (got[3]["n_hits"], got[3]["mrr"], got[3]["ndcg"]) == (
        0, 0.0, 0.0)
