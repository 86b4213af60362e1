"""Distributed text classification: multinomial Naive Bayes.

The workhorse cheap classifier of corpus pipelines (language ID,
source/domain routing, quality tiering): training is NOTHING BUT
aggregations — per-class token counts, class totals, priors — so unlike
iterative learners both training AND scoring are exactly replayable in
SQL, which makes the whole train→score round-trip oracle-checkable
(the same property the k-means/IVF and BPE tiers exploit: deterministic
fit, literal-free replay).

100 TB shape:
- training: one explode + one (label, token) hash agg (map-side
  combined — shuffle volume is vocab × classes, not corpus-sized);
  class totals and priors are label-sized aggs.
- model: the (label, token, count) table is model-sized (vocab ×
  classes) and BROADCASTS to scoring; production caps the vocab like
  the unigram LM's top-k when vocabularies explode — same join shape.
- scoring: token stream × classes (a handful) map-side, left join the
  broadcast model, per-(doc,class) partial agg, then a per-doc argmax
  window (dense partitions — one row per class).

Determinism: per-token log-likelihoods are identical double
expressions on both engines; per-class sums are rounded to 6 before
the argmax and ties break on the class name, so the winner is stable
under any partitioning (the `unigram_logprob` convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from trollflow2_spark.functions.hashing import tokens


def nb_train_score(
    train: DataFrame,
    score: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Fit multinomial NB (add-``alpha`` smoothing) on ``train``,
    classify ``score``. Output per scored doc:
    (id, label, pred_label, score, n_tokens, correct) — ``label`` is
    the true class (for accuracy audits), ``score`` the winning
    class's rounded joint log-likelihood."""
    def tok(df: DataFrame, *extra):
        return df.select(
            *extra, F.explode(tokens(F.col(text_col))).alias("tk")
        ).select(*extra, F.lower(F.col("tk")).alias("token"))

    tok_t = tok(train, F.col(label_col))
    ctc = tok_t.groupBy(label_col, "token").agg(F.count(F.lit(1)).alias("c"))
    totals = ctc.groupBy(label_col).agg(
        F.sum("c").cast("double").alias("total_c")
    )
    nd = train.groupBy(label_col).agg(F.count(F.lit(1)).alias("ndc"))
    n_all = train.agg(F.count(F.lit(1)).cast("double").alias("n"))
    vstat = ctc.agg(F.countDistinct("token").cast("double").alias("v"))
    classes = (
        nd.join(totals, label_col)
        .crossJoin(F.broadcast(n_all))
        .select(
            label_col,
            F.log(F.col("ndc") / F.col("n")).alias("prior"),
            "total_c",
        )
    )
    a = float(alpha)
    tok_s = tok(score, F.col(id_col))
    scored = (
        tok_s.crossJoin(F.broadcast(classes))
        .join(F.broadcast(ctc), [label_col, "token"], "left")
        .crossJoin(F.broadcast(vstat))
        .withColumn(
            "logp",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(a))
                / (F.col("total_c") + F.lit(a) * (F.col("v") + 1))
            ),
        )
    )
    per = scored.groupBy(id_col, label_col).agg(
        F.round(F.first("prior") + F.sum("logp"), round_digits).alias(
            "score"
        ),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col(label_col).asc()
    )
    win = (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            id_col,
            F.col(label_col).alias("pred_" + label_col),
            "score",
            "n_tokens",
        )
    )
    truth = score.select(id_col, label_col)
    return win.join(truth, id_col).select(
        id_col,
        label_col,
        "pred_" + label_col,
        "score",
        "n_tokens",
        F.when(F.col("pred_" + label_col) == F.col(label_col), 1)
        .otherwise(0)
        .alias("correct"),
    )
