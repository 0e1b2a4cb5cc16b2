"""Model-based quality filtering (the GPT-3 / PaLM recipe, Brown et al.
2020 Appendix A): train a linear classifier to score documents against a
high-quality reference class, then keep documents stochastically by
``score > 1 - X, X ~ Pareto(alpha)`` so the tail of lower-scored
documents still enters the corpus at a controlled rate.

Spark-first: the classifier is MLlib's LogisticRegression over hashed
token counts (RegexTokenizer -> HashingTF), i.e. the fastText-style
linear model the published pipelines use — training is a handful of
treeAggregate passes, scoring is one whole-corpus map, both fully
distributed.  The Pareto keep rule replaces np.random with the repo's
deterministic md5 unit draw (operators/mixing.sample_unit), so the kept
set is a pure function of (doc_id, salt, alpha) — reproducible across
runs, partitionings, and cluster sizes, and replayable by an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from freemap_tiler_spark.operators.mixing import sample_unit

_N_FEATURES = 1 << 18


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    reg: float = 1e-3,
):
    """PipelineModel scoring P(text is reference-class).  ``positive`` =
    the high-quality reference sample (GPT-3 used WebText/Wikipedia/
    books), ``negative`` = raw crawl sample.  Hashed bag-of-words +
    logistic regression — the published linear-classifier recipe."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    labeled = (
        positive.select(F.col(text_col).alias("text"), F.lit(1.0).alias("label"))
        .unionByName(
            negative.select(F.col(text_col).alias("text"),
                            F.lit(0.0).alias("label"))
        )
    )
    pipe = Pipeline(stages=[
        RegexTokenizer(inputCol="text", outputCol="_toks",
                       pattern="[^a-zA-Z0-9]+"),
        HashingTF(inputCol="_toks", outputCol="_feat",
                  numFeatures=_N_FEATURES),
        LogisticRegression(featuresCol="_feat", labelCol="label",
                           regParam=reg, maxIter=50),
    ])
    return pipe.fit(labeled)


def score_quality(
    corpus: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, quality_score) — P(reference-class | text), one map pass."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        corpus.select(id_col, F.col(text_col).alias("text"))
    )
    return scored.select(
        id_col,
        vector_to_array("probability")[1].alias("quality_score"),
    )


def pareto_filter(
    scored: DataFrame,
    alpha: float = 9.0,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
    salt: str = "pareto",
) -> DataFrame:
    """GPT-3's keep rule: keep iff ``X > 1 - score`` with
    X ~ Pareto(alpha) (Lomax: X = u^(-1/alpha) - 1).  High scores keep
    with certainty once score >= 1; low scores survive with probability
    (2 - score)^-alpha — the documented long-tail admission.  The draw
    is the deterministic md5 unit variate, not an RNG."""
    x = F.pow(F.lit(1.0) - sample_unit(id_col, salt), F.lit(-1.0 / alpha)) \
        - F.lit(1.0)
    return scored.where(x > F.lit(1.0) - F.col(score_col))


def quality_filter(
    corpus: DataFrame,
    model,
    alpha: float = 9.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """corpus -> kept corpus rows (score + Pareto rule, one semi-join)."""
    kept = pareto_filter(
        score_quality(corpus, model, text_col, id_col), alpha, id_col
    ).select(id_col)
    return corpus.join(kept, id_col, "left_semi")
