"""Trained quality classifier — the GPT-3 / CCNet corpus-filter
design: a cheap linear model over hashed bag-of-token features,
trained on a high-quality positive corpus vs a raw/noisy negative
corpus, then scored over the full crawl (Brown et al. 2020 App. A;
Wenzek et al. 2020). Complements the heuristic ``quality_features`` /
``gopher_features`` rules with a LEARNED filter; reference has no
analog, extension per build brief.

Spark-first: features via Tokenizer → HashingTF (JVM-side murmur
hashing — these values are never oracle-checked, so the portable-hash
invariant does not bind them; CLAUDE.md corollary), training via
``ml.classification.LogisticRegression`` (distributed L-BFGS — the
fit scales with executors, no driver-side matrix), scoring via the
fitted PipelineModel (narrow transforms only, no shuffle). The
Pareto keep-gate is a pure Column expression with a hash-derived
deterministic uniform (the dsir_sample precedent), so the filtered
corpus is bit-reproducible across runs and engines given the scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import portable_hash32

_TEXT = "__qc_text"


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
    elastic_net: float = 0.0,
):
    """Fit tokenize → hashed-BOW → logistic regression on
    positive-vs-negative corpora; returns the ``PipelineModel``
    (save/load-able next to a persisted corpus — the encoder-meta
    restart contract applies). Both inputs only need ``text_col``;
    NULL/empty texts are dropped from training (they carry no
    features and would only bias the intercept)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Tokenizer

    def prep(df: DataFrame, label: float) -> DataFrame:
        return (
            df.select(F.col(text_col).alias(_TEXT))
            .filter(F.col(_TEXT).isNotNull() & (F.trim(F.col(_TEXT)) != ""))
            .withColumn("label", F.lit(label))
        )

    train = prep(positive, 1.0).unionByName(prep(negative, 0.0))
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=_TEXT, outputCol="__qc_toks"),
            HashingTF(
                inputCol="__qc_toks", outputCol="features", numFeatures=n_features
            ),
            LogisticRegression(
                featuresCol="features",
                labelCol="label",
                maxIter=max_iter,
                regParam=reg_param,
                elasticNetParam=elastic_net,
            ),
        ]
    )
    return pipe.fit(train)


def quality_scores(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """P(high-quality) per row from a fitted classifier — narrow
    transforms only (tokenize, hash, dot product), no shuffle; NULL
    text scores NULL (the model never saw empty feature vectors)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        df.withColumn(_TEXT, F.coalesce(F.col(text_col), F.lit("")))
    )
    prob = F.round(vector_to_array(F.col("probability")).getItem(1), 9)
    return scored.withColumn(
        out_col,
        F.when(
            F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""),
            F.lit(None).cast("double"),
        ).otherwise(prob),
    ).drop(_TEXT, "__qc_toks", "features", "rawPrediction", "probability", "prediction")


def pareto_uniform(key: Column) -> Column:
    """Deterministic per-key uniform in (0, 1]: (h+1)/2^32 over the
    portable 32-bit hash — reproducible on any engine, no RNG state."""
    return (portable_hash32(key.cast("string")) + F.lit(1.0)) / F.lit(float(1 << 32))


def pareto_quality_filter(
    df: DataFrame,
    score_col: str = "quality_score",
    key_col: str = "doc_id",
    alpha: float = 9.0,
) -> DataFrame:
    """The GPT-3 stochastic acceptance rule (Brown et al. 2020
    App. A): keep a document iff ``1 − score < draw`` with
    ``draw ~ Pareto(α)`` — low-scoring docs still survive with small
    probability, so the filtered corpus keeps tail diversity instead
    of a hard cliff. The draw is the Lomax inverse-CDF
    ``u^(−1/α) − 1`` of a hash-derived deterministic uniform: the
    keep set is a pure expression, bit-reproducible given the scores
    (dsir_sample precedent). Rows with NULL score are dropped (they
    had no scoreable text). Zero shuffle."""
    draw = F.pow(pareto_uniform(F.col(key_col)), F.lit(-1.0 / float(alpha))) - F.lit(1.0)
    return df.filter(
        F.col(score_col).isNotNull() & (F.lit(1.0) - F.col(score_col) < draw)
    )
