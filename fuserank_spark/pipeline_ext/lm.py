"""Statistical language-model scoring for corpus curation: n-gram LM
perplexity (the CCNet-style quality signal — Wenzek et al. 2020 score
documents by LM perplexity and keep the low-perplexity head) and the
machinery it shares with importance weighting.

No neural model is involved (and none is needed for the curation
signal): the LM is hashed n-gram counts with add-alpha smoothing,
trained with one explode + one hash aggregate over the training
corpus and applied with broadcast-auto joins — every stage is linear
and expression-only (whole-stage codegen; no Python in the hot path).

Cross-engine portability (the repo's differential-gate invariants):

- grams and tokens are matched as ``portable_hash32`` values on both
  engines, so a hash collision merges counts identically everywhere
  (the decontam / boilerplate precedent);
- each per-gram log-probability is quantized to a scaled BIGINT via
  the explicit IEEE formula ``floor(ln(p)·1e9 + 0.5)`` BEFORE
  summing — integer sums are fold-order independent, so Spark's
  partial aggregation and any SQL twin's accumulation agree exactly
  (ln() is the one libm call not guaranteed bit-identical across
  engines; the quantization absorbs it, the BM25 idf precedent);
- the probability itself is a ratio of smoothed integer counts —
  exact in double up to 2^53, IEEE-division deterministic.

Reference analog: none (src/ has no corpus-quality scoring); this is
extension surface per the build brief. The driver registry is frozen
at 67 entries, so the oracle evidence is a full DuckDB re-derivation
in tests/test_lm.py (the semantic_dedup precedent).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import portable_hash32
from .retrieval import lc_tokens_expr

# above this many model rows the score-side join falls back from
# broadcast to a shuffle hash join (same policy as contaminated_keys)
BROADCAST_MODEL_LIMIT = 5_000_000


@dataclass(frozen=True)
class NgramLM:
    """A trained hashed n-gram count model.

    ``ngrams``   — (ctx_hash, tok_hash, cnt): n-gram occurrence counts;
    ``contexts`` — (ctx_hash, ctx_cnt): context marginals (the sum of
                   ``cnt`` over the context's continuations);
    ``vocab_size`` — distinct token-hash types in the training corpus
                   (the smoothing denominator counts V+1 outcomes, the
                   +1 being the merged out-of-vocabulary type);
    ``n``        — gram order (1 = unigram, 2 = bigram, ...).

    Both frames are plain DataFrames — persist them with
    ``.write.parquet`` next to the corpus and rebuild the dataclass to
    serve from a cold start (the encoder-meta persistence pattern)."""

    ngrams: DataFrame
    contexts: DataFrame
    vocab_size: int
    n: int


def _gram_hashes(toks: Column, n: int) -> Column:
    """Array of (ctx_hash, tok_hash) structs for every gram position
    1..len−n+1; fewer than n tokens → empty array (the sequence(1, m<1)
    counts-DOWN guard). For n=1 the context is the empty string — one
    shared marginal, i.e. a plain unigram model."""
    if n == 1:
        ctx = lambda i: portable_hash32(F.lit(""))  # noqa: E731
    else:
        ctx = lambda i: portable_hash32(  # noqa: E731
            F.array_join(F.slice(toks, i, n - 1), " ")
        )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.struct(
            ctx(i).alias("ctx_hash"),
            portable_hash32(F.element_at(toks, i + (n - 1))).alias("tok_hash"),
        ),
    )
    empty = F.array().cast("array<struct<ctx_hash:bigint,tok_hash:bigint>>")
    return F.when(F.size(toks) >= n, grams).otherwise(empty)


def ngram_lm_train(docs: DataFrame, *, text_col: str = "text", n: int = 2) -> NgramLM:
    """Train a hashed n-gram count LM over ``docs``.

    One explode + one hash aggregate for the gram counts (the
    decontam shuffle shape — keys are 32-bit hashes, uniform by
    construction); the context marginals are a second aggregate over
    the ALREADY-AGGREGATED gram table (tiny); the vocabulary size is
    one approx-free distinct count over the token projection. All
    three are linear scans; training is a one-time build cost.

    Tokens are lowercased whitespace tokens (``lc_tokens_expr`` — the
    BM25 convention). Grams never cross document boundaries and there
    are no BOS/EOS sentinels: a document's first n−1 tokens appear
    only as context, which keeps the semantics closed-form on both
    engines of a differential check."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = docs.select(lc_tokens_expr(F.col(text_col)).alias("__toks"))
    grams = toks.select(F.explode(_gram_hashes(F.col("__toks"), n)).alias("g"))
    ngrams = (
        grams.groupBy(F.col("g.ctx_hash").alias("ctx_hash"), F.col("g.tok_hash").alias("tok_hash"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    contexts = ngrams.groupBy("ctx_hash").agg(F.sum("cnt").alias("ctx_cnt"))
    vocab_size = (
        toks.select(F.explode("__toks").alias("t"))
        .agg(F.countDistinct(portable_hash32(F.col("t"))).alias("v"))
        .collect()[0]["v"]
    )
    return NgramLM(ngrams=ngrams, contexts=contexts, vocab_size=int(vocab_size), n=n)


def ngram_lm_perplexity(
    docs: DataFrame,
    lm: NgramLM,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    broadcast_model: bool | str = "auto",
    broadcast_row_limit: int = BROADCAST_MODEL_LIMIT,
    model_rows: int | None = None,
) -> DataFrame:
    """Score every document by add-alpha-smoothed n-gram LM
    cross-entropy / perplexity against a trained :class:`NgramLM` —
    filter on ``perplexity`` to keep the fluent head of a raw corpus
    (CCNet keeps the lowest-perplexity third).

    Per gram position: p = (cnt + α) / (ctx_cnt + α·(V+1)) with
    missing counts → 0, so an unseen context degrades to the uniform
    1/(V+1). Adds ``n_scored`` (gram positions), ``logprob`` (total
    ln-probability, nats), ``cross_entropy`` (−logprob/n_scored) and
    ``perplexity`` (e^H); documents with fewer than n tokens score
    NULL. Scores are exact integer sums of 1e-9-quantized terms (see
    module docstring), rounded to 6 at the edge.

    Scale shape: the corpus side explodes gram hashes WITHOUT
    shuffling; the model joins broadcast when it fits (auto policy
    counts ``lm.ngrams`` rows once — pass ``model_rows`` or persist
    the model to skip that pass); above the limit both joins fall
    back to shuffle hash joins keyed on uniform 32-bit hashes (a hot
    context like "the" skews the marginal join's left side — AQE
    skew-split handles it). The final per-document aggregate is
    combine-friendly."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    ngrams, contexts = lm.ngrams, lm.contexts
    if broadcast_model == "auto":
        rows = (
            model_rows
            if model_rows is not None
            else ngrams.limit(broadcast_row_limit + 1).count()
        )
        broadcast_model = rows <= broadcast_row_limit
    if broadcast_model:
        ngrams, contexts = F.broadcast(ngrams), F.broadcast(contexts)

    base = docs.withColumn("__toks", lc_tokens_expr(F.col(text_col)))
    ex = base.select(
        F.col(key_col).alias("__k"),
        F.explode(_gram_hashes(F.col("__toks"), lm.n)).alias("g"),
    ).select("__k", "g.ctx_hash", "g.tok_hash")
    denom_add = float(alpha) * (lm.vocab_size + 1)
    p = (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(float(alpha))) / (
        F.coalesce(F.col("ctx_cnt"), F.lit(0)).cast("double") + F.lit(denom_add)
    )
    term = F.floor(F.log(p) * 1e9 + F.lit(0.5)).cast("bigint")
    scored = (
        ex.join(ngrams, ["ctx_hash", "tok_hash"], "left")
        .join(contexts, ["ctx_hash"], "left")
        .groupBy("__k")
        .agg(
            F.sum(term).alias("__lp_scaled"),
            F.count(F.lit(1)).alias("__n_scored"),
        )
    )
    out = (
        docs.join(scored, docs[key_col] == scored["__k"], "left")
        .drop("__k")
        .withColumn("n_scored", F.coalesce(F.col("__n_scored"), F.lit(0)).cast("bigint"))
        .withColumn(
            "logprob",
            F.round(F.col("__lp_scaled").cast("double") / 1e9, 6),
        )
        .withColumn(
            "cross_entropy",
            F.when(
                F.col("n_scored") > 0,
                F.round(
                    -F.col("__lp_scaled").cast("double")
                    / (F.col("n_scored").cast("double") * 1e9),
                    6,
                ),
            ),
        )
        .withColumn(
            "perplexity",
            F.when(F.col("n_scored") > 0, F.round(F.exp(F.col("cross_entropy")), 6)),
        )
        .drop("__lp_scaled", "__n_scored")
    )
    return out


# ------------------------------------------------------------------ DSIR


@dataclass(frozen=True)
class DsirModel:
    """Trained DSIR importance model: per-bucket quantized
    log-probability ratios between the target and raw feature
    distributions, plus the constant ratio for buckets unseen in
    BOTH corpora (pure smoothing mass).

    ``logratios`` has at most ``n_buckets`` rows (bucket, lr_scaled)
    — always broadcastable; ``lr_scaled`` is the 1e9-scaled integer
    log ratio (fold-order-independent sums, see module docstring)."""

    logratios: DataFrame
    default_lr_scaled: int
    ns: tuple[int, ...]
    n_buckets: int


def _feature_buckets(toks: Column, ns: tuple[int, ...], n_buckets: int) -> Column:
    """Hashed n-gram feature buckets (DSIR §2: unigrams+bigrams
    hashed into 10k buckets): every gram order in ``ns``, each gram
    string portable-hashed mod ``n_buckets``."""
    from .curation import token_ngrams_expr

    parts = [
        F.transform(
            token_ngrams_expr(toks, n), lambda g: portable_hash32(g) % n_buckets
        )
        for n in ns
    ]
    return F.flatten(F.array(*parts))


def dsir_train(
    target: DataFrame,
    raw: DataFrame,
    *,
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2),
    n_buckets: int = 10_000,
    alpha: float = 1.0,
) -> DsirModel:
    """Train DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023, arXiv:2302.03169): estimate hashed
    n-gram bag-of-words distributions over the TARGET corpus (what
    you want more of) and the RAW corpus (what you are selecting
    from), add-alpha smoothed; the model is the per-bucket
    log-probability ratio.

    Two explode + hash-aggregate scans (one per corpus) whose output
    is at most ``n_buckets`` rows each, one tiny outer join, two
    1-row total collects — training cost is the two corpus scans, and
    the resulting model always broadcasts."""
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be non-empty gram orders >= 1, got {ns}")
    if len(set(ns)) != len(ns):
        raise ValueError(f"ns must be distinct, got {ns}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")

    def counts(df: DataFrame) -> DataFrame:
        toks = df.select(lc_tokens_expr(F.col(text_col)).alias("__toks"))
        return (
            toks.select(
                F.explode(_feature_buckets(F.col("__toks"), ns, n_buckets)).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    tc, rc = counts(target), counts(raw)
    t_total = int(tc.agg(F.coalesce(F.sum("c"), F.lit(0))).collect()[0][0])
    r_total = int(rc.agg(F.coalesce(F.sum("c"), F.lit(0))).collect()[0][0])
    if t_total == 0 or r_total == 0:
        raise ValueError(
            f"DSIR needs non-empty feature sets (target={t_total}, raw={r_total})"
        )
    denom_t = float(t_total) + alpha * n_buckets
    denom_r = float(r_total) + alpha * n_buckets

    def _lnq(cnt: Column, denom: float) -> Column:
        """floor(ln((cnt+α)/denom)·1e9 + 0.5) as BIGINT."""
        p = (cnt.cast("double") + F.lit(float(alpha))) / F.lit(denom)
        return F.floor(F.log(p) * 1e9 + F.lit(0.5)).cast("bigint")

    lr = (
        tc.withColumnRenamed("c", "tc")
        .join(rc.withColumnRenamed("c", "rc"), "bucket", "full_outer")
        .select(
            "bucket",
            (
                _lnq(F.coalesce(F.col("tc"), F.lit(0)), denom_t)
                - _lnq(F.coalesce(F.col("rc"), F.lit(0)), denom_r)
            ).alias("lr_scaled"),
        )
    )
    import math as _m

    default = int(
        _m.floor(_m.log(alpha / denom_t) * 1e9 + 0.5)
        - _m.floor(_m.log(alpha / denom_r) * 1e9 + 0.5)
    )
    return DsirModel(
        logratios=lr, default_lr_scaled=default, ns=tuple(ns), n_buckets=n_buckets
    )


def dsir_weights(
    docs: DataFrame,
    model: DsirModel,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents by DSIR log importance weight: the sum over
    the document's hashed n-gram feature occurrences of
    ln p_target(bucket) − ln p_raw(bucket). Adds ``n_feats`` and
    ``log_weight`` (nats, rounded to 6; NULL when the document has no
    features). High weight = looks like the target corpus.

    The corpus side explodes feature buckets without shuffling, the
    (≤ n_buckets)-row model joins broadcast, the per-document
    aggregate is an exact integer sum — one scan, one combine-
    friendly shuffle on the document key."""
    base = docs.withColumn("__toks", lc_tokens_expr(F.col(text_col)))
    ex = base.select(
        F.col(key_col).alias("__k"),
        F.explode(_feature_buckets(F.col("__toks"), model.ns, model.n_buckets)).alias(
            "bucket"
        ),
    )
    scored = (
        ex.join(F.broadcast(model.logratios), "bucket", "left")
        .groupBy("__k")
        .agg(
            F.sum(
                F.coalesce(F.col("lr_scaled"), F.lit(model.default_lr_scaled))
            ).alias("__lw_scaled"),
            F.count(F.lit(1)).alias("__n_feats"),
        )
    )
    return (
        docs.join(scored, docs[key_col] == scored["__k"], "left")
        .drop("__k")
        .withColumn("n_feats", F.coalesce(F.col("__n_feats"), F.lit(0)).cast("bigint"))
        .withColumn("log_weight", F.round(F.col("__lw_scaled").cast("double") / 1e9, 6))
        .drop("__lw_scaled", "__n_feats")
    )


def dsir_sample(
    scored: DataFrame,
    n: int,
    *,
    key_col: str = "doc_id",
    weight_col: str = "log_weight",
    salt: str = "dsir",
) -> DataFrame:
    """Select ``n`` documents by Gumbel-top-k resampling — sampling
    WITHOUT replacement with probability proportional to
    exp(weight), the DSIR selection rule — made deterministic and
    engine-portable: the Gumbel noise is derived from a salted
    portable hash of the key ((h+0.5)/2^32 is an exact open-interval
    uniform, so −ln(−ln(u)) never hits ±inf) and quantized to 9
    decimals before the sort. Re-running with the same salt returns
    the same sample on any engine; changing the salt redraws.

    Global top-n = TakeOrderedAndProject — no full sort, scales to
    any corpus (driver holds n rows). NULL weights (featureless docs)
    sort last; ties break on the key."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    u = (
        portable_hash32(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    gumbel = F.floor(-F.log(-F.log(u)) * 1e9 + F.lit(0.5)) / F.lit(1e9)
    key = (F.col(weight_col) + gumbel).alias("__gumbel_key")
    return (
        scored.withColumn("__gumbel_key", key)
        .orderBy(F.desc_nulls_last("__gumbel_key"), F.col(key_col))
        .limit(n)
        .drop("__gumbel_key")
    )
