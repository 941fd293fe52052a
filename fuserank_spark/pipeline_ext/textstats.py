"""Text-analysis operators: token counting, quality scoring,
language-ID heuristic, document fingerprinting — all pure Column
expressions (JVM-side, whole-stage codegen; no Python in the hot
path)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import portable_hash32

# tiny fixed stopword sets for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "de", "et", "un", "est", "que"],
}


def tokens_expr(text_col: Column) -> Column:
    """Whitespace tokens; empty/NULL text → empty array (a bare
    split('') yields [''] and size(NULL) is −1 — both wrong
    denominators for the ratio features)."""
    return F.when(
        text_col.isNull() | (F.trim(text_col) == ""), F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text_col), r"\s+"))


def token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count (BPE-ish subword estimate would divide
    chars by ~4; both are closed-form expressions)."""
    return df.withColumn(out_col, F.size(tokens_expr(F.col(text_col))).cast("bigint"))


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token stats, punctuation /
    digit / stopword ratios, plus a composite [0,1] score (heuristics
    in the spirit of C4/Gopher filtering rules)."""
    t = F.col(text_col)
    toks = tokens_expr(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    sw = [w for ws in STOPWORDS.values() for w in ws]
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(sw)))
    avg_tok_len = _ratio(n_chars - (n_tokens - 1), n_tokens)
    punct_ratio = _ratio(n_punct, n_chars)
    digit_ratio = _ratio(n_digit, n_chars)
    stop_ratio = _ratio(n_stop, n_tokens)
    score = (
        F.lit(1.0)
        - F.least(F.lit(1.0), punct_ratio * 4.0) * 0.25
        - F.least(F.lit(1.0), digit_ratio * 4.0) * 0.25
        - F.when((avg_tok_len < 2.0) | (avg_tok_len > 12.0), 0.25).otherwise(0.0)
        - F.when(n_tokens < 5, 0.25).otherwise(0.0)
    )
    return df.withColumns(
        {
            "n_tokens": n_tokens.cast("bigint"),
            "punct_ratio": F.round(punct_ratio, 6),
            "digit_ratio": F.round(digit_ratio, 6),
            "stop_ratio": F.round(stop_ratio, 6),
            "quality_score": F.round(score, 6),
        }
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language-ID heuristic: per-language stopword
    hit ratio; predicted = argmax with deterministic tie-break on
    language code order."""
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    cols = {}
    for lang, words in STOPWORDS.items():
        hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(words)))
        cols[f"score_{lang}"] = F.round(_ratio(hits, n), 6)
    df = df.withColumns(cols)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{la}") for la in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{la}") == best, F.lit(la)) for la in langs]
    )
    return df.withColumn("pred_lang", pred)


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Document fingerprint: 32-bit portable hash of the
    whitespace-normalized lowercased text (rolling-hash equivalent
    for whole-document identity)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, portable_hash32(norm))


# --------------------------------------------------- Gopher quality rules

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_features(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1 —
    public filtering heuristics used by most LLM corpus pipelines):
    token-count bounds, mean word length band, symbol-to-word ratio
    ('#' and '...'), alphabetic-word fraction, and stopword presence.
    Emits the metric columns, one boolean per rule, and the composite
    ``gopher_pass``. Pure expressions — the token array is
    materialized ONCE (Catalyst does not CSE the split across the
    five consumers, CLAUDE.md trap) and dropped."""
    t = F.col(text_col)
    df = df.withColumn("__gt", tokens_expr(t))
    toks = F.col("__gt")
    n_tokens = F.size(toks).cast("bigint")
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    mean_wl = _ratio(tok_chars, n_tokens)
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellip = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), F.lit(0)))
    sym_ratio = _ratio(n_hash + n_ellip, n_tokens)
    alpha_frac = _ratio(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))), n_tokens
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    ).cast("bigint")
    rules = {
        "pass_n_tokens": (n_tokens >= min_tokens) & (n_tokens <= max_tokens),
        "pass_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "pass_symbol_ratio": sym_ratio <= max_symbol_ratio,
        "pass_alpha_words": alpha_frac >= min_alpha_word_frac,
        "pass_stopwords": stop_hits >= min_stopword_hits,
    }
    out = {
        "n_tokens": n_tokens,
        "mean_word_len": F.round(mean_wl, 6),
        "symbol_ratio": F.round(sym_ratio, 6),
        "alpha_word_frac": F.round(alpha_frac, 6),
        "stopword_hits": stop_hits,
        **rules,
    }
    allpass = None
    for c in rules.values():
        allpass = c if allpass is None else (allpass & c)
    out["gopher_pass"] = allpass
    return df.withColumns(out).drop("__gt")


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 50_000,
    key_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary induction (the tokenizer-prep pass): the ``top_v``
    whitespace tokens by total frequency, with total count ``tf``,
    document frequency ``doc_freq`` and 1-based ``rank``. Ties break
    on the token string ascending — fully deterministic, so two
    engines derive the identical vocabulary (differential-checked in
    tests/test_vocab.py; the registry is frozen).

    Plan shape: one narrow explode of (token, key), one
    combine-friendly groupBy token (count + two-phase distinct-key
    count; token keys are near-uniform — the heavy head is exactly
    what partial aggregation absorbs), then a global
    TakeOrderedAndProject of ``top_v`` rows — no full sort
    materializes at 100 TB."""
    ex = (
        df.withColumn("__toks", tokens_expr(F.col(text_col)))
        .select(F.col(key_col).alias("__k"), F.explode("__toks").alias("token"))
    )
    counts = ex.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("__k").alias("doc_freq"),
    )
    from pyspark.sql import Window

    top = counts.orderBy(F.col("tf").desc(), F.col("token")).limit(top_v)
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("tf").desc(), F.col("token"))
        ).cast("bigint"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against an induced
    vocabulary: token count, OOV token count (WITH multiplicity —
    the quantity a tokenizer's <unk> rate measures), and
    ``oov_frac`` (two exact BIGINTs IEEE-divided; 0.0 for empty
    docs; NULL text → 0 tokens). The pre-training check that a
    vocabulary actually covers the corpus it will tokenize.

    Plan shape: the vocab side is ≤ top_v rows and is broadcast
    explicitly, so the corpus side never shuffles for the join; the
    per-key groupBy is the only corpus-sized shuffle (combine-
    friendly counts); keys with no tokens re-attach via a narrow
    left join against one row per doc."""
    base = df.withColumn("__toks", tokens_expr(F.col(text_col))).select(
        F.col(key_col), F.size("__toks").cast("bigint").alias("n_tokens"), "__toks"
    )
    hits = (
        base.select(key_col, F.explode("__toks").alias("token"))
        .join(F.broadcast(vocab.select("token").distinct()), "token", "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__n_in"))
    )
    return (
        base.drop("__toks")
        .join(hits, key_col, "left")
        .select(
            key_col,
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("__n_in"), F.lit(0)))
            .cast("bigint")
            .alias("n_oov"),
            F.when(
                F.col("n_tokens") > 0,
                (F.col("n_tokens") - F.coalesce(F.col("__n_in"), F.lit(0)))
                / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("oov_frac"),
        )
    )


def split_sentences(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Sentence segmentation: one row per sentence with its 0-based
    index — the preprocessing granularity between documents and token
    chunks (sentence-aware packing, per-sentence embedding, PII
    review queues). Terminator-run boundaries ([.!?]+ followed by
    whitespace); the terminators STAY on their sentence, trailing
    text without a terminator is a sentence, and NULL/empty docs emit
    no rows.

    Engine-parity note: the natural lookbehind split
    ``(?<=[.!?])\\s+`` is Java-only — RE2 (DuckDB) has no lookaround,
    so the boundary is materialized instead: a capture-group
    replacement plants a sentinel after each terminator run
    (``([.!?]+)\\s+`` → ``$1<US>``) and the split is a literal on the
    sentinel — the same two ops exist verbatim in both engines
    (tests/test_textstats_sentences.py holds the DuckDB
    re-derivation; frozen registry). Pure expressions, one
    posexplode, zero shuffle."""
    marked = F.regexp_replace(F.trim(F.col(text_col)), r"([.!?]+)\s+", "$1\x1f")
    sents = F.filter(
        F.split(marked, "\x1f"), lambda s: F.trim(s) != F.lit("")
    )
    guarded = F.when(
        F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""),
        F.array().cast("array<string>"),
    ).otherwise(sents)
    return df.select(
        F.col(key_col), F.posexplode(guarded).alias("sent_idx", "sentence")
    )


def _rng(*pairs: tuple[int, int]) -> str:
    """Character-class body from (start, end) code points."""
    return "".join(f"{chr(a)}-{chr(b)}" for a, b in pairs)


SCRIPT_RANGES: dict[str, str] = {
    # Explicit code-point ranges, NOT \p{Script} classes: Java regex
    # (Spark) spells scripts \p{IsLatin} while RE2 (DuckDB) spells
    # them \p{Latin}, and the two engines ship different Unicode
    # versions — literal ranges are the only form that is guaranteed
    # char-identical in both (the split_sentences engine-parity
    # doctrine). Coverage is the core BLOCK per script (block
    # semantics: a few symbols like U+00D7 ride along — fine for
    # routing); extend ranges, not mechanisms.
    "arabic": _rng((0x0600, 0x06FF)),
    "cyrillic": _rng((0x0400, 0x04FF)),
    "devanagari": _rng((0x0900, 0x097F)),
    "greek": _rng((0x0370, 0x03FF)),
    "han": _rng((0x4E00, 0x9FFF)),
    "hangul": _rng((0xAC00, 0xD7A3)),
    "hebrew": _rng((0x0590, 0x05FF)),
    "kana": _rng((0x3040, 0x30FF)),
    "latin": "A-Za-z" + _rng((0x00C0, 0x024F)),
}


def script_profile(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-document writing-system profile: character counts and
    fractions per script block (:data:`SCRIPT_RANGES`) plus the
    ``dominant_script`` — the multilingual-corpus routing signal that
    n-gram language ID (:func:`lang_scores`) cannot give you when the
    scripts themselves differ (a Cyrillic doc scored against Latin
    trigram tables is noise; script routing is the correct first
    gate, language ID the second, within-script).

    Counts use the length-difference form ``length(s) -
    length(regexp_replace(s, '[range]', ''))`` — both engines count
    UTF-8 CHARACTERS and both apply the same literal ranges, so the
    counts are integer-identical cross-engine (test-resident DuckDB
    oracle, frozen registry). Dominance compares INTEGER counts
    (alphabetical script order breaks ties) — no float-tie domain to
    manage; ``none`` when no script character occurs at all.
    Fractions are over total characters, rounded to 6.

    Pure expressions over one projection: zero shuffle, zero UDF —
    embarrassingly parallel at any scale."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    total = F.length(t)
    counts = {
        name: total - F.length(F.regexp_replace(t, f"[{rng}]", ""))
        for name, rng in SCRIPT_RANGES.items()
    }
    mx = F.greatest(*counts.values())
    # alphabetical CASE chain: first script (by name) holding the max
    # count wins ties — deterministic and identical as a SQL CASE
    chain = F.when(mx == 0, F.lit("none"))
    for name in sorted(counts):
        chain = chain.when(counts[name] == mx, F.lit(name))
    dominant = chain.otherwise(F.lit("none"))
    cols = [F.col(key_col), total.alias("n_chars_total")]
    for name in sorted(counts):
        cols.append(counts[name].alias(f"n_{name}"))
        cols.append(
            F.round(
                F.when(total > 0, counts[name].cast("double") / total).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias(f"frac_{name}")
        )
    cols.append(dominant.alias("dominant_script"))
    return df.select(*cols)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio (compressed bytes / raw UTF-8 bytes) —
    the RedPajama-v2-style repetitiveness signal: machine-generated
    boilerplate, keyword stuffing, and template farms compress far
    below real prose (ratios ~0.1-0.3 vs ~0.4-0.7), and the signal is
    language-agnostic where word-ratio heuristics are not. Gate LOW
    ratios out (too compressible) or pair with repetition_stats.

    Arrow-batched pandas UDF (zlib has no Column-expression form) —
    narrow plan, zero shuffle, scales with the scan. NULL/empty text →
    NULL. The VALUE is a quality SIGNAL, not a join key: it depends on
    the zlib build, so it is deliberately NOT part of any cross-engine
    oracle (the driver twin in tests/test_textstats_compress.py pins
    this build's behavior; never hash-compare it across engines)."""
    import zlib

    from pyspark.sql import types as T

    if not 0 <= level <= 9:
        raise ValueError(f"zlib level must be 0..9, got {level}")

    @F.pandas_udf(T.DoubleType())
    def _ratio(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            b = x.encode("utf-8")
            if not b:
                return None
            return len(zlib.compress(b, level)) / len(b)

        return s.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))
