"""Byte-pair-encoding tokenizer induction and application (Sennrich
et al. 2016, arXiv:1508.07909) — the tokenizer-prep step of a
training-data pipeline, and the honest token-count source for packing
budgets (whitespace counts under-estimate subword sequence length).
Reference has no analog; extension per build brief.

Spark-first split of labor, the PQ-training precedent
(quantization.train_pq): the TRAINING statistic (word frequencies) is
computed exactly and distributed — one explode + one combine-friendly
groupBy + a global TakeOrderedAndProject of the top ``max_words`` —
then the merge loop runs driver-side over that bounded table (classic
BPE training is inherently sequential: merge ``i`` depends on the
vocabulary state after merge ``i−1``; real pipelines train tokenizers
on a bounded sample and apply everywhere). APPLICATION is distributed
via an Arrow-batched ``mapInPandas`` with a per-batch word memo —
word frequency follows Zipf, so the memo hit-rate is high and the
per-row cost is amortized dictionary lookups, not merge scans.

Determinism: merge selection breaks count ties on the pair
lexicographically, so two trains over the same corpus produce the
identical merge list on any engine/partitioning (the word-frequency
table is exact, not sampled)."""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr

END = "</w>"


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 20_000,
    lowercase: bool = True,
) -> DataFrame:
    """Exact corpus word frequencies, truncated to the ``max_words``
    most frequent (ties broken on the word ascending — deterministic
    training input). One explode, one combine-friendly groupBy, one
    top-k; no full sort."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    ex = df.select(F.explode(tokens_expr(t)).alias("word"))
    return (
        ex.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_words)
    )


def _merge_seq(seq: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == pair[0] and seq[i + 1] == pair[1]:
            out.append(seq[i] + seq[i + 1])
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def bpe_train(
    word_freqs: Iterable[tuple[str, int]], num_merges: int = 200
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, freq) table: start
    from characters + an end-of-word marker, repeatedly merge the
    most frequent adjacent symbol pair (count ties → lexicographically
    smallest pair). Driver-side over the bounded table — O(merges ·
    distinct words) symbol scans."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in word_freqs:
        if not word:
            continue
        key = tuple(word) + (END,)
        vocab[key] = vocab.get(key, 0) + int(freq)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            k: v
            for k, v in (
                (_merge_seq(seq, best), f) for seq, f in vocab.items()
            )
        }
    return merges


def bpe_train_from_corpus(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 20_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Distributed word counting → driver-side merge learning."""
    rows = word_frequencies(df, text_col, max_words, lowercase).collect()
    return bpe_train(((r["word"], r["freq"]) for r in rows), num_merges)


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application to one word (the
    GPT-2 style encoder loop) — the SINGLE implementation shared by
    the distributed path and any driver-side twin, so parity between
    them is structural."""
    seq: list[str] = list(word) + [END]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_tokens(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    key_col: str = "doc_id",
    lowercase: bool = True,
    counts_only: bool = False,
) -> DataFrame:
    """Distributed BPE application: Arrow-batched ``mapInPandas``
    carrying the merge ranks (a few KB, shipped in the task closure)
    and a per-batch word→tokens memo. Narrow — zero shuffle; output
    is ``(key, bpe_tokens array)`` or, with ``counts_only=True``,
    ``(key, n_bpe_tokens)`` (the packing-budget input). NULL text →
    empty/0."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # the key's real type rides through — a hardcoded `long` would
    # break Arrow serialization for string/other keys (review catch)
    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, n_bpe_tokens long"
        if counts_only
        else f"{key_col} {key_type}, bpe_tokens array<string>"
    )
    lc = lowercase

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = bpe_encode_word(word, ranks)
            return got

        for pdf in batches:
            keys, vals = [], []
            for k, text in zip(pdf[key_col], pdf[text_col]):
                words = (text.lower() if lc else text).split() if isinstance(text, str) else []
                toks: list[str] = []
                for w in words:
                    toks.extend(enc(w))
                keys.append(k)
                vals.append(len(toks) if counts_only else toks)
            col = "n_bpe_tokens" if counts_only else "bpe_tokens"
            yield pd.DataFrame({key_col: keys, col: vals})

    return df.select(key_col, text_col).mapInPandas(run, schema=out_schema)


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    key_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """``(key, n_bpe_tokens)`` — the subword packing-budget input."""
    return bpe_tokens(
        df, merges, text_col, key_col, lowercase=lowercase, counts_only=True
    )
