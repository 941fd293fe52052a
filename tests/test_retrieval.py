"""BM25 / hybrid RRF retrieval: pure-Python score parity, batch==single
identity, RRF manual check, contract guards, and plan posture."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.retrieval import (
    MAX_QUERY_BATCH,
    MAX_QUERY_TERMS,
    bm25_corpus_stats,
    bm25_scores,
    bm25_topk,
    bm25_topk_batch,
    build_postings,
    idf_value,
    rrf_fuse,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "cat cat cat dog"),
    (3, "a completely different document about sparks"),
    (4, ""),  # empty doc: dl=0, never matches
    (5, None),  # NULL text
    (6, "mat mat the"),
]


def py_bm25(rows, terms, k1=1.2, b=0.75):
    """Independent reference implementation (plain Python floats)."""
    toks = {i: (t or "").lower().split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for term in terms:
            df = sum(1 for v in toks.values() if term in v)
            # idf is quantized to 9 decimals in the engine via the
            # explicit floor(x*1e9+0.5)/1e9 formula (cross-libm ln
            # stability, ADVICE r3) — the spec twin does the same
            idf = math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e9 + 0.5) / 1e9
            tf = float(tk.count(term))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(tk) / avgdl))
        out[i] = s
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_bm25_matches_pure_python(docs):
    terms = ["cat", "mat", "sparks"]
    want = py_bm25(DOCS, terms)
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, terms).select("doc_id", "bm25").collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12), f"doc {i}"


def test_bm25_topk_excludes_zero_scores(docs):
    hits = bm25_topk(docs, ["cat"], k=10).collect()
    ids = [r["doc_id"] for r in hits]
    assert ids == [2, 0]  # tf=3 beats tf=1; non-matching docs absent
    assert [r["rnk"] for r in hits] == [1, 2]


def test_bm25_stats_reuse_identical(docs):
    terms = ["cat", "dog"]
    stats = bm25_corpus_stats(docs, terms)
    a = bm25_topk(docs, terms, k=5).collect()
    b = bm25_topk(docs, terms, k=5, stats=stats).collect()
    assert a == b


def test_bm25_batch_matches_single(docs):
    queries = [(10, ["cat", "mat"]), (11, ["dog"]), (12, ["sparks", "the"])]
    batch = bm25_topk_batch(docs, queries, k=5)
    rows = {
        (r["query_id"], r["doc_id"]): (r["rnk"], r["bm25"])
        for r in batch.collect()
    }
    for qid, terms in queries:
        single = bm25_topk(docs, terms, k=5).collect()
        for r in single:
            assert rows[(qid, r["doc_id"])] == (r["rnk"], r["bm25"]), (qid, r)
        assert len([k for k in rows if k[0] == qid]) == len(single)


def test_bm25_batch_postings_reuse(docs):
    queries = [(0, ["cat"]), (1, ["mat", "dog"])]
    p = build_postings(docs).persist()
    try:
        a = sorted(map(tuple, bm25_topk_batch(docs, queries, k=5).collect()))
        b = sorted(
            map(tuple, bm25_topk_batch(docs, queries, k=5, postings=p).collect())
        )
        assert a == b
    finally:
        p.unpersist()


def test_idf_always_positive():
    # even a term present in EVERY doc keeps a positive weight
    assert idf_value(100, 100) > 0
    assert idf_value(1, 1) > 0


def test_term_guards(docs):
    with pytest.raises(ValueError, match="at least one term"):
        bm25_scores(docs, [])
    with pytest.raises(ValueError, match="MAX_QUERY_TERMS"):
        bm25_scores(docs, [f"t{i}" for i in range(MAX_QUERY_TERMS + 1)])
    with pytest.raises(ValueError, match="distinct"):
        bm25_scores(docs, ["cat", "cat"])


def test_batch_guards(docs):
    with pytest.raises(ValueError, match="empty query batch"):
        bm25_topk_batch(docs, [])
    with pytest.raises(ValueError, match="max_query_batch"):
        bm25_topk_batch(docs, [(0, ["cat"])], max_query_batch=0)


def test_batch_auto_chunks(docs):
    """Over-cap batches auto-chunk (r6): the chunked union equals the
    one-shot result — idf depends only on the corpus, so chunk
    composition cannot change any score."""
    queries = [(i, ["cat", "mat"] if i % 2 else ["dog"]) for i in range(7)]
    one_shot = bm25_topk_batch(docs, queries, k=3).collect()
    chunked = bm25_topk_batch(docs, queries, k=3, max_query_batch=2).collect()
    assert sorted(map(tuple, chunked)) == sorted(map(tuple, one_shot))


def test_stats_term_set_mismatch_raises(docs):
    stats = bm25_corpus_stats(docs, ["cat", "mat"])
    with pytest.raises(ValueError, match="different term set"):
        bm25_scores(docs, ["cat", "dog"], stats=stats)
    # same set, different order: fine
    assert bm25_scores(docs, ["mat", "cat"], stats=stats).count() == len(DOCS)


def test_batch_duplicate_query_id_raises(docs):
    with pytest.raises(ValueError, match="duplicate query_id"):
        bm25_topk_batch(docs, [(0, ["cat"]), (0, ["dog"])])


def test_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty corpus"):
        bm25_corpus_stats(empty, ["cat"])


def test_rrf_manual(spark):
    # list A ranks docs 1,2,3; list B ranks 2,3,4 — doc 2 wins
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rnk"])
    b = spark.createDataFrame([(2, 1), (3, 2), (4, 3)], ["doc_id", "rnk"])
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k_rrf=60, k=10).collect()}
    want = {
        1: 1 / 61,
        2: 1 / 62 + 1 / 61,
        3: 1 / 63 + 1 / 62,
        4: 1 / 63,
    }
    assert set(out) == set(want)
    for d, s in want.items():
        assert out[d]["rrf"] == pytest.approx(round(s, 6), abs=1e-9)
    assert out[2]["rnk"] == 1 and out[2]["n_lists"] == 2
    assert out[4]["n_lists"] == 1


def test_rrf_requires_two_lists(spark):
    a = spark.createDataFrame([(1, 1)], ["doc_id", "rnk"])
    with pytest.raises(ValueError, match="at least two"):
        rrf_fuse([a])


def test_rrf_truncates_to_k(spark):
    a = spark.createDataFrame([(i, i + 1) for i in range(20)], ["doc_id", "rnk"])
    b = spark.createDataFrame([(i, i + 1) for i in range(20)], ["doc_id", "rnk"])
    out = rrf_fuse([a, b], k=5).collect()
    assert len(out) == 5
    assert [r["rnk"] for r in sorted(out, key=lambda r: r["rnk"])] == [1, 2, 3, 4, 5]


def test_bm25_topk_plan_is_take_ordered(docs):
    """Single-query top-k must compile to TakeOrderedAndProject (local
    heaps + driver merge), never a global sort of the scored corpus."""
    scored = bm25_scores(docs, ["cat"]).select("doc_id", "bm25")
    plan = (
        scored.filter(F.col("bm25") > 0.0)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bm25_batch_plan_no_cartesian_and_broadcast(docs):
    queries = [(0, ["cat"]), (1, ["dog"])]
    df = bm25_topk_batch(docs, queries, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the weight-table join must actually broadcast — a SortMergeJoin
    # here would shuffle the full postings table per batch
    assert "BroadcastHashJoin" in plan


def test_batch_dup_across_chunks_raises(docs):
    """Duplicate query_ids split across auto-chunks must still raise —
    the dup check runs over the FULL batch before chunking."""
    with pytest.raises(ValueError, match="duplicate query_id"):
        bm25_topk_batch(
            docs, [(1, ["cat"]), (2, ["dog"]), (1, ["mat"])], max_query_batch=2
        )


def test_tfidf_top_terms_matches_duckdb(spark, duck):
    """TF-IDF top-k per doc re-derived in DuckDB: same smoothed idf,
    same round-before-rank discipline, same (tfidf desc, term asc)
    tie-break. Frozen registry — the oracle lives here."""
    from fuserank_spark.pipeline_ext.retrieval import tfidf_top_terms
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 120
    ).select("doc_id", "text")
    got = [
        tuple(r)
        for r in tfidf_top_terms(docs, k=5, min_df=2)
        .orderBy("doc_id", "term_rank")
        .collect()
    ]
    n = docs.count()
    want = [
        tuple(r)
        for r in duck.execute(
            rf"""
            WITH ex AS (
              SELECT doc_id, unnest(
                CASE WHEN text IS NULL OR trim(lower(text)) = ''
                     THEN CAST([] AS VARCHAR[])
                     ELSE regexp_split_to_array(trim(lower(text)), '\s+') END
              ) AS term
              FROM documents WHERE doc_id < 120
            ), tf AS (
              SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term
            ), dfl AS (
              SELECT term, count(*) AS df FROM tf GROUP BY term HAVING count(*) >= 2
            ), sc AS (
              SELECT tf.doc_id, tf.term, tf.tf, dfl.df,
                     round(tf.tf * (ln(CAST({n} + 1 AS DOUBLE) / (dfl.df + 1)) + 1.0), 6) AS tfidf
              FROM tf JOIN dfl USING (term)
            ), rk AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term) AS term_rank
              FROM sc
            )
            SELECT doc_id, term, tf, df, tfidf, term_rank
            FROM rk WHERE term_rank <= 5 ORDER BY doc_id, term_rank
            """
        ).fetchall()
    ]
    assert got == want
    assert len(got) > 0
