"""Sliding-window document chunking (packing.chunk_documents).

Not in the frozen 67-entry driver registry, so the oracle evidence
lives HERE: a full DuckDB re-derivation of the window math (integer
div chunk count, per-window token slices, overlap carry), compared
row-for-row on the documents table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.packing import chunk_documents

from .conftest import SF_SMOKE

_TOKS = (
    "CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE string_split_regex(trim(text), '\\s+') END"
)


def _oracle(max_tokens: int, overlap: int) -> str:
    stride = max_tokens - overlap
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
n AS (SELECT doc_id, tk, len(tk) AS nt,
             CASE WHEN len(tk) <= 0 THEN 0
                  WHEN len(tk) <= {max_tokens} THEN 1
                  ELSE (len(tk) - {max_tokens} + {stride - 1}) // {stride} + 1
             END AS nc
      FROM t),
w AS (SELECT doc_id, i AS chunk_idx,
             array_to_string(tk[i*{stride}+1 : least(nt, i*{stride}+{max_tokens})], ' ')
               AS text,
             least({max_tokens}, nt - i*{stride}) AS chunk_tokens
      FROM n, unnest(generate_series(0, nc - 1)) AS u(i)
      WHERE nc >= 1)
SELECT doc_id, chunk_idx, text, chunk_tokens FROM w ORDER BY doc_id, chunk_idx
"""


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    d.cache().count()
    return d


def _got(out):
    return {
        (r["doc_id"], r["chunk_idx"]): (r["text"], r["chunk_tokens"])
        for r in out.collect()
    }


@pytest.mark.parametrize("max_tokens,overlap", [(16, 4), (16, 0), (40, 39)])
def test_chunking_matches_duckdb_rederivation(docs, duck, max_tokens, overlap):
    got = _got(
        chunk_documents(docs, max_tokens=max_tokens, overlap=overlap).select(
            "doc_id", "chunk_idx", "text", "chunk_tokens"
        )
    )
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in duck.execute(_oracle(max_tokens, overlap)).fetchall()
    }
    assert got == want
    assert len(got) > docs.count()  # chunking actually fired


def test_chunking_window_invariants(docs):
    """Coverage and overlap invariants: windows tile the token stream
    with exactly `overlap` shared tokens between neighbours, every
    token is covered, and no tail window is contained in its
    predecessor."""
    max_tokens, overlap = 16, 4
    stride = max_tokens - overlap
    out = chunk_documents(docs, max_tokens=max_tokens, overlap=overlap)
    rows = out.select("doc_id", "chunk_idx", "text", "chunk_tokens").collect()
    toks = {
        r["doc_id"]: (r["text"] or "").split()
        for r in docs.collect()
        if r["text"] and r["text"].strip()
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(toks)
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        full = toks[d]
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        covered = 0
        for c in chunks:
            ct = c["text"].split()
            start = c["chunk_idx"] * stride
            assert ct == full[start : start + max_tokens]
            assert c["chunk_tokens"] == len(ct)
            assert start + len(ct) > covered  # new content beyond predecessor
            covered = start + len(ct)
        assert covered == len(full)  # full coverage


def test_chunking_null_empty_yield_zero_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  "), (4, "a b c")], "doc_id long, text string"
    )
    out = chunk_documents(df, max_tokens=2, overlap=0)
    got = _got(out.select("doc_id", "chunk_idx", "text", "chunk_tokens"))
    assert got == {(4, 0): ("a b", 2), (4, 1): ("c", 1)}


def test_chunking_passthrough_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e", "web")], "doc_id long, text string, src string"
    )
    out = chunk_documents(df, max_tokens=3, overlap=1)
    assert set(out.columns) == {"doc_id", "src", "chunk_idx", "text", "chunk_tokens"}
    assert out.filter(F.col("src") == "web").count() == out.count() > 1
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, max_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_chunking_plan_is_shuffle_free(docs):
    plan = (
        chunk_documents(docs, max_tokens=16, overlap=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_sentences_matches_duckdb(spark, duck):
    """Sentence-aware chunking re-derived in DuckDB: sentinel
    sentence split → per-sentence token count → exclusive running sum
    → div-by-budget chunk → ordered concat → dense re-index. Frozen
    registry — the oracle lives here."""
    import pandas as pd

    from fuserank_spark.pipeline_ext.packing import chunk_sentences

    rows = (
        duck.execute("SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 60")
        .fetchall()
    )
    out = []
    for doc_id, text in rows:
        toks = text.split()
        # re-punctuate into sentences of 5-9 tokens so chunking has
        # real boundaries; vary terminator runs
        sents, i, j = [], 0, 0
        while i < len(toks):
            n = 5 + (j % 5)
            sents.append(" ".join(toks[i : i + n]) + (".", "!", "?!")[j % 3])
            i += n
            j += 1
        out.append((doc_id, " ".join(sents)))
    out.append((90001, "one short sentence."))
    out.append((90002, None))
    pdf = pd.DataFrame(out, columns=["doc_id", "text"])
    duck.register("chunk_sent_docs", pdf)
    try:
        sdf = spark.createDataFrame(pdf).select(
            "doc_id", F.col("text").cast("string").alias("text")
        )
        B = 10
        got = {
            (r["doc_id"], r["chunk_idx"]): (r["text"], r["n_sentences"], r["chunk_tokens"])
            for r in chunk_sentences(sdf, max_tokens=B).collect()
        }
        want = {
            (r[0], r[1]): (r[2], r[3], r[4])
            for r in duck.execute(
                rf"""
                WITH m AS (
                  SELECT doc_id,
                         regexp_replace(trim(text), '([.!?]+)\s+',
                                        '\1' || chr(31), 'g') AS mk
                  FROM chunk_sent_docs
                  WHERE text IS NOT NULL AND trim(text) <> ''
                ), sp AS (
                  SELECT doc_id, string_split(mk, chr(31)) AS ss FROM m
                ), s AS (
                  SELECT doc_id, ss[u.i] AS sentence,
                         row_number() OVER (PARTITION BY doc_id ORDER BY u.i) - 1 AS sent_idx,
                         len(regexp_split_to_array(trim(ss[u.i]), '\s+')) AS nt
                  FROM sp, unnest(generate_series(1, len(ss))) AS u(i)
                  WHERE trim(ss[u.i]) <> ''
                ), c AS (
                  SELECT doc_id, sent_idx, sentence, nt,
                         CAST(floor(coalesce(sum(nt) OVER (
                             PARTITION BY doc_id ORDER BY sent_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           / {B}) AS BIGINT) AS raw_chunk
                  FROM s
                ), g AS (
                  SELECT doc_id, raw_chunk,
                         string_agg(sentence, ' ' ORDER BY sent_idx) AS text,
                         count(*) AS n_sentences, sum(nt) AS chunk_tokens
                  FROM c GROUP BY doc_id, raw_chunk
                )
                SELECT doc_id,
                       row_number() OVER (PARTITION BY doc_id ORDER BY raw_chunk) - 1 AS chunk_idx,
                       text, n_sentences, chunk_tokens
                FROM g
                """
            ).fetchall()
        }
        assert got == want
        # invariants: concatenating a doc's chunks in order reproduces
        # the sentence stream; no empty chunks; short doc = one chunk
        doc0 = rows[0][0]
        chunks0 = [v[0] for k, v in sorted(got.items()) if k[0] == doc0]
        assert len(chunks0) >= 2
        assert got[(90001, 0)] == ("one short sentence.", 1, 3)
        assert not any(k[0] == 90002 for k in got)
    finally:
        duck.unregister("chunk_sent_docs")
