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
