"""Winnowing fingerprints (dedup.winnow_fingerprints /
winnow_overlap_pairs, Schleimer et al. SIGMOD 2003). Registry-external
— the oracle lives here: a full DuckDB re-derivation (tokens → k-gram
hashes → combined (hash, rightmost-pos) BIGINT encoding → frame min →
decode) row-for-row on the documents table, plus the winnowing
theorem's guarantee and window-coverage properties.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from fuserank_spark.pipeline_ext.dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)

K, W = 5, 4

# verbatim _TOKS_SQL: the legacy tokens_expr twin pair (driver-oracle-
# frozen; carries the known \s/\x0B caveat — see CLAUDE.md dialect note)
_TOKS = (
    "CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)
_GH = (
    "CAST(concat('0x', substring(md5(array_to_string(tk[i:i+{k}-1], ' ')), 1, 8)) "
    "AS BIGINT)"
).format(k=K)


def _duck_winnow_sql(table: str) -> str:
    return f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS tk FROM {table}
    ), g AS (
      SELECT doc_id, unnest(generate_series(1, len(tk) - {K - 1})) AS i, tk
      FROM t WHERE len(tk) >= {K}
    ), h AS (
      -- pos is 0-based to match the Spark side; combined encoding is
      -- the SAME closed form: gh*2^21 + (2^20 - pos)
      SELECT doc_id, i - 1 AS pos,
             {_GH} * {1 << 21} + ({1 << 20} - (i - 1)) AS cmb
      FROM g
    ), wsel AS (
      SELECT doc_id, pos,
        min(cmb) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW) AS sel,
        row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
        count(*) OVER (PARTITION BY doc_id) AS ng
      FROM h
    )
    SELECT DISTINCT doc_id,
           {1 << 20} - (sel % {1 << 21}) AS pos,
           sel // {1 << 21} AS fp
    FROM wsel WHERE rn >= {W} OR rn = ng
    """


def test_winnow_fingerprints_match_duckdb_twin(spark, duck):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(docs, k=K, window=W).collect()
    }
    exp = set(map(tuple, duck.execute(_duck_winnow_sql("documents")).fetchall()))
    assert got == exp
    assert len(got) > 100


def test_winnow_window_coverage_and_density(spark):
    """Every window of W consecutive gram positions contains at least
    one selected position (the defining property), checked directly
    in pandas per document."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).limit(50)
    fps = winnow_fingerprints(docs, k=K, window=W).toPandas()
    toks = {r["doc_id"]: len(r["text"].split()) for r in docs.collect()}
    for doc_id, grp in fps.groupby("doc_id"):
        n_grams = toks[doc_id] - (K - 1)
        sel = sorted(set(grp["pos"]))
        assert all(0 <= p < n_grams for p in sel)
        if n_grams >= W:
            for start in range(n_grams - W + 1):
                assert any(start <= p < start + W for p in sel), (doc_id, start)


def test_winnow_guarantee_shared_passage(spark):
    """The winnowing theorem: a common passage of window+k-1 tokens
    guarantees a shared fingerprint — and winnow_overlap_pairs
    surfaces the pair."""
    passage = " ".join(f"shared{i}" for i in range(W + K - 1))
    rows = [
        (0, "left filler words before " + passage + " tail a b c"),
        (1, "completely different preamble here then " + passage + " other end"),
        (2, "no overlap with anything at all just noise tokens etc"),
    ]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_overlap_pairs(
            sdf, k=K, window=W, min_shared=1, max_bucket_size=10**9
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert not any(2 in p for p in pairs)


def test_winnow_overlap_counts_match_fingerprint_sets(spark):
    """n_shared == |fp-set intersection| (derived from the already
    twin-pinned fingerprint output)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).limit(80)
    fps = winnow_fingerprints(docs, k=K, window=W).toPandas()
    sets = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
    exp = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = len(sets[a] & sets[b])
            if n >= 2:
                exp[(a, b)] = n
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_overlap_pairs(
            docs, k=K, window=W, min_shared=2, max_bucket_size=10**9
        ).collect()
    }
    assert got == exp


def test_winnow_validation(spark):
    with pytest.raises(ValueError, match=">= 1"):
        winnow_fingerprints(None, k=0)
