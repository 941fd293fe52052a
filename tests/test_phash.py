"""Perceptual-hash media dedup (multimodal.phash /
phash_hamming_pairs / dedup.code_hamming_pairs).

Not in the frozen 67-entry driver registry, so the oracle evidence
lives HERE (the r6 convention): the md5-keystream stub pixels make
the ENTIRE dHash SQL-expressible, so a DuckDB twin re-derives
pixels → bits → code row-for-row, and the banded pair stream is
checked against an exact all-pairs Hamming join (pigeonhole makes
the band prefilter lossless at max_hamming <= bands-1, so exact
all-pairs IS the correct oracle). code_hamming_pairs is additionally
pinned at bits=64 on crafted codes exercising the BIGINT sign bit.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.dedup import code_hamming_pairs
from fuserank_spark.pipeline_ext.multimodal import (
    attach_payload,
    phash,
    phash_hamming_pairs,
)

N_PIXELS = 9 * 8  # (grid_w+1) x grid_h for the 8x8 dHash
N_CHUNKS = -(-N_PIXELS // 16)


@pytest.fixture(scope="module")
def media(spark, duck):
    rows = []
    for i in range(240):
        # duplicate groups of 3 (same payload -> hamming 0), the rest unique
        base = i // 3 if i < 60 else i
        rows.append((i, f"media item {base} payload body"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    duck.register("media_docs", pdf)
    sdf = attach_payload(
        spark.createDataFrame(pdf).select(
            "doc_id", F.col("text").cast("string").alias("text")
        )
    )
    sdf.cache().count()
    yield sdf
    duck.unregister("media_docs")


def _duck_code_sql() -> str:
    """The dHash re-derivation: generated from the same grid constants
    the Spark op uses."""
    hex_expr = " || ".join(f"md5(text || '{c}')" for c in range(N_CHUNKS))
    terms = []
    for i in range(64):
        r, c = i // 8, i % 8
        left, right = r * 9 + c + 1, r * 9 + c + 2  # 1-based list index
        # DuckDB raises on 1::BIGINT << 63; Spark's shiftleft wraps to
        # MIN_VALUE — write the sign-bit term as the literal
        w = "(-9223372036854775807 - 1)" if i == 63 else f"(CAST(1 AS BIGINT) << {i})"
        terms.append(f"CASE WHEN px[{left}] > px[{right}] THEN {w} ELSE CAST(0 AS BIGINT) END")
    return f"""
    WITH h AS (
      SELECT doc_id, {hex_expr} AS hex FROM media_docs),
    p AS (
      SELECT doc_id, list_transform(range(0, {N_PIXELS}),
        p -> substr(hex, CAST(p * 2 + 1 AS INT), 2)) AS px
      FROM h)
    SELECT doc_id, CAST(list_sum([{", ".join(terms)}]) AS BIGINT) AS code FROM p
    """


def test_phash_codes_match_duckdb_twin(spark, duck, media):
    got = {
        r["doc_id"]: r["phash"]
        for r in phash(media).select("doc_id", "phash").collect()
    }
    exp = dict(duck.execute(_duck_code_sql()).fetchall())
    assert got == exp
    # the stub keystream exercises the sign bit somewhere in 240 rows
    assert any(v < 0 for v in exp.values())


def test_phash_pairs_match_exact_hamming_oracle(spark, duck, media):
    # unbounded cap: the exact all-pairs oracle is only valid without
    # star-degrade (the q_ngram_jaccard oracle-cap precedent)
    out = phash_hamming_pairs(media, bands=8, max_hamming=7, max_bucket_size=10**9)
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in out.collect()}
    exp = set(
        duck.execute(
            f"""
            WITH codes AS ({_duck_code_sql()})
            SELECT a.doc_id, b.doc_id, bit_count(xor(a.code, b.code))
            FROM codes a JOIN codes b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.code, b.code)) <= 7
            """
        ).fetchall()
    )
    assert got == exp
    # the planted duplicate groups of 3 produce 3 hamming-0 pairs each
    assert len([p for p in exp if p[2] == 0]) == 20 * 3


def test_phash_identical_payloads_hamming_zero(spark):
    sdf = attach_payload(
        spark.createDataFrame([(0, "same"), (1, "same")], "doc_id long, text string")
    )
    rows = phash_hamming_pairs(sdf).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in rows] == [(0, 1, 0)]


def test_phash_grid_validation(spark):
    with pytest.raises(ValueError, match="BIGINT"):
        phash(None, grid_w=9, grid_h=8)


def test_code_hamming_pairs_64bit_sign_bit(spark, duck):
    # crafted codes around the sign bit: base has bit 63 set; flips of
    # 1..7 low bits must surface with exact distances; a 9-bit flip
    # (> bands-1) must not (and is also beyond max_hamming)
    base = -(2**63) + 0b1010101  # bit 63 plus some low bits
    rows = [(0, base)]
    for j in range(1, 8):
        rows.append((j, base ^ ((1 << j) - 1)))  # hamming j vs base
    rows.append((8, base ^ ((1 << 9) - 1)))  # hamming 9 vs base
    pdf = pd.DataFrame(rows, columns=["doc_id", "code"])
    sdf = spark.createDataFrame(pdf)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in code_hamming_pairs(sdf, "code", bits=64, bands=8, max_hamming=7).collect()
    }
    duck.register("crafted_codes", pdf)
    exp = set(
        duck.execute(
            """
            SELECT a.doc_id, b.doc_id, bit_count(xor(a.code, b.code))
            FROM crafted_codes a JOIN crafted_codes b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.code, b.code)) <= 7
            """
        ).fetchall()
    )
    duck.unregister("crafted_codes")
    assert got == exp
    assert (0, 1, 1) in got and (0, 7, 7) in got
    assert not any(a == 0 and b == 8 for a, b, _ in got)
