"""Writing-system profiling — textstats.script_profile.

Registry-external (frozen 67-entry window): DuckDB re-derivation lives
here, generated from the SAME SCRIPT_RANGES constant so both engines
apply char-identical literal ranges (the engine-parity doctrine —
\\p{Script} classes spell differently and ship different Unicode
versions per engine)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.textstats import SCRIPT_RANGES, script_profile

from .conftest import SF_SMOKE


def _oracle_sql(source: str) -> str:
    names = sorted(SCRIPT_RANGES)
    count_exprs = ",\n         ".join(
        f"length(t) - length(regexp_replace(t, '[{SCRIPT_RANGES[n]}]', '', 'g')) AS n_{n}"
        for n in names
    )
    mx = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    chain = " ".join(f"WHEN n_{n} = {mx} THEN '{n}'" for n in names)
    sel = []
    for n in names:
        sel.append(f"n_{n}")
        sel.append(
            f"round(CASE WHEN n_total > 0 THEN CAST(n_{n} AS DOUBLE) / n_total "
            f"ELSE 0.0 END, 6) AS frac_{n}"
        )
    return f"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t FROM {source}
), counted AS (
  SELECT doc_id, length(t) AS n_total,
         {count_exprs}
  FROM base
)
SELECT doc_id, n_total AS n_chars_total,
       {", ".join(sel)},
       CASE WHEN {mx} = 0 THEN 'none' {chain} ELSE 'none' END AS dominant_script
FROM counted
ORDER BY doc_id
"""


def test_script_profile_matches_duckdb_on_documents(spark, duck):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = [
        tuple(r) for r in script_profile(docs).orderBy("doc_id").collect()
    ]
    want = [tuple(r) for r in duck.execute(_oracle_sql("documents")).fetchall()]
    assert got == want


MULTI = [
    (0, "hello world"),
    (1, "Привет мир"),
    (2, "مرحبا بالعالم"),
    (3, "你好世界 hello"),
    (4, "こんにちは世界"),
    (5, "안녕하세요"),
    (6, "שלום עולם"),
    (7, "नमस्ते दुनिया"),
    (8, "Γειά σου Κόσμε"),
    (9, "1234 !!! ..."),
    (10, ""),
    (11, None),
    (12, "ab аб"),  # 2 latin vs 2 cyrillic — tie, alphabetical → cyrillic
]


def test_script_profile_matches_duckdb_on_multilingual(spark):
    df = spark.createDataFrame(MULTI, "doc_id bigint, text string")
    got = [tuple(r) for r in script_profile(df).orderBy("doc_id").collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE m(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO m VALUES (?, ?)", MULTI)
    want = [tuple(r) for r in con.execute(_oracle_sql("m")).fetchall()]
    assert got == want


def test_script_profile_dominance_and_edges(spark):
    df = spark.createDataFrame(MULTI, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert out[0]["dominant_script"] == "latin"
    assert out[1]["dominant_script"] == "cyrillic"
    assert out[2]["dominant_script"] == "arabic"
    assert out[4]["dominant_script"] == "kana"  # kana outnumber the han chars
    assert out[5]["dominant_script"] == "hangul"
    assert out[6]["dominant_script"] == "hebrew"
    assert out[7]["dominant_script"] == "devanagari"
    assert out[8]["dominant_script"] == "greek"
    assert out[9]["dominant_script"] == "none"
    assert out[10]["dominant_script"] == "none"
    assert out[11]["dominant_script"] == "none"
    assert out[12]["dominant_script"] == "cyrillic"  # tie → alphabetical
    assert out[10]["n_chars_total"] == 0 and out[11]["n_chars_total"] == 0
    assert out[0]["frac_latin"] == pytest.approx(10 / 11, abs=1e-6)
