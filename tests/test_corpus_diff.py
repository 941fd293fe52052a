"""Corpus / snapshot diff — partitioning.corpus_diff / snapshot_diff.

Registry-external (frozen 67-entry window): the differential evidence
lives here (CLAUDE.md doctrine). The DuckDB twin derives the SAME
mutated side-B from documents and computes the diff by DIRECT column
comparison (no row hashing at all) — a genuinely independent mechanism
landing on the same (key, status) set, which pins corpus_diff's
hash-projection shortcut as semantics-preserving."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fuserank_spark.partitioning import (
    corpus_diff,
    snapshot_diff,
    write_corpus_snapshot,
)

from .conftest import SF_SMOKE

# side B: drop doc_id%7==0, rewrite text for doc_id%5==0 (of the
# survivors), add 20 brand-new docs above the id range
_B_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN text || ' [edited]' ELSE text END AS text,
       lang, source, n_chars
FROM documents WHERE doc_id % 7 <> 0
UNION ALL
SELECT 1000000 + i AS doc_id, 'new doc ' || i AS text, 'en' AS lang,
       'synthetic' AS source, 10 AS n_chars
FROM generate_series(0, 19) t(i)
"""

_ORACLE = f"""
WITH b AS ({_B_SQL})
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE a.doc_id IS NULL OR b.doc_id IS NULL
   OR a.text IS DISTINCT FROM b.text
   OR a.lang IS DISTINCT FROM b.lang
   OR a.source IS DISTINCT FROM b.source
   OR a.n_chars IS DISTINCT FROM b.n_chars
ORDER BY doc_id
"""


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    d.cache().count()
    return d


@pytest.fixture(scope="module")
def docs_b(spark, docs):
    survivors = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
        ).otherwise(F.col("text")),
    )
    new = spark.range(20).select(
        (F.lit(1000000) + F.col("id")).alias("doc_id"),
        F.concat(F.lit("new doc "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.lit(10).cast("bigint").alias("n_chars"),
    )
    b = survivors.unionByName(new)
    b.cache().count()
    return b


def test_corpus_diff_matches_duckdb_direct_comparison(docs, docs_b, duck):
    got = sorted(
        (int(r["doc_id"]), r["status"])
        for r in corpus_diff(docs, docs_b, key_cols=["doc_id"]).collect()
    )
    want = [(int(k), s) for k, s in duck.execute(_ORACLE).fetchall()]
    assert got == want
    assert {"added", "removed", "changed"} <= {s for _, s in got}


def test_corpus_diff_identical_sides_is_empty(docs):
    assert corpus_diff(docs, docs, key_cols=["doc_id"]).count() == 0


def test_corpus_diff_null_transition_is_change(spark):
    """value→NULL must register as changed — the sentinel in the row
    hash keeps NULL distinct from '' and from absence."""
    a = spark.createDataFrame([(1, "x"), (2, "")], "k bigint, v string")
    b = spark.createDataFrame([(1, None), (2, "")], "k bigint, v string")
    got = {(r["k"], r["status"]) for r in corpus_diff(a, b, key_cols=["k"]).collect()}
    assert got == {(1, "changed")}


def test_corpus_diff_duplicate_key_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    a = spark.createDataFrame([(1, "x"), (1, "y")], "k bigint, v string")
    b = spark.createDataFrame([(1, "x")], "k bigint, v string")
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        corpus_diff(a, b, key_cols=["k"]).collect()


def test_corpus_diff_missing_columns_raise(spark):
    a = spark.createDataFrame([(1, "x")], "k bigint, v string")
    b = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError):
        corpus_diff(a, b, key_cols=["k"], compare_cols=["v"])
    with pytest.raises(ValueError):
        corpus_diff(a, b, key_cols=[])


def test_snapshot_diff_manifest_fast_path(spark, docs, tmp_path_factory):
    """Identical manifests (checksum + rows + cols) prove an empty
    diff without a scan; a mutated republish falls through to the
    real diff and reports exactly the changed keys."""
    base = str(tmp_path_factory.mktemp("snapdiff"))
    pa, pb, pc = (os.path.join(base, x) for x in ("a", "b", "c"))
    write_corpus_snapshot(docs, pa)
    write_corpus_snapshot(docs, pb)
    fast = snapshot_diff(spark, pa, pb, key_cols=["doc_id"])
    assert fast.count() == 0
    assert fast.columns == ["doc_id", "status"]

    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 3, F.lit("tampered")).otherwise(F.col("text")),
    )
    write_corpus_snapshot(mutated, pc)
    got = {
        (int(r["doc_id"]), r["status"])
        for r in snapshot_diff(spark, pa, pc, key_cols=["doc_id"]).collect()
    }
    assert got == {(3, "changed")}
