"""Unicode text normalization — curation.normalize_text.

Registry-external (frozen 67-entry window): the oracle is DuckDB's
utf8proc-backed nfc_normalize / strip_accents / lower compared
row-for-row against Python's unicodedata over rows exercising
combining marks, ligatures, full-width forms, Hangul jamo and
non-ASCII casing — two independent Unicode implementations landing on
the same strings."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.curation import normalize_text

ROWS = [
    (0, "café"),            # e + combining acute → é under NFC
    (1, "café"),                   # precomposed stays
    (2, "ﬁle ﬂow"),                # ligatures (NFKC folds, NFC keeps)
    (3, "Ｆｕｌｌｗｉｄｔｈ １２３"),  # full-width forms
    (4, "한국어 한"),  # precomposed + jamo sequence
    (5, "ÄÖÜ ÅÉÎ"),
    (6, "ЖУРНАЛ Ёлка"),
    (7, "ΑΒΓ ΣΟΦΙΑ"),
    (8, "naïve façade"),
    (9, ""),
    (10, None),
    (11, "already ascii"),
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    return df, con


def _collect(df):
    return {r["doc_id"]: r["text_norm"] for r in df.collect()}


def test_nfc_matches_duckdb(frames):
    df, con = frames
    got = _collect(normalize_text(df, form="NFC"))
    want = dict(
        con.execute("SELECT doc_id, nfc_normalize(text) FROM t").fetchall()
    )
    assert got == want
    assert got[0] == got[1] == "café"


def test_strip_accents_matches_duckdb(frames):
    df, con = frames
    got = _collect(normalize_text(df, form="NFC", strip_accents=True))
    want = dict(
        con.execute(
            "SELECT doc_id, strip_accents(nfc_normalize(text)) FROM t"
        ).fetchall()
    )
    assert got == want
    assert got[8] == "naive facade"


def test_lowercase_matches_duckdb(frames):
    df, con = frames
    got = _collect(normalize_text(df, form="NFC", lowercase=True))
    want = dict(
        con.execute("SELECT doc_id, lower(nfc_normalize(text)) FROM t").fetchall()
    )
    assert got == want
    assert got[6] == "журнал ёлка"


def test_nfkc_folds_compat_forms(frames):
    df, _ = frames
    got = _collect(normalize_text(df, form="NFKC"))
    assert got[2] == "file flow"
    assert got[3] == "Fullwidth 123"
    # NFC must NOT fold ligatures
    assert _collect(normalize_text(df, form="NFC"))[2] == "ﬁle ﬂow"


def test_normalize_makes_dedup_keys_agree(spark):
    """The motivating composition: combining-mark and precomposed
    spellings hash apart raw, together after normalize_text."""
    from fuserank_spark.pipeline_ext.dedup import exact_dup_groups

    df = spark.createDataFrame(
        [(0, "café"), (1, "café")], "doc_id bigint, text string"
    )
    raw = exact_dup_groups(df, normalize=False)
    assert raw.filter(F.col("n_dups") > 1).count() == 0
    normed = exact_dup_groups(
        normalize_text(df).drop("text").withColumnRenamed("text_norm", "text"),
        normalize=False,
    )
    assert normed.filter(F.col("n_dups") > 1).count() == 1


def test_invalid_form_raises(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        normalize_text(df, form="NFX")
