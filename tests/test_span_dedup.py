"""Exact-substring span dedup (dedup.dedup_spans) — the ExactSubstr
step of Lee et al. 2021 (arXiv:2107.06499) at token-L-gram
granularity.

Not in the frozen 67-entry driver registry (adding entries would push
verified rows out of the driver's first-50 window), so the oracle
evidence lives HERE: a full DuckDB re-derivation of tokenize →
per-position gram hash → duplicated-gram losers → running-max span
coverage → in-order rebuild, compared row-for-row (the line-dedup /
semantic-dedup precedent).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.dedup import dedup_spans

PASSAGE = "this passage is quoted verbatim in many documents across the entire corpus"  # 12 tokens
LICENSE = "licensed under the apache license version two point zero obtain copy"  # 11 tokens


@pytest.fixture(scope="module")
def span_docs(spark, duck):
    """Docs derived from the sf0.001 documents table with planted
    duplicated passages: PASSAGE spliced into every doc_id % 3 == 0
    at a varying token offset, LICENSE appended to every
    doc_id % 4 == 0, one whole-document duplicate, one sub-L short
    doc, one empty and one NULL text. The SAME pandas frame feeds
    both engines."""
    rows = (
        duck.execute("SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 100")
        .fetchall()
    )
    out = []
    for doc_id, text in rows:
        toks = text.split()[:60]
        if doc_id % 3 == 0:
            at = doc_id % 7
            toks = toks[:at] + PASSAGE.split() + toks[at:]
        if doc_id % 4 == 0:
            toks = toks + LICENSE.split()
        out.append((doc_id, " ".join(toks)))
    # a whole-document duplicate of the first doc (larger key → loser)
    out.append((90001, out[0][1]))
    out.append((90002, "too short for any gram"))
    out.append((90003, ""))
    out.append((90004, None))
    pdf = pd.DataFrame(out, columns=["doc_id", "text"])
    duck.register("span_docs", pdf)
    sdf = spark.createDataFrame(pdf).select(
        "doc_id", F.col("text").cast("string").alias("text")
    )
    sdf.cache().count()
    yield sdf
    duck.unregister("span_docs")


_ORACLE = r"""
WITH b AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
  FROM span_docs WHERE text IS NOT NULL
), ex AS (
  SELECT doc_id, u.pos - 1 AS pos, ts[u.pos] AS tok, len(ts) AS n, ts
  FROM b, unnest(generate_series(1, len(ts))) AS u(pos)
), g AS (
  SELECT doc_id, pos, tok,
         CASE WHEN pos <= n - {L} THEN
           CAST(concat('0x', substring(md5(
               array_to_string(ts[pos + 1 : pos + {L}], ' ')), 1, 8)) AS BIGINT)
         END AS gh
  FROM ex
), occ AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY gh) AS cnt,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
  FROM g WHERE gh IS NOT NULL
), losers AS (
  SELECT doc_id, pos FROM occ WHERE cnt >= 2 AND rn > 1
), m AS (
  SELECT g.doc_id, g.pos, g.tok,
         max(CASE WHEN l.pos IS NOT NULL THEN g.pos END)
           OVER (PARTITION BY g.doc_id ORDER BY g.pos
                 ROWS UNBOUNDED PRECEDING) AS lastl
  FROM g LEFT JOIN losers l USING (doc_id, pos)
), reb AS (
  SELECT doc_id,
         string_agg(tok, ' ' ORDER BY pos)
           FILTER (lastl IS NULL OR lastl <= pos - {L}) AS text_kept,
         count(*) FILTER (lastl IS NULL OR lastl <= pos - {L}) AS n_kept
  FROM m GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(r.text_kept, '') END AS text,
       CASE WHEN d.text IS NULL OR trim(d.text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END AS n_tokens,
       coalesce(r.n_kept, 0) AS n_kept
FROM span_docs d LEFT JOIN reb r USING (doc_id)
ORDER BY d.doc_id
"""


def _rows(df):
    return {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"])
        for r in df.select("doc_id", "text", "n_tokens", "n_kept").collect()
    }


def _want(duck, L):
    return {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(_ORACLE.format(L=L)).fetchall()
    }


@pytest.mark.parametrize("strategy", ["join", "window"])
def test_dedup_spans_matches_duckdb_rederivation(span_docs, duck, strategy):
    """The whole op — whitespace tokenize, per-position portable gram
    hash, ≥2-occurrence losers, (key, pos) first-occurrence winner,
    running-max span coverage, in-order single-space rebuild —
    re-derived in DuckDB; rebuilt text and both counters must match
    row-for-row, on BOTH loser-derivation strategies."""
    got = _rows(dedup_spans(span_docs, min_span_tokens=8, strategy=strategy))
    assert got == _want(duck, 8)


@pytest.mark.parametrize("strategy", ["join", "window"])
def test_dedup_spans_matches_duckdb_at_other_span_length(span_docs, duck, strategy):
    got = _rows(dedup_spans(span_docs, min_span_tokens=5, strategy=strategy))
    assert got == _want(duck, 5)


def test_dedup_spans_rejects_unknown_strategy(span_docs):
    with pytest.raises(ValueError, match="strategy"):
        dedup_spans(span_docs, strategy="magic")


def test_dedup_spans_planted_passage_survives_exactly_once(span_docs):
    """The 12-token planted passage is everywhere ≥ L=8 tokens of
    duplicated span; after dedup it must appear exactly once in the
    whole corpus (keep-first), and the whole-document duplicate must
    collapse to empty."""
    out = _rows(dedup_spans(span_docs, min_span_tokens=8))
    n_pass = sum(1 for t, _, _ in out.values() if t and PASSAGE in t)
    assert n_pass == 1
    # globally-first occurrence owns it: the smallest planted doc_id
    first = min(d for d in out if d % 3 == 0 and d < 90000)
    assert PASSAGE in out[first][0]
    assert out[90001][0] == ""  # whole-doc duplicate fully removed
    assert out[90001][2] == 0


def test_dedup_spans_sub_span_docs_pass_through(span_docs):
    out = _rows(dedup_spans(span_docs, min_span_tokens=8))
    assert out[90002] == ("too short for any gram", 5, 5)
    assert out[90003] == ("", 0, 0)
    assert out[90004] == (None, 0, 0)


def test_dedup_spans_first_occurrence_keeps_span_inside_unique_doc(spark):
    """A duplicated passage inside otherwise-unique documents is cut
    out of the later doc only — the surrounding unique tokens splice
    together; the earlier doc is untouched."""
    shared = "s1 s2 s3 s4"
    df = spark.createDataFrame(
        [
            (1, f"u1 u2 {shared} u3 u4"),
            (2, f"v1 v2 v3 {shared} v4 v5"),
        ],
        "doc_id long, text string",
    )
    out = _rows(dedup_spans(df, min_span_tokens=4))
    assert out[1] == (f"u1 u2 {shared} u3 u4", 8, 8)
    assert out[2] == ("v1 v2 v3 v4 v5", 9, 5)


def test_dedup_spans_rejects_degenerate_span_length(span_docs):
    with pytest.raises(ValueError):
        dedup_spans(span_docs, min_span_tokens=1)


def test_dedup_spans_preserves_other_columns(span_docs):
    out = dedup_spans(span_docs.withColumn("src", F.lit("web")), min_span_tokens=8)
    assert set(out.columns) == {"doc_id", "text", "src", "n_tokens", "n_kept"}
    assert out.filter(F.col("src") != "web").count() == 0


def test_dedup_spans_plan_has_no_quadratic_ops(span_docs):
    plan = (
        dedup_spans(span_docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _ref_dedup_spans(docs: dict[int, list[str]], L: int):
    """Pure-Python reference of the gram-granular ExactSubstr
    semantics (gram identity by content — the engine's 32-bit md5
    prefix is collision-free at these corpus sizes)."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for k in sorted(docs):
        toks = docs[k]
        for p in range(len(toks) - L + 1):
            occ.setdefault(tuple(toks[p : p + L]), []).append((k, p))
    losers: dict[int, set[int]] = {k: set() for k in docs}
    for occs in occ.values():
        if len(occs) >= 2:
            w = min(occs)
            for o in occs:
                if o != w:
                    losers[o[0]].add(o[1])
    out = {}
    for k, toks in docs.items():
        lastl = None
        kept = []
        for q, tok in enumerate(toks):
            if q in losers[k]:
                lastl = q
            if lastl is None or lastl <= q - L:
                kept.append(tok)
        out[k] = (" ".join(kept), len(toks), len(kept))
    return out


def test_dedup_spans_randomized_against_python_reference(spark):
    """Dense random corpora over a 3-token alphabet: duplicated and
    OVERLAPPING spans appear everywhere, stressing the running-max
    coverage against an independent Python implementation. Seeded —
    deterministic; two L values, one Spark job each."""
    import random

    for seed, L in ((7, 3), (23, 4)):
        rng = random.Random(seed)
        docs = {
            k: [rng.choice("abc") for _ in range(rng.randint(0, 14))]
            for k in range(60)
        }
        df = spark.createDataFrame(
            [(k, " ".join(toks) if toks else "") for k, toks in docs.items()],
            "doc_id long, text string",
        )
        got = _rows(dedup_spans(df, min_span_tokens=L))
        want = _ref_dedup_spans(docs, L)
        assert got == want, f"seed={seed} L={L}"


# ----------------------------------------------------- anchored mode (r8)

_ORACLE_ANCHOR = r"""
WITH b AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
  FROM span_docs WHERE text IS NOT NULL
), ex AS (
  SELECT doc_id, u.pos - 1 AS pos, ts[u.pos] AS tok, len(ts) AS n, ts
  FROM b, unnest(generate_series(1, len(ts))) AS u(pos)
), g AS (
  SELECT doc_id, pos, tok,
         CASE WHEN pos <= n - {L} THEN
           CAST(concat('0x', substring(md5(
               array_to_string(ts[pos + 1 : pos + {L}], ' ')), 1, 8)) AS BIGINT)
         END AS gh
  FROM ex
), h AS (
  SELECT doc_id, pos, gh * 2097152 + (1048576 - pos) AS cmb
  FROM g WHERE gh IS NOT NULL
), wsel AS (
  SELECT doc_id,
    min(cmb) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN {W1} PRECEDING AND CURRENT ROW) AS sel,
    row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
    count(*) OVER (PARTITION BY doc_id) AS ng
  FROM h
), anch AS (
  SELECT DISTINCT doc_id, 1048576 - (sel % 2097152) AS pos, sel // 2097152 AS gh
  FROM wsel WHERE rn >= {W} OR rn = ng
), occ AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY gh) AS cnt,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
  FROM anch
), losers AS (
  SELECT doc_id, pos FROM occ WHERE cnt >= 2 AND rn > 1
), m AS (
  SELECT g.doc_id, g.pos, g.tok,
         max(CASE WHEN l.pos IS NOT NULL THEN g.pos END)
           OVER (PARTITION BY g.doc_id ORDER BY g.pos
                 ROWS UNBOUNDED PRECEDING) AS lastl
  FROM g LEFT JOIN losers l USING (doc_id, pos)
), reb AS (
  SELECT doc_id,
         string_agg(tok, ' ' ORDER BY pos)
           FILTER (lastl IS NULL OR lastl <= pos - {L}) AS text_kept,
         count(*) FILTER (lastl IS NULL OR lastl <= pos - {L}) AS n_kept
  FROM m GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(r.text_kept, '') END AS text,
       CASE WHEN d.text IS NULL OR trim(d.text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END AS n_tokens,
       coalesce(r.n_kept, 0) AS n_kept
FROM span_docs d LEFT JOIN reb r USING (doc_id)
ORDER BY d.doc_id
"""


def _want_anchor(duck, L, W):
    return {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(_ORACLE_ANCHOR.format(L=L, W=W, W1=W - 1)).fetchall()
    }


def test_dedup_spans_anchor_matches_duckdb_rederivation(span_docs, duck):
    """VERDICT r7 #4: the anchored plan — window-of-w cmb minima
    (winnow encoding) as anchors, duplicated-anchor losers, identical
    span-cover rebuild — re-derived end-to-end in DuckDB (sliding-min
    window + the exact oracle's cover tail); text and both counters
    row-for-row."""
    got = _rows(
        dedup_spans(span_docs, min_span_tokens=8, strategy="anchor", anchor_window=4)
    )
    assert got == _want_anchor(duck, 8, 4)


def test_dedup_spans_anchor_w1_equals_exact(span_docs):
    """anchor_window=1 selects every gram — the anchored plan must
    reproduce the exact strategies bit-for-bit."""
    exact = _rows(dedup_spans(span_docs, min_span_tokens=8, strategy="join"))
    anch = _rows(
        dedup_spans(span_docs, min_span_tokens=8, strategy="anchor", anchor_window=1)
    )
    assert anch == exact


def test_dedup_spans_anchor_deletions_subset_of_exact(spark):
    """One-sided error, the documented miss profile: anchored mode
    never deletes a token exact mode keeps — exact's kept token
    sequence is a subsequence of anchored's, per document, on dense
    random corpora (overlapping spans everywhere)."""
    import random

    def _is_subseq(small, big):
        it = iter(big)
        return all(tok in it for tok in small)

    for seed, L, w in ((7, 4, 2), (23, 6, 3), (41, 8, 4), (59, 5, 5), (67, 8, 2)):
        rng = random.Random(seed)
        docs = {
            k: [rng.choice("abcd") for _ in range(rng.randint(0, 20))]
            for k in range(50)
        }
        df = spark.createDataFrame(
            [(k, " ".join(t) if t else "") for k, t in docs.items()],
            "doc_id long, text string",
        )
        exact = _rows(dedup_spans(df, min_span_tokens=L))
        anch = _rows(
            dedup_spans(df, min_span_tokens=L, strategy="anchor", anchor_window=w)
        )
        for k in docs:
            assert anch[k][2] >= exact[k][2], (seed, k)
            assert _is_subseq(exact[k][0].split(), anch[k][0].split()), (seed, k)


def test_dedup_spans_anchor_long_passage_guarantee(spark):
    """The winnowing guarantee, end to end: a duplicated passage of
    length >= L + w - 1 loses, in the non-first copy, every token
    except at most w-1 at each boundary. Unique marker tokens pin
    exactly which positions survive."""
    L, w = 8, 4
    M = 20  # passage length >= L + w - 1 = 11
    passage = [f"p{i}" for i in range(M)]
    df = spark.createDataFrame(
        [
            (1, "a1 a2 a3 " + " ".join(passage) + " a4 a5"),
            (2, "b1 b2 " + " ".join(passage) + " b3 b4 b5"),
        ],
        "doc_id long, text string",
    )
    out = _rows(dedup_spans(df, min_span_tokens=L, strategy="anchor", anchor_window=w))
    assert out[1][0] == "a1 a2 a3 " + " ".join(passage) + " a4 a5"  # winner intact
    kept2 = out[2][0].split()
    surviving = [t for t in kept2 if t in set(passage)]
    # at most w-1 tokens survive at each edge, none in the interior
    assert set(surviving) <= set(passage[: w - 1]) | set(passage[-(w - 1):]), kept2
    # and the unique context around the passage is untouched
    assert [t for t in kept2 if t.startswith("b")] == ["b1", "b2", "b3", "b4", "b5"]


def test_dedup_spans_anchor_rejects_bad_window(span_docs):
    with pytest.raises(ValueError, match="anchor_window"):
        dedup_spans(span_docs, min_span_tokens=4, strategy="anchor", anchor_window=5)
    with pytest.raises(ValueError, match="anchor_window"):
        dedup_spans(span_docs, strategy="anchor", anchor_window=0)


def test_dedup_spans_anchor_edge_docs_pass_through(span_docs):
    out = _rows(dedup_spans(span_docs, min_span_tokens=8, strategy="anchor"))
    assert out[90002] == ("too short for any gram", 5, 5)
    assert out[90003] == ("", 0, 0)
    assert out[90004] == (None, 0, 0)


def test_dedup_spans_anchor_plan_has_no_window(span_docs):
    """Plan-shape guard for the anchored exchange budget: the exact
    strategies rebuild through a per-token running-max WindowExec; the
    anchored rebuild is a narrow array_except after a doc-granular
    join — no window operator anywhere, and no more exchanges than
    the exact join plan."""
    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    exact = plan(dedup_spans(span_docs, min_span_tokens=8, strategy="join"))
    anch = plan(dedup_spans(span_docs, min_span_tokens=8, strategy="anchor"))
    assert "Window" in exact
    assert "Window" not in anch
    assert anch.count("Exchange") <= exact.count("Exchange")
    assert "CartesianProduct" not in anch
