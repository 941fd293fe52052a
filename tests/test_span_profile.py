"""span_length_profile — the duplicated-span length histogram that
makes the anchor-mode ``w`` choice a checkable per-corpus step
(VERDICT r8 finding #1: the three-point w-law needs the corpus's
duplicated-span length distribution; the 0.184 → 0.432 missed_frac
flip between the 500k and 5M trend tiers is exactly sub-``L+w−1``
duplicate mass, SCALING.md r8).

Not in the frozen 67-entry driver registry, so the oracle evidence
lives here: a full DuckDB re-derivation of tokenize → per-position
gram hash → duplicated-gram positions → gaps-and-islands run
stitching → length histogram with cumulative mass fractions,
compared row-for-row (the test-resident-oracle rule, CLAUDE.md).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.dedup import span_length_profile

PASSAGE = "this passage is quoted verbatim in many documents across the entire corpus"  # 12 tokens
LICENSE = "licensed under the apache license version two point zero obtain copy"  # 11 tokens


@pytest.fixture(scope="module")
def profile_docs(spark, duck):
    """The span_docs construction (test_span_dedup) registered under
    its own name: planted 12-token PASSAGE (every doc_id % 3 == 0 at a
    varying offset), 11-token LICENSE appended (every doc_id % 4 == 0),
    one whole-document duplicate, short/empty/NULL edge docs. The SAME
    pandas frame feeds both engines."""
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
    out.append((90001, out[0][1]))
    out.append((90002, "too short for any gram"))
    out.append((90003, ""))
    out.append((90004, None))
    pdf = pd.DataFrame(out, columns=["doc_id", "text"])
    duck.register("profile_docs", pdf)
    sdf = spark.createDataFrame(pdf).select(
        "doc_id", F.col("text").cast("string").alias("text")
    )
    sdf.cache().count()
    yield sdf
    duck.unregister("profile_docs")


# {GATE}: optional sampling predicate on doc_id (twin of the portable
# seeded gate in span_length_profile); "TRUE" = full corpus
_ORACLE = r"""
WITH b AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
  FROM profile_docs WHERE text IS NOT NULL AND ({GATE})
), ex AS (
  SELECT doc_id, u.pos - 1 AS pos, len(ts) AS n, ts
  FROM b, unnest(generate_series(1, len(ts))) AS u(pos)
), g AS (
  SELECT doc_id, pos,
         CASE WHEN pos <= n - {L} THEN
           CAST(concat('0x', substring(md5(
               array_to_string(ts[pos + 1 : pos + {L}], ' ')), 1, 8)) AS BIGINT)
         END AS gh
  FROM ex
), dup AS (
  SELECT gh FROM g WHERE gh IS NOT NULL GROUP BY gh HAVING count(*) >= 2
), dp AS (
  SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)
), runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dp
), spans AS (
  SELECT count(*) + {L} - 1 AS span_tokens FROM runs GROUP BY doc_id, grp
), hist AS (
  SELECT span_tokens, count(*) AS n_spans,
         span_tokens * count(*) AS dup_token_mass
  FROM spans GROUP BY span_tokens
)
SELECT span_tokens, n_spans, dup_token_mass,
       round(sum(dup_token_mass) OVER (ORDER BY span_tokens
                 ROWS UNBOUNDED PRECEDING) * 1.0
             / sum(dup_token_mass) OVER (), 9) AS cum_mass_frac,
       least(span_tokens - {L} + 1, {L}) AS max_guaranteed_w
FROM hist ORDER BY span_tokens
"""

_GATE_SQL = (
    "CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR), '#{seed}')), "
    "1, 8)) AS BIGINT) % 1000000 < {cut}"
)


def _rows(df):
    return [
        (
            r["span_tokens"], r["n_spans"], r["dup_token_mass"],
            r["cum_mass_frac"], r["max_guaranteed_w"],
        )
        for r in df.collect()
    ]


def _want(duck, L, gate="TRUE"):
    return [tuple(r) for r in duck.execute(_ORACLE.format(L=L, GATE=gate)).fetchall()]


def test_profile_matches_duckdb_rederivation(profile_docs, duck):
    got = _rows(span_length_profile(profile_docs, min_span_tokens=8))
    want = _want(duck, 8)
    assert len(got) > 0
    assert got == want


def test_profile_matches_duckdb_at_other_span_length(profile_docs, duck):
    got = _rows(span_length_profile(profile_docs, min_span_tokens=5))
    assert got == _want(duck, 5)


def test_profile_sampled_matches_duckdb_gate_twin(profile_docs, duck):
    """The seeded portable document gate selects the identical doc
    subset on both engines (decontam precedent), so the sampled
    profile re-derives row-for-row too."""
    got = _rows(
        span_length_profile(
            profile_docs, min_span_tokens=8, sample_fraction=0.5, seed=7
        )
    )
    want = _want(duck, 8, gate=_GATE_SQL.format(seed=7, cut=500000))
    assert len(got) > 0
    assert got == want


def test_profile_planted_single_passage(spark):
    """Controlled corpus: one 14-token passage duplicated across two
    otherwise-disjoint docs → exactly one histogram row per the
    semantics: length 14, two occurrences, cum mass 1.0, and the
    guarantee column says anchor_window ≤ min(14−8+1, 8) = 7 catches
    it."""
    passage = " ".join(f"p{i}" for i in range(14))
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {passage} gamma delta"),
            (2, f"zeta eta theta {passage} iota"),
            (3, "wholly unrelated text with no duplicated grams at all here"),
        ],
        "doc_id bigint, text string",
    )
    got = _rows(span_length_profile(docs, min_span_tokens=8))
    assert got == [(14, 2, 28, 1.0, 7)]


def test_profile_cum_frac_reaches_one(profile_docs):
    rows = _rows(span_length_profile(profile_docs, min_span_tokens=8))
    assert rows[-1][3] == 1.0
    fracs = [r[3] for r in rows]
    assert fracs == sorted(fracs)


def test_profile_gap_bounds_anchor_miss(spark):
    """The operational read of the histogram: mass strictly below
    L + w − 1 upper-bounds what anchor mode is GUARANTEED to catch.
    Corpus with one 9-token and one 20-token duplicated passage at
    L=8: w=4 guarantee covers ≥ 11 tokens, so the profile's gap at
    span_tokens < 11 must contain the 9-token span and nothing
    else."""
    p_short = " ".join(f"s{i}" for i in range(9))
    p_long = " ".join(f"l{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, f"aa bb {p_short} cc dd {p_long} ee"),
            (2, f"ff gg hh {p_short} ii {p_long} jj kk"),
        ],
        "doc_id bigint, text string",
    )
    rows = _rows(span_length_profile(docs, min_span_tokens=8))
    below = [r for r in rows if r[0] < 8 + 4 - 1]
    at_or_above = [r for r in rows if r[0] >= 8 + 4 - 1]
    assert [r[0] for r in below] == [9]
    assert [r[0] for r in at_or_above] == [20]
    # the w the short span needs, straight from the guarantee column
    assert below[0][4] == 2


def test_profile_rejects_bad_args(profile_docs):
    with pytest.raises(ValueError):
        span_length_profile(profile_docs, min_span_tokens=1)
    with pytest.raises(ValueError):
        span_length_profile(profile_docs, sample_fraction=0.0)
    with pytest.raises(ValueError):
        span_length_profile(profile_docs, sample_fraction=1.5)


def test_profile_plan_has_no_quadratic_ops(profile_docs):
    plan = span_length_profile(profile_docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_recommended_anchor_window_inverts_profile(spark):
    """Histogram → w inversion: corpus with 9-token (small mass) and
    20-token (dominant mass) duplicated passages at L=8. Gap below
    L+w−1: w=2 → thr 9, gap = 0 (9-token spans are AT the threshold);
    w=3 → thr 10, gap = mass(9); so budget ≥ mass(9) allows larger w,
    budget < mass(9) caps at w=2."""
    from fuserank_spark.pipeline_ext.dedup import recommended_anchor_window

    p_short = " ".join(f"s{i}" for i in range(9))     # 9-token span
    p_long = " ".join(f"l{i}" for i in range(20))     # 20-token span
    docs = spark.createDataFrame(
        [
            (1, f"aa bb {p_short} cc dd {p_long} ee"),
            (2, f"ff gg hh {p_short} ii {p_long} jj kk"),
        ],
        "doc_id bigint, text string",
    )
    prof = span_length_profile(docs, min_span_tokens=8)
    # dup mass: 9-token spans 18 tokens, 20-token spans 40 → frac 18/58
    short_frac = 18 / 58
    tight = recommended_anchor_window(
        prof, min_span_tokens=8, max_miss_frac=short_frac / 2
    )
    assert tight["anchor_window"] == 2
    assert tight["guarantee_tokens"] == 9
    assert tight["gap_mass_frac"] == 0.0
    loose = recommended_anchor_window(
        prof, min_span_tokens=8, max_miss_frac=0.5
    )
    # 20-token spans allow w up to min(20−8+1, 8) = 8 before the
    # dominant mass enters the gap
    assert loose["anchor_window"] == 8
    assert loose["gap_mass_frac"] == pytest.approx(short_frac, abs=1e-9)


def test_recommended_anchor_window_minimal_span_regime(spark):
    """The 5M-regime shape: ALL duplicate mass at the minimal span
    length L → any tight budget yields w=1 (anchor mode cannot cut
    bytes without eating the miss — the honest answer)."""
    from fuserank_spark.pipeline_ext.dedup import recommended_anchor_window

    p = " ".join(f"m{i}" for i in range(8))  # exactly L tokens
    docs = spark.createDataFrame(
        [(1, f"aa bb {p} cc"), (2, f"dd {p} ee ff")],
        "doc_id bigint, text string",
    )
    prof = span_length_profile(docs, min_span_tokens=8)
    got = recommended_anchor_window(prof, min_span_tokens=8, max_miss_frac=0.05)
    assert got["anchor_window"] == 1
    assert got["guarantee_tokens"] == 8


def test_recommended_anchor_window_rejects_bad_args(spark):
    from fuserank_spark.pipeline_ext.dedup import recommended_anchor_window

    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    prof = span_length_profile(docs, min_span_tokens=8)
    with pytest.raises(ValueError):
        recommended_anchor_window(prof, min_span_tokens=1)
    with pytest.raises(ValueError):
        recommended_anchor_window(prof, max_miss_frac=1.5)


def test_profile_carries_L_and_inverter_cross_checks(spark):
    """ADVICE r9: the profile carries the L it was built with
    (``min_span_tokens`` column), recommended_anchor_window reads it
    when the parameter is omitted, and a MISMATCHED explicit L raises
    instead of silently shifting every guarantee threshold."""
    from fuserank_spark.pipeline_ext.dedup import recommended_anchor_window

    p = " ".join(f"x{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, f"aa bb {p} cc"), (2, f"dd {p} ee")],
        "doc_id bigint, text string",
    )
    prof = span_length_profile(docs, min_span_tokens=8)
    assert {int(r["min_span_tokens"]) for r in prof.collect()} == {8}
    # L read from the profile itself — same answer as the explicit call
    implicit = recommended_anchor_window(prof, max_miss_frac=0.5)
    explicit = recommended_anchor_window(prof, min_span_tokens=8, max_miss_frac=0.5)
    assert implicit == explicit
    assert implicit["guarantee_tokens"] == 8 + implicit["anchor_window"] - 1
    with pytest.raises(ValueError, match="does not match the"):
        recommended_anchor_window(prof, min_span_tokens=5, max_miss_frac=0.5)
    # a pre-r10 profile shape (no L column) still works with an
    # explicit L, and refuses when L is omitted
    legacy = prof.drop("min_span_tokens")
    assert (
        recommended_anchor_window(legacy, min_span_tokens=8, max_miss_frac=0.5)
        == explicit
    )
    with pytest.raises(ValueError, match="no min_span_tokens column"):
        recommended_anchor_window(legacy, max_miss_frac=0.5)
