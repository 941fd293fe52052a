"""Randomized property evidence for the session's algorithmic cores:

- code_hamming_pairs == the exact all-pairs Hamming filter (numpy
  reference) for random signed-64-bit codes across valid
  (bands, max_hamming) combos — the pigeonhole losslessness, fuzzed.
- heavy_hitters == collections.Counter exact heavy hitters (items AND
  counts) for random zipf-ish streams across budgets inside the
  guarantee region.

Hypothesis drives the shapes; each example is cheap (hundreds of
rows), deterministic seeds, no health-check suppression needed beyond
the session-scoped Spark fixture.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fuserank_spark.pipeline_ext.curation import heavy_hitters
from fuserank_spark.pipeline_ext.dedup import code_hamming_pairs

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    data=st.data(),
    bands=st.sampled_from([2, 4, 8]),
    n=st.integers(min_value=5, max_value=60),
)
def test_code_hamming_pairs_matches_exact_allpairs(spark, data, bands, n):
    max_h = data.draw(st.integers(min_value=0, max_value=bands - 1))
    # bias toward clustered codes so pairs actually occur: draw a few
    # anchors, then per row either an anchor, a near-anchor flip, or
    # fresh randomness
    anchors = data.draw(
        st.lists(st.integers(-(2**63), 2**63 - 1), min_size=2, max_size=4)
    )
    codes = []
    for i in range(n):
        kind = data.draw(st.integers(0, 2))
        if kind == 0:
            codes.append(anchors[i % len(anchors)])
        elif kind == 1:
            flip = data.draw(st.integers(0, 63))
            codes.append(anchors[i % len(anchors)] ^ (1 << flip))
        else:
            codes.append(data.draw(st.integers(-(2**63), 2**63 - 1)))
    # two's-complement wrap into signed range
    codes = [(c + 2**63) % 2**64 - 2**63 for c in codes]
    pdf = pd.DataFrame({"doc_id": range(n), "code": codes})
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in code_hamming_pairs(
            spark.createDataFrame(pdf), "code", bits=64, bands=bands,
            max_hamming=max_h, max_bucket_size=10**9,
        ).collect()
    }
    exp = set()
    for i in range(n):
        for j in range(i + 1, n):
            h = bin((codes[i] ^ codes[j]) & (2**64 - 1)).count("1")
            if h <= max_h:
                exp.add((i, j, h))
    assert got == exp


@settings(**_SETTINGS)
@given(
    seed=st.integers(0, 2**31),
    budget=st.sampled_from([16, 64, 512]),
    min_count=st.sampled_from([30, 80]),
)
def test_heavy_hitters_matches_counter(spark, seed, budget, min_count):
    import random
    from collections import Counter

    rng = random.Random(seed)
    items = []
    for _ in range(1500):
        r = rng.random()
        if r < 0.4:
            items.append(f"hot{rng.randrange(4)}")
        elif r < 0.7:
            items.append(f"warm{rng.randrange(25)}")
        else:
            items.append(f"cold{rng.randrange(10_000)}")
    n = len(items)
    if min_count <= n / (budget + 1):
        with pytest.raises(ValueError, match="raise budget"):
            heavy_hitters(
                spark.createDataFrame(pd.DataFrame({"item": items})),
                "item", min_count=min_count, budget=budget,
            ).collect()
        return
    got = {
        (r["item"], r["count"])
        for r in heavy_hitters(
            spark.createDataFrame(pd.DataFrame({"item": items})).repartition(7),
            "item", min_count=min_count, budget=budget,
        ).collect()
    }
    exp = {(i, c) for i, c in Counter(items).items() if c >= min_count}
    assert got == exp
