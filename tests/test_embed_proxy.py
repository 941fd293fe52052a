"""ProxyTransformerEmbedder (VERDICT r6 missing #1): the pinned-weight
pure-numpy transformer that anchors the X1 bench without downloads.
Pins: frozen-seed determinism, mask-correct batching (batch-
composition-invariant outputs), truncation, and the mapInPandas
embed_corpus path end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from fuserank_spark.embed import ProxyTransformerEmbedder, embed_corpus

# small shape for tests — same code path, seconds not minutes
SMALL = dict(dim=48, layers=2, heads=4, ffn=96, vocab=512, max_len=16, seed=7)


def test_proxy_deterministic_across_instances():
    a = ProxyTransformerEmbedder(**SMALL)
    b = ProxyTransformerEmbedder(**SMALL)
    texts = ["alpha beta gamma", "one", "", "repeated repeated repeated"]
    ea, eb = a.embed(texts), b.embed(texts)
    assert ea.shape == (4, SMALL["dim"])
    np.testing.assert_array_equal(ea, eb)
    # a different seed is a different (frozen) model
    c = ProxyTransformerEmbedder(**{**SMALL, "seed": 8})
    assert not np.allclose(ea, c.embed(texts))


def test_proxy_batch_composition_invariant():
    """Pad keys are masked out of the softmax and the pool divides by
    true length, so a text embeds identically alone or batched with
    longer neighbours — the property naive padding breaks."""
    emb = ProxyTransformerEmbedder(**SMALL)
    short = "tiny doc"
    long = "a much longer document with many more tokens than the short one"
    alone = emb.embed(short)
    batched = emb.embed([short, long])[0]
    np.testing.assert_allclose(alone, batched, atol=1e-5)
    # single-string and list-of-one agree exactly
    np.testing.assert_array_equal(emb.embed([short])[0], alone)


def test_proxy_truncation_and_empty():
    emb = ProxyTransformerEmbedder(**SMALL)
    base = " ".join(f"w{i}" for i in range(SMALL["max_len"]))
    over = base + " extra tokens beyond the cap"
    np.testing.assert_array_equal(emb.embed(base), emb.embed(over))
    # None/empty embed to a finite vector (the empty-token fallback)
    e = emb.embed([None, ""])
    assert np.isfinite(e).all()
    # an empty Arrow batch embeds to a (0, dim) array, not a crash
    assert emb.embed([]).shape == (0, SMALL["dim"])


def test_proxy_shape_guard():
    with pytest.raises(ValueError, match="divisible"):
        ProxyTransformerEmbedder(dim=50, heads=4)


def test_blas_pin_is_scoped_and_restored():
    """BASELINE.md r7 regression: pyspark daemon workers are REUSED,
    so the one-BLAS-thread pin must be scoped to the forward pass and
    restored after — a permanent pin leaked into every later numpy
    stage of the session (measured ~1.4× bench-wide)."""
    from fuserank_spark.embed import _openblas_handle, limit_blas_threads

    set_n, get_n = _openblas_handle()
    if set_n is None or get_n is None:
        pytest.skip("no controllable OpenBLAS in this build")
    before = int(get_n())
    emb = ProxyTransformerEmbedder(**SMALL, blas_threads=1)
    emb.embed(["scoped pin check", "two docs"])
    assert int(get_n()) == before, "embed() must restore the BLAS thread count"
    # the helper itself round-trips
    prev = limit_blas_threads(1)
    assert int(get_n()) == 1
    limit_blas_threads(prev)
    assert int(get_n()) == before


def test_proxy_through_embed_corpus(spark):
    """The same mapInPandas path HFEmbedder rides: weights generated
    executor-side from the seed (nothing shipped), output dim = the
    proxy's hidden size, values match a driver-side forward pass."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 3}") for i in range(20)],
        "row_id bigint, text string",
    )
    out = embed_corpus(
        df, {"text": 1.0},
        embedder_factory=lambda: ProxyTransformerEmbedder(**SMALL),
    )
    rows = {r["row_id"]: r["text_emb"] for r in out.collect()}
    assert len(rows) == 20 and len(rows[0]) == SMALL["dim"]
    ref = ProxyTransformerEmbedder(**SMALL)
    want = ref.embed("document number 7 about topic 1")
    want = want / np.linalg.norm(want)  # embed_corpus L2-normalizes
    np.testing.assert_allclose(np.array(rows[7]), want, atol=1e-6)
