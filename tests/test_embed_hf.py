"""Real-embedder gate + parity (X1, reference src/embed.py:25-41).

The container ships without torch/transformers, so the REAL check
here is the gate itself (NotImplementedError, stub twin untouched);
the parity test runs wherever the libs exist and skips cleanly
otherwise — both directions of the gating are exercised.
"""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

HAVE_HF = (
    importlib.util.find_spec("torch") is not None
    and importlib.util.find_spec("transformers") is not None
)

TINY_MODEL = "hf-internal-testing/tiny-random-bert"


def test_hf_gate_raises_cleanly_without_libs():
    from fuserank_spark.embed import HFEmbedder

    if HAVE_HF:
        pytest.skip("torch/transformers present — gate inactive here")
    with pytest.raises(NotImplementedError, match="torch"):
        HFEmbedder()


def test_stub_unaffected_by_gate():
    """The stub twin must work regardless of whether HF libs exist —
    a heterogeneous cluster must not flip embedders per executor."""
    from fuserank_spark.embed import DeterministicStubEmbedder

    v = DeterministicStubEmbedder(16).embed("hello world")
    assert v.shape == (16,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12


@pytest.mark.skipif(not HAVE_HF, reason="torch/transformers not installed")
def test_hf_meanpool_parity_tiny_model():
    """HFEmbedder.embed == manual tokenizer→model→mean(dim=1) forward
    pass (the reference's exact pooling, src/embed.py:36-40), on any
    tiny public model; also checks the single-vs-list contract."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    from fuserank_spark.embed import HFEmbedder

    try:
        emb = HFEmbedder(TINY_MODEL)
    except OSError:
        pytest.skip("tiny model weights not available offline")

    text = "a small parity check"
    got = emb.embed(text)

    tok = AutoTokenizer.from_pretrained(TINY_MODEL)
    model = AutoModel.from_pretrained(TINY_MODEL)
    model.eval()
    with torch.no_grad():
        ref = (
            model(**tok(text, return_tensors="pt", padding=True, truncation=True))
            .last_hidden_state.mean(dim=1)
            .squeeze(0)
            .numpy()
            .astype("float64")
        )
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    batch = emb.embed([text, "another one"])
    assert batch.shape[0] == 2
    np.testing.assert_allclose(batch[0], ref, rtol=1e-6)


@pytest.mark.skipif(not HAVE_HF, reason="torch/transformers not installed")
def test_hf_embedder_plugs_into_corpus_embed(spark):
    """embed_corpus accepts an HF factory unchanged — the mapInPandas
    stage is embedder-agnostic (X2 contract)."""
    from fuserank_spark.embed import HFEmbedder, embed_corpus

    df = spark.createDataFrame([(1, "spark"), (2, "flink")], "id long, text string")
    try:
        out = embed_corpus(
            df, {"text": 1.0}, embedder_factory=lambda: HFEmbedder(TINY_MODEL)
        ).collect()
    except Exception as e:  # model download blocked → still a clean skip
        pytest.skip(f"tiny model unavailable: {e}")
    assert len(out) == 2
    for r in out:
        v = np.asarray(r.text_emb)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-6
