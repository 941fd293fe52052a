"""Text embedding operators X1-X4 (reference `src/embed.py`,
`src/encode.py:286-318`).

Production path: a HuggingFace transformer inside an iterator
pandas UDF — model loaded once per executor, rows streamed through
Arrow batches. The model libs aren't in this container, so that path
is gated behind an import-try (X1 stub posture per the build brief).

Test/bench path: DeterministicStubEmbedder — a content-correlated
hashed bag-of-words embedding. Deterministic across processes (md5,
not Python hash()), L2-normalized, so similar texts get similar
vectors and recall harnesses are meaningful.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _token_index(token: str, dim: int) -> int:
    # stable across executors/processes — never builtins.hash (PYTHONHASHSEED)
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big") % dim


class DeterministicStubEmbedder:
    """Hashed bag-of-words stand-in for the HF embedder (same
    interface as `src/embed.py` TextEmbedder.embed)."""

    def __init__(self, dim: int = 64, model_name: str = "stub-hash-bow"):
        self.dim = dim
        self.model_name = model_name

    def embed(self, texts: str | list[str]) -> np.ndarray:
        single = isinstance(texts, str)
        if single:
            texts = [texts]
        out = np.zeros((len(texts), self.dim), dtype="float64")
        for i, t in enumerate(texts):
            if t is None:
                continue
            for tok in str(t).lower().split():
                out[i, _token_index(tok, self.dim)] += 1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        out /= norms
        return out[0] if single else out


class HFEmbedder:
    """X1 (src/embed.py:25-41): tokenizer → model →
    last_hidden_state.mean(dim=1). Parity notes: the reference embeds
    ONE text per call, so the plain (unmasked) token mean never sees
    pad positions — this mirror therefore loops per text rather than
    batch-padding, which would silently change the pooled value.
    Normalization happens downstream (embed_corpus / embed_query),
    exactly as the reference normalizes in src/encode.py.

    Gated: torch/transformers are not installed in this container;
    tests/test_embed_hf.py verifies the gate both ways and checks
    mean-pool parity against a manual forward pass when the libs ARE
    present."""

    def __init__(self, model_name: str = "mixedbread-ai/mxbai-embed-large-v1"):
        try:
            import torch  # noqa: F401
            from transformers import AutoModel, AutoTokenizer  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "HF embedding path requires torch+transformers; use "
                "DeterministicStubEmbedder in this environment"
            ) from e
        self.model_name = model_name  # pragma: no cover
        self._torch = torch  # pragma: no cover
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)  # pragma: no cover
        self.model = AutoModel.from_pretrained(model_name)  # pragma: no cover
        self.model.eval()  # pragma: no cover

    def embed(self, texts: str | list[str]) -> np.ndarray:  # pragma: no cover
        single = isinstance(texts, str)
        if single:
            texts = [texts]
        out = []
        torch = self._torch
        with torch.no_grad():
            for t in texts:
                inputs = self.tokenizer(
                    str(t) if t is not None else "",
                    return_tensors="pt",
                    padding=True,
                    truncation=True,
                )
                hidden = self.model(**inputs).last_hidden_state
                out.append(hidden.mean(dim=1).squeeze(0).cpu().numpy().astype("float64"))
        arr = np.stack(out)
        return arr[0] if single else arr


def embed_corpus(
    df: DataFrame,
    text_encoding_schema: dict[str, float],
    dim: int = 64,
    out_col: str = "text_emb",
    embedder_factory=None,
) -> DataFrame:
    """X2 (src/encode.py:286-318): per-row weighted sum of per-column
    embeddings, L2-normalized — executed as a mapInPandas stage so the
    model loads once per task and rows stream through Arrow batches
    (replaces the reference's manual chunking, SURVEY X2).
    """
    cols = list(text_encoding_schema.keys())
    weights = [float(text_encoding_schema[c]) for c in cols]
    factory = embedder_factory or (lambda: DeterministicStubEmbedder(dim))

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def _embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        emb = factory()  # once per task — X1 executor-local model load
        for pdf in batches:
            acc = None
            for c, w in zip(cols, weights):
                e = emb.embed(pdf[c].fillna("").astype(str).tolist())
                acc = w * e if acc is None else acc + w * e
            norms = np.linalg.norm(acc, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            acc = acc / norms
            pdf = pdf.copy()
            pdf[out_col] = list(acc)
            yield pdf

    return df.mapInPandas(_embed_batches, schema=out_schema)


def embed_query(text: str, dim: int = 64, embedder=None) -> np.ndarray:
    """X3 (src/encode.py:128-131): driver-side single embed +
    L2-normalize."""
    emb = embedder or DeterministicStubEmbedder(dim)
    v = np.asarray(emb.embed(text), dtype="float64").flatten()
    n = np.linalg.norm(v)
    return v / n if n > 0 else v
