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


def _openblas_handle():
    """(set_threads, get_threads) callables for the OpenBLAS mapped
    into this process, or (None, None) when absent (e.g. MKL builds —
    set the usual *_NUM_THREADS env vars before process start there).
    Cached: CDLL on an already-mapped .so is cheap but not free."""
    global _BLAS_FNS
    if _BLAS_FNS is not None:
        return _BLAS_FNS
    import ctypes

    _BLAS_FNS = (None, None)
    try:
        with open("/proc/self/maps") as f:
            libs = sorted(
                {
                    ln.rsplit(" ", 1)[-1].strip()
                    for ln in f
                    if "openblas" in ln.lower()
                }
            )
        for path in libs:
            if not path.startswith("/"):
                continue
            lib = ctypes.CDLL(path)
            for suffix in ("64_", ""):
                s = getattr(lib, f"openblas_set_num_threads{suffix}", None)
                g = getattr(lib, f"openblas_get_num_threads{suffix}", None)
                if s is not None:
                    _BLAS_FNS = (s, g)
                    return _BLAS_FNS
    except Exception:
        pass
    return _BLAS_FNS


_BLAS_FNS = None


def limit_blas_threads(n: int = 1) -> int | None:
    """Best-effort cap on OpenBLAS threads in THIS process. Needed when
    BLAS-heavy work (ProxyTransformerEmbedder) runs inside mapInPandas:
    each of the N parallel python workers would otherwise spawn
    ncpu BLAS threads — N·ncpu-way oversubscription that thrashes
    instead of computing. Called executor-side (the env-var route is
    too late once numpy has loaded).

    Returns the PREVIOUS thread count when control succeeded (pass it
    back to restore), else None. RESTORING MATTERS: pyspark daemon
    workers are REUSED across jobs, so a permanent pin leaks into
    every later numpy/Arrow stage in the session — measured as a
    broad ~1.4× bench-wide slowdown when the proxy bench ran first
    and left all 32 workers single-threaded (BASELINE.md r7)."""
    set_n, get_n = _openblas_handle()
    if set_n is None or get_n is None:
        # No get_ twin (pre-0.3.4 OpenBLAS exports set_ only): pinning
        # would be unrestorable — the exact reused-daemon-worker state
        # leak this function's contract forbids (ADVICE r7) — so treat
        # the library as uncontrollable and leave it alone.
        return None
    prev = int(get_n())
    set_n(int(n))
    return prev


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


class ProxyTransformerEmbedder:
    """Pinned-weight pure-numpy transformer forward pass (VERDICT r6
    missing #1): MiniLM-shaped by default — 6 post-LN encoder layers,
    hidden 384, 12 heads, FFN 1536, BERT-sized vocab — with FROZEN
    seeded weights, so a bench through the same mapInPandas path as
    :class:`HFEmbedder` measures the real matmul-bound compute shape
    of X1 (tokenize → embed+position → L× [attention, FFN] → masked
    mean-pool) without any model download. Reference analog:
    `src/embed.py:25-41` (tokenizer → model → mean over tokens).

    NOT a trained model — outputs are semantically meaningless (use
    DeterministicStubEmbedder for recall harnesses, HFEmbedder when
    torch/transformers exist). What it shares with the real thing is
    the ARITHMETIC: per row, ~6·L_seq·(4d² + 2·L_seq·d + 2·d·d_ffn)
    fused-multiply-adds, ≈2.9 GFLOP at L_seq=128 — vs ~3 KB of text
    I/O, i.e. arithmetic intensity ~10⁶ FLOPs/byte, so throughput is
    BLAS-bound and scales with cores, never with Arrow transfer.

    Mask-correct batching: pad keys are masked out of the attention
    softmax and the mean-pool divides by true lengths, so results are
    batch-composition-invariant (pinned by tests/test_embed_proxy.py)
    — unlike naive padding, which would silently change pooled values
    (the HFEmbedder per-text-loop parity note).

    Weights are generated once per instance from ``seed`` via PCG64 —
    identical on every executor, nothing shipped."""

    def __init__(
        self,
        dim: int = 384,
        layers: int = 6,
        heads: int = 12,
        ffn: int = 1536,
        vocab: int = 30522,
        max_len: int = 128,
        seed: int = 42,
        model_name: str = "proxy-numpy-minilm",
        blas_threads: int | None = None,
    ):
        if dim % heads != 0:
            raise ValueError(f"dim={dim} not divisible by heads={heads}")
        self.dim, self.layers, self.heads = dim, layers, heads
        self.ffn, self.vocab, self.max_len = ffn, vocab, max_len
        self.seed = seed
        self.model_name = model_name
        # executor-side posture: one BLAS thread per python worker —
        # parallelism comes from Spark tasks, not nested threadpools.
        # The pin is applied SCOPED inside embed() and restored after,
        # never at init: daemon workers are reused, and a permanent
        # pin would leak into every later numpy stage of the session
        self._blas_threads = blas_threads
        rng = np.random.Generator(np.random.PCG64(seed))
        s = np.float32(0.02)  # BERT-style init scale keeps activations sane
        def W(*shape):
            # float32 generation directly — ~5× cheaper than f64+astype,
            # and init runs once per TASK in the mapInPandas path
            return rng.standard_normal(shape, dtype=np.float32) * s
        self.tok_emb = W(vocab, dim)
        self.pos_emb = W(max_len, dim)
        self.blocks = [
            {
                "wq": W(dim, dim), "wk": W(dim, dim), "wv": W(dim, dim),
                "wo": W(dim, dim),
                "w1": W(dim, ffn), "b1": W(ffn),
                "w2": W(ffn, dim), "b2": W(dim),
                "ln1_g": np.ones(dim, dtype="float32"), "ln1_b": W(dim),
                "ln2_g": np.ones(dim, dtype="float32"), "ln2_b": W(dim),
            }
            for _ in range(layers)
        ]

    def _token_ids(self, text: str | None) -> np.ndarray:
        toks = str(text or "").lower().split()[: self.max_len]
        if not toks:
            toks = [""]
        return np.array([_token_index(t, self.vocab) for t in toks], dtype="int64")

    @staticmethod
    def _ln(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-12) * g + b

    def embed(self, texts: str | list[str]) -> np.ndarray:
        prev = (
            limit_blas_threads(self._blas_threads) if self._blas_threads else None
        )
        try:
            return self._embed(texts)
        finally:
            if prev is not None:
                limit_blas_threads(prev)

    def _embed(self, texts: str | list[str]) -> np.ndarray:
        single = isinstance(texts, str)
        if single:
            texts = [texts]
        if not texts:
            # an Arrow batch can be empty — mirror the stub's contract
            return np.zeros((0, self.dim), dtype="float64")
        ids = [self._token_ids(t) for t in texts]
        # length-sorted micro-batches: (a) the (n·h·L·L) attention
        # intermediates of a whole Arrow batch blow the cache and turn
        # 32 concurrent workers memory-bandwidth-bound (measured 5×
        # per-task slowdown at batch=62); (b) sorting by length keeps
        # pad waste near zero per chunk. Mask-correct batching makes
        # the outputs invariant to this grouping (pinned in tests).
        CHUNK = 8
        if len(ids) > CHUNK:
            order = sorted(range(len(ids)), key=lambda i: len(ids[i]))
            out = np.empty((len(ids), self.dim), dtype="float64")
            for s0 in range(0, len(order), CHUNK):
                sel = order[s0 : s0 + CHUNK]
                out[sel] = self._forward([ids[i] for i in sel])
            return out[0] if single else out
        out = self._forward(ids)
        return out[0] if single else out

    def _forward(self, ids: list[np.ndarray]) -> np.ndarray:
        n = len(ids)
        L = max(len(i) for i in ids)
        d, h = self.dim, self.heads
        hd = d // h
        x = np.zeros((n, L, d), dtype="float32")
        mask = np.zeros((n, L), dtype="float32")  # 1 = real token
        for i, tid in enumerate(ids):
            x[i, : len(tid)] = self.tok_emb[tid] + self.pos_emb[: len(tid)]
            mask[i, : len(tid)] = 1.0
        # additive key mask: pad keys get -inf-ish before softmax
        kmask = (1.0 - mask)[:, None, None, :] * np.float32(-1e9)
        for blk in self.blocks:
            # self-attention (post-LN residual block)
            q = (x @ blk["wq"]).reshape(n, L, h, hd).transpose(0, 2, 1, 3)
            k = (x @ blk["wk"]).reshape(n, L, h, hd).transpose(0, 2, 1, 3)
            v = (x @ blk["wv"]).reshape(n, L, h, hd).transpose(0, 2, 1, 3)
            scores = q @ k.transpose(0, 1, 3, 2) / np.float32(np.sqrt(hd))
            scores = scores + kmask
            scores -= scores.max(-1, keepdims=True)
            att = np.exp(scores)
            att /= att.sum(-1, keepdims=True)
            ctx = (att @ v).transpose(0, 2, 1, 3).reshape(n, L, d)
            x = self._ln(x + ctx @ blk["wo"], blk["ln1_g"], blk["ln1_b"])
            # FFN with GELU (tanh approximation — the BERT one)
            hdn = x @ blk["w1"] + blk["b1"]
            hdn = 0.5 * hdn * (
                1.0 + np.tanh(np.float32(0.7978845608) * (hdn + 0.044715 * hdn**3))
            )
            x = self._ln(x + hdn @ blk["w2"] + blk["b2"], blk["ln2_g"], blk["ln2_b"])
        # masked mean-pool over REAL tokens only (batch-invariant)
        pooled = (x * mask[:, :, None]).sum(1) / mask.sum(1)[:, None]
        return pooled.astype("float64")


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
