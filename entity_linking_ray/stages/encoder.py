"""Embedding encoders — the dual-tower analog.

The reference embeds both sides of a match into a shared 128-d space with a
bi-encoder (two transformer towers + 768->128 linear heads,
/root/reference/src/bi_encoder.py:12-37) and scores with a dot product
(bi_encoder.py:96, eval_zeshel.py:44). This module reproduces that *contract* —
``embed(texts) -> float32[n, d]``, unit-norm so dot == cosine — with two
backends:

- ``HashingEncoder`` (default): a deterministic feature-hashing bag-of-tokens
  projection through a seeded dense head. No model downloads, identical output
  across processes — this is what tests, oracles and benchmarks use.
- ``TorchBiEncoder``: gated behind an import-try; raises with a clear message
  in this environment (no torch / no network). The Ray-side plumbing (actor
  pool, batching, caching) is identical for both.

Encoders are *stateful stage payloads*: constructed once per actor in
``__init__`` (the analog of ``BiEncoder.load_from_checkpoint`` once per
process, compute_embeddings.py:46-52), then applied per batch.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import splitmix64


class HashingEncoder:
    """Deterministic bag-of-token-hashes embedding with a seeded linear head.

    Pipeline per row: token hashes -> signed feature hashing into ``buckets``
    dims (sublinear tf) -> L2 normalize -> seeded dense head (buckets x d,
    the analog of the reference's fc_me/fc_ee 768->128 heads,
    bi_encoder.py:36-37) -> L2 normalize. Towers share weights (an untrained
    bi-encoder with tied towers), so identical content embeds identically and
    dot product == cosine similarity.
    """

    def __init__(self, dim: int = 128, buckets: int = 1024, seed: int = 42):
        self.dim = dim
        self.buckets = buckets
        rng = np.random.default_rng(seed + 1000)
        w = rng.standard_normal((buckets, dim)).astype(np.float32)
        w /= np.linalg.norm(w, axis=1, keepdims=True) + 1e-12
        self.head = w  # "model weights", loaded once per actor

    def embed_token_hashes(self, token_hash_rows: list[np.ndarray]) -> np.ndarray:
        """float32[n, dim] unit-norm embeddings from per-row token hashes."""
        n = len(token_hash_rows)
        feats = np.zeros((n, self.buckets), dtype=np.float32)
        nb = np.uint64(self.buckets)
        for i, th in enumerate(token_hash_rows):
            if th.shape[0] == 0:
                continue
            mixed = splitmix64(th.astype(np.uint64))
            idx = (mixed % nb).astype(np.int64)
            sign = np.where((mixed >> np.uint64(32)) & np.uint64(1), 1.0, -1.0).astype(np.float32)
            np.add.at(feats[i], idx, sign)
        # sublinear tf then L2 norm
        feats = np.sign(feats) * np.log1p(np.abs(feats))
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        feats /= np.maximum(norms, 1e-12)
        out = feats @ self.head
        out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out.astype(np.float32)


class TorchBiEncoder:
    """HF/torch bi-encoder backend (reference bi_encoder.py:12-83 semantics:
    CLS or masked-mean pooling + linear 768->embed_dim head).

    Unavailable in this sandbox (no torch, no network); the class exists so the
    stage wiring is real and a weights-equipped deployment can drop it in.
    """

    def __init__(self, dim: int = 128, seed: int = 42, checkpoint: str | None = None):
        try:
            import torch  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "TorchBiEncoder requires torch/transformers, which are not in "
                "this environment. Use encoder='hashing'."
            ) from e
        raise NotImplementedError("torch backend wiring requires model weights")


def build_encoder(kind: str, dim: int = 128, seed: int = 42):
    if kind == "hashing":
        return HashingEncoder(dim=dim, seed=seed)
    if kind == "torch":
        return TorchBiEncoder(dim=dim, seed=seed)
    raise ValueError(f"unknown encoder backend: {kind!r}")
