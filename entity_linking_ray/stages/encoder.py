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


class NumpyBiEncoder:
    """Bi-encoder forward pass in plain numpy with the REFERENCE's pooling
    math (bi_encoder.py:39-83), demonstrable weight-for-weight:

    - base "model": a deterministic token+position embedding table standing in
      for the transformer's last_hidden_state (the sandbox has no torch and no
      pretrained weights; every downstream op — pooling, head, scoring — is
      the reference formula exactly),
    - pooling 'cls': ``last_hidden_state[:, 0]`` (bi_encoder.py:44,67 — the
      BERT path),
    - pooling 'mean': ``sum(seq_out * mask) / clamp(sum(mask), 1e-9)``
      (bi_encoder.py:47-50,70-76 — the RoBERTa/DeCLUTR path),
    - head: ``x @ W.T + b`` — the fc_me/fc_ee Linear(hidden, dim)
      (bi_encoder.py:36-37).

    Weights round-trip through a Parquet artifact (``save_weights`` /
    ``from_weights``) — the checkpoint-reader analog of
    compute_embeddings.py:46-52. One deliberate divergence: output is
    L2-normalized so dot == cosine, matching this engine's scoring contract
    (the untrained reference scores raw dots; normalization only rescales).
    """

    def __init__(self, dim: int = 128, hidden: int = 768, vocab_size: int = 30000,
                 seq_len: int = 64, pooling: str = "mean", seed: int = 42,
                 weights: dict | None = None, normalize: bool = True):
        assert pooling in ("cls", "mean")
        self.dim, self.hidden, self.pooling = dim, hidden, pooling
        self.vocab_size, self.seq_len = vocab_size, seq_len
        self.normalize = normalize
        if weights is None:
            rng = np.random.default_rng(seed + 2000)
            weights = {
                "tok_emb": (rng.standard_normal((vocab_size, hidden)) / np.sqrt(hidden)).astype(np.float32),
                "pos_emb": (rng.standard_normal((seq_len, hidden)) / np.sqrt(hidden)).astype(np.float32),
                "head_w": (rng.standard_normal((dim, hidden)) / np.sqrt(hidden)).astype(np.float32),
                "head_b": rng.standard_normal(dim).astype(np.float32) * 0.01,
            }
        self.w = weights

    # --- weight artifact (Parquet round-trip, S6/K6 analog) ---
    def save_weights(self, path: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = []
        for name, arr in self.w.items():
            rows.append({
                "name": name,
                "shape": list(np.asarray(arr).shape),
                "data": np.ascontiguousarray(arr, dtype=np.float32).tobytes(),
            })
        pq.write_table(pa.Table.from_pylist(rows), path)

    @classmethod
    def from_weights(cls, path: str, **kw):
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        w = {}
        for r in t.to_pylist():
            w[r["name"]] = np.frombuffer(r["data"], dtype=np.float32).reshape(r["shape"])
        vocab, hidden = w["tok_emb"].shape
        seq_len = w["pos_emb"].shape[0]
        dim = w["head_w"].shape[0]
        return cls(dim=dim, hidden=hidden, vocab_size=vocab, seq_len=seq_len,
                   weights=w, **kw)

    # --- the reference forward pass ---
    def last_hidden_state(self, ids: np.ndarray) -> np.ndarray:
        """(n, L, hidden) stand-in for the transformer encoder output."""
        return self.w["tok_emb"][ids] + self.w["pos_emb"][None, : ids.shape[1]]

    def forward(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """(n, L) int ids + mask -> (n, dim) float32, reference pooling+head."""
        seq = self.last_hidden_state(ids)
        if self.pooling == "cls":
            pooled = seq[:, 0]  # last_hidden_state[:, 0]
        else:
            m = mask.astype(np.float32)[:, :, None]
            pooled = (seq * m).sum(axis=1) / np.maximum(
                m.sum(axis=1), 1e-9  # torch.clamp(sum(mask), min=1e-9)
            )
        out = pooled @ self.w["head_w"].T + self.w["head_b"]
        if self.normalize:
            out = out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out.astype(np.float32)

    def embed_token_hashes(self, token_hash_rows: list[np.ndarray]) -> np.ndarray:
        """FeaturizeStage adapter: token hashes -> padded id/mask sequences ->
        forward. Hash tokens map into the non-special id range, mirroring the
        vocab-hash tokenizer (stages/tokenize.py)."""
        from .tokenize import CLS_ID, N_SPECIAL, PAD_ID, SEP_ID

        n = len(token_hash_rows)
        L = self.seq_len
        ids = np.full((n, L), PAD_ID, dtype=np.int64)
        mask = np.zeros((n, L), dtype=np.int64)
        slots = np.uint64(self.vocab_size - N_SPECIAL)
        for i, th in enumerate(token_hash_rows):
            body = (N_SPECIAL + (th[: L - 2].astype(np.uint64) % slots)).astype(np.int64)
            k = body.shape[0]
            ids[i, 0] = CLS_ID
            ids[i, 1: 1 + k] = body
            ids[i, 1 + k] = SEP_ID
            mask[i, : 2 + k] = 1
        return self.forward(ids, mask)


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
    if kind == "numpy_bi":
        # smaller hidden/vocab than the 768/30k defaults: this is the flagship
        # featurize hot loop, and the pooling/head math is identical at any size
        return NumpyBiEncoder(dim=dim, hidden=256, vocab_size=8192, seq_len=64,
                              pooling="mean", seed=seed)
    if kind == "torch":
        return TorchBiEncoder(dim=dim, seed=seed)
    raise ValueError(f"unknown encoder backend: {kind!r}")
