"""Similarity kernels: signature-Jaccard, dot-product scoring, token Levenshtein.

The dense dot-product mirrors the reference's scoring — ``np.matmul(me, ee.T)``
(reference src/eval_zeshel.py:44, src/bi_encoder.py:96). Jaccard is estimated
from MinHash signatures (no token sets are shipped through the shuffle); exact
token-sequence Levenshtein is the borderline fallback mandated by the north
rule, computed over capped token-hash sequences so it never touches multi-MB
strings.
"""

from __future__ import annotations

import numpy as np


def sig_jaccard_matrix(sigs: np.ndarray) -> np.ndarray:
    """All-pairs estimated Jaccard from (n, num_perm) uint32 signatures.

    For block-local scoring: n is capped by the blocking stage (<= block cap),
    so the (n, n, num_perm) broadcast stays small.
    """
    eq = sigs[:, None, :] == sigs[None, :, :]
    return eq.mean(axis=2)


def dot_score_matrix(emb: np.ndarray) -> np.ndarray:
    """All-pairs dot product of (n, d) embeddings — eval_zeshel.py:44 semantics."""
    return emb @ emb.T


def token_levenshtein_ratio(a: np.ndarray, b: np.ndarray) -> float:
    """Similarity ratio 1 - dist/max_len over token-hash sequences (uint32/uint64).

    Vectorized DP: one numpy pass per row of the (len(a)+1, len(b)+1) table.
    Callers cap sequence length (default 256 tokens) — this is the *fallback*
    for borderline pairs only, never the bulk path.
    """
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    idx = np.arange(lb + 1, dtype=np.int32)
    prev = idx.copy()
    cur = np.empty(lb + 1, dtype=np.int32)
    for i in range(1, la + 1):
        cur[0] = i
        sub = prev[:-1] + (b != a[i - 1])
        ins = prev[1:] + 1
        np.minimum(sub, ins, out=cur[1:])
        # deletion propagation cur[j] = min(cur[j], cur[j-1]+1) as a prefix-min:
        # cur[j] = j + min_{k<=j}(cur[k] - k)
        np.minimum.accumulate(cur - idx, out=cur)
        cur += idx
        prev, cur = cur, prev
    dist = int(prev[lb])
    return 1.0 - dist / max(la, lb)


def simhash64(token_h: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash over token hashes (expanded to 64 bits via splitmix)."""
    from .hashing import splitmix64

    if token_h.shape[0] == 0:
        return 0
    h64 = splitmix64(token_h.astype(np.uint64))
    bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.float64)
    if weights is None:
        weights = np.ones(h64.shape[0])
    v = (bits * 2 - 1) * weights[:, None]
    acc = v.sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)
