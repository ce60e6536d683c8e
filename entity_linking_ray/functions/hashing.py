"""Deterministic hashing kernels (no PYTHONHASHSEED dependence).

Everything here must produce identical output across processes and across
parallelism levels — cluster labels, blocking keys, and row ids all derive from
these, and the scaling criterion (same clusters at num_cpus=8 vs 32) depends on
full determinism. Python's builtin ``hash()`` is salted per-process and is
therefore banned in this package.

Reference anchors: the reference keys entities by 16-hex-char document ids
(/root/reference/src/transform_zeshel.py:49); we mirror that with a 16-hex
``row_id`` derived from (repo, path, commit), plus a ``sha256(content)`` column
that the north rule requires preserved end-to-end.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np



def sha256_hex(texts: list[str] | np.ndarray) -> list[str]:
    """Per-row sha256 hex digest of UTF-8 content (the end-to-end invariant)."""
    return [hashlib.sha256(t.encode("utf-8", "surrogatepass")).hexdigest() for t in texts]


def sha256_hex_and_words(texts) -> tuple[list[str], np.ndarray]:
    """One digest pass -> (hex strings, (n, 4) int64 key words).

    The words are the digest split into four lanes, each masked to 63 bits
    (int64-pure: uint64 values >= 2^63 trip Ray aggregates into pickled
    extension columns — see hex16_to_node). Grouping on all four words is
    grouping on 252 bits of sha256: collision expectation at 10^12 rows is
    ~1e-52 — exact for any physical corpus.
    """
    digs = [hashlib.sha256(t.encode("utf-8", "surrogatepass")).digest() for t in texts]
    if digs:
        m = np.frombuffer(b"".join(digs), dtype=np.uint64).reshape(-1, 4)
        words = (m & np.uint64((1 << 63) - 1)).astype(np.int64)
    else:
        words = np.empty((0, 4), dtype=np.int64)
    return [d.hex() for d in digs], words


def row_id_hex(repos: list[str], paths: list[str], commits: list[str]) -> list[str]:
    """Stable 16-hex row id from the (repo, path, commit) natural key.

    Mirrors the reference's 16-hex document_id key space
    (transform_zeshel.py:49) while being derivable from the input columns.
    """
    out = []
    for r, p, c in zip(repos, paths, commits):
        h = hashlib.sha1(f"{r}\x00{p}\x00{c}".encode("utf-8", "surrogatepass")).hexdigest()
        out.append(h[:16].upper())
    return out


def hex16_to_node(hex_ids: list[str]) -> np.ndarray:
    """Numeric node id for union-find: the 16-hex row id masked to 63 bits,
    as int64.

    63-bit ids are used for fast numeric min-aggregation in the clustering
    rounds. int64 (not uint64) is deliberate: values >= 2^63 trip Ray Data's
    aggregate output into a pickled-python-object extension column that
    crashes Arrow hash joins (found by tests). At 10^12 rows the birthday
    collision expectation over 2^63 is ~60 pairs — production deployments
    should widen to the full hex id (string min works identically, slower);
    tests assert zero collisions on their corpora.
    """
    mask = (1 << 63) - 1
    return np.array([int(h, 16) & mask for h in hex_ids], dtype=np.int64)


# backwards-compat alias (early modules imported the uint64 name)
hex16_to_uint64 = hex16_to_node


def crc32_tokens(tokens: list[bytes]) -> np.ndarray:
    """Deterministic 32-bit hash per token (zlib.crc32 — C speed, stable)."""
    return np.array([zlib.crc32(t) for t in tokens], dtype=np.uint64)


def rolling_shingle_hashes(token_hashes: np.ndarray, w: int) -> np.ndarray:
    """Vectorized w-token shingle hashes from per-token 32-bit hashes.

    Combines w consecutive token hashes with a polynomial in a fixed odd
    multiplier over Z/2^64, then folds to 32 bits. Avoids materializing shingle
    strings entirely (the reference tokenizes strings row-by-row,
    zeshel_dataset.py:66-76; we keep the hot path numeric).
    """
    n = token_hashes.shape[0]
    if n < w:
        if n == 0:
            return np.empty(0, dtype=np.uint64)
        w = n  # degrade gracefully: one shingle over everything available
    mult = np.uint64(0x9E3779B97F4A7C15)
    acc = np.zeros(n - w + 1, dtype=np.uint64)
    for k in range(w):
        acc = acc * mult + token_hashes[k : n - w + 1 + k]
    # fold 64 -> 32 bits so the MinHash universal hash gets x < 2^32
    return (acc ^ (acc >> np.uint64(32))) & np.uint64(0xFFFFFFFF)


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-permutation hash keys (and xor-tweaks) for keyed-mixer MinHash.

    Each permutation p ranks shingles by ``splitmix64(x ^ key_p)`` — a full
    64-bit avalanche bijection under a random key, so the per-permutation
    orderings are effectively independent (a plain ``a*x+b mod p`` family with
    bounded operands never wraps and degenerates to a monotone map — all
    permutations then agree on the same argmin and the Jaccard estimator
    collapses; caught by tests/test_functions.py).
    """
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    tweaks = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return keys, tweaks


def minhash_signatures(
    shingle_hashes: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_rows, num_perm) uint32 MinHash signatures, batch-vectorized.

    All rows' shingle hashes are concatenated once; each of the num_perm keyed
    mixers is applied to the whole concatenation and the per-row minimum is
    taken with ``np.minimum.reduceat`` — one pass of C loops per permutation
    instead of a Python loop per row.
    """
    num_perm = a.shape[0]
    lens = np.array([h.shape[0] for h in shingle_hashes], dtype=np.int64)
    n = lens.shape[0]
    sig = np.full((n, num_perm), 0xFFFFFFFF, dtype=np.uint32)
    nonempty = lens > 0
    if not nonempty.any():
        return sig
    flat = np.concatenate([h for h in shingle_hashes if h.shape[0] > 0])
    offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offsets[1:])
    rows = np.flatnonzero(nonempty)
    for p in range(num_perm):
        hp = splitmix64(flat ^ a[p]) + b[p]  # keyed avalanche; +tweak decorrelates further
        mins = np.minimum.reduceat(hp, offsets)
        sig[rows, p] = (mins & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return sig


def oph_signatures(
    shingle_hashes: list[np.ndarray], num_perm: int, seed: int
) -> np.ndarray:
    """(n_rows, num_perm) uint32 one-permutation-hashing MinHash signatures.

    Classic k-min MinHash (``minhash_signatures``) streams every shingle
    through ``num_perm`` keyed mixers — ~num_perm full memory passes per
    batch, which saturates a single node's memory bandwidth long before its
    cores (the measured reason featurize scaled only ~2.4x from 8->32 CPUs).
    OPH ("One permutation hashing", Li/Owen/Zhang, NeurIPS 2012) hashes each
    shingle ONCE, buckets it into ``num_perm`` bins by its low bits, and
    takes the per-bin minimum of the high 32 bits; empty bins borrow the
    nearest non-empty bin to the right, cyclically (rotation densification,
    Shrivastava & Li 2014) so band keys stay well-defined for short rows.
    ~1/num_perm of the memory traffic; the matching-bin fraction remains an
    unbiased Jaccard estimator.

    Deterministic per row (independent of batch composition / parallelism).
    """
    n = len(shingle_hashes)
    SENT = np.uint32(0xFFFFFFFF)
    sig = np.full((n, num_perm), SENT, dtype=np.uint32)
    lens = np.array([h.shape[0] for h in shingle_hashes], dtype=np.int64)
    if not (lens > 0).any():
        return sig
    key = np.uint64(0xA076_1D64_78BD_642F) ^ (
        splitmix64(np.array([seed], dtype=np.uint64))[0]
    )
    flat = np.concatenate([h for h in shingle_hashes if h.shape[0] > 0])
    h = splitmix64(flat ^ key)
    # num_perm is a power of two in every config: & replaces the (much
    # slower) 64-bit modulo without changing a single bin assignment
    if num_perm & (num_perm - 1) == 0:
        bins = (h & np.uint64(num_perm - 1)).astype(np.int64)
    else:
        bins = (h % np.uint64(num_perm)).astype(np.int64)
    rows = np.repeat(np.flatnonzero(lens > 0), lens[lens > 0])
    combined = rows * num_perm + bins
    n_slots = n * num_perm
    if n_slots <= (1 << 32):
        # fused path: pack (slot << 32 | value) into one uint64 and plain-sort
        # — the first element of each slot run IS the per-(row, bin) minimum.
        # One unstable sort with no permutation array replaces the stable
        # argsort + two takes + reduceat chain (the measured hot spot of the
        # whole featurize stage); the mins are bit-identical by construction.
        packed = (combined.astype(np.uint64) << np.uint64(32)) | (
            h >> np.uint64(32)
        )
        packed.sort()
        slot = (packed >> np.uint64(32)).astype(np.int64)
        starts = np.flatnonzero(np.diff(slot, prepend=slot[0] - 1))
        mins = (packed[starts] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        combined = slot  # slot ids in sorted order (for the scatter below)
    else:
        vals = (h >> np.uint64(32)).astype(np.uint32)
        order = np.argsort(combined, kind="stable")
        combined = combined[order]
        vals = vals[order]
        starts = np.flatnonzero(np.diff(combined, prepend=combined[0] - 1))
        mins = np.minimum.reduceat(vals, starts)
    sig.ravel()[combined[starts]] = mins
    # bin emptiness is tracked EXPLICITLY: a legitimate min equal to the
    # 0xFFFFFFFF fill value (p ~ 2^-32 per bin) must not be densified away
    nonempty = np.zeros((n, num_perm), dtype=bool)
    nonempty.ravel()[combined[starts]] = True

    if not nonempty.all():
        # rotation densification: nearest non-empty bin to the right, cyclic
        two = np.concatenate([sig, sig], axis=1)
        ne2 = np.concatenate([nonempty, nonempty], axis=1)
        b2 = 2 * num_perm
        idx = np.arange(b2)
        cand = np.where(ne2, idx, b2)
        nxt = np.minimum.accumulate(cand[:, ::-1], axis=1)[:, ::-1][:, :num_perm]
        has_any = nxt[:, 0] < b2  # rows with at least one non-empty bin
        src = np.minimum(nxt, b2 - 1)
        filled = np.take_along_axis(two, src, axis=1)
        sig = np.where(has_any[:, None], filled, sig)
    return sig


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_rows, bands) int64 LSH band keys from (n_rows, num_perm) signatures.

    Each band's r signature values are mixed FNV-style; the band index sits in
    bits 56..62 so keys from different bands never collide. Keys stay below
    2^63 (int64, non-negative) — see hex16_to_node for why 64-bit unsigned
    values are banned from keyed/aggregated columns.
    """
    n, num_perm = sig.shape
    r = num_perm // bands
    assert bands <= 128
    out = np.empty((n, bands), dtype=np.int64)
    prime = np.uint64(0x100000001B3)
    for j in range(bands):
        h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
        for k in range(r):
            h = (h ^ sig[:, j * r + k].astype(np.uint64)) * prime
        out[:, j] = ((np.uint64(j) << np.uint64(56)) ^ (h >> np.uint64(8))).astype(np.int64)
    return out


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Fast deterministic uint64 mixer (for salting shard assignment).

    In-place ops over one reused shift buffer: the expression form allocated
    six temporaries per call — at featurize scale (multi-10^7-element inputs,
    bandwidth-bound stage) the extra memory passes were measurable."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    t = x >> np.uint64(30)
    x ^= t
    x *= np.uint64(0xBF58476D1CE4E5B9)
    np.right_shift(x, np.uint64(27), out=t)
    x ^= t
    x *= np.uint64(0x94D049BB133111EB)
    np.right_shift(x, np.uint64(31), out=t)
    x ^= t
    return x
