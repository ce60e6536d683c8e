"""Unit tests for the deterministic hashing / text / similarity kernels."""

import numpy as np
import pytest

from entity_linking_ray.functions.hashing import (
    band_keys,
    hex16_to_node,
    minhash_params,
    minhash_signatures,
    rolling_shingle_hashes,
    row_id_hex,
    sha256_hex,
    splitmix64,
)
from entity_linking_ray.functions.similarity import (
    sig_jaccard_matrix,
    simhash64,
    token_levenshtein_ratio,
)
from entity_linking_ray.functions.text import token_hashes, tokenize


def test_sha256_matches_hashlib():
    import hashlib

    assert sha256_hex(["abc"]) == [hashlib.sha256(b"abc").hexdigest()]


def test_row_id_is_stable_and_16hex():
    a = row_id_hex(["r"], ["p"], ["c"])
    b = row_id_hex(["r"], ["p"], ["c"])
    assert a == b and len(a[0]) == 16
    assert int(a[0], 16) & ((1 << 63) - 1) == hex16_to_node(a)[0]
    assert hex16_to_node(a)[0] >= 0  # int64-safe: see hex16_to_node docstring


def test_tokenize_code_aware():
    assert tokenize("def foo_bar(x):\n  return x+1") == [
        "def", "foo_bar", "(", "x", ")", ":", "return", "x", "+", "1",
    ]


def test_shingles_count_and_short_input():
    th = token_hashes("a b c d e f")
    assert rolling_shingle_hashes(th, 3).shape[0] == 4
    assert rolling_shingle_hashes(th[:2], 5).shape[0] == 1  # degrades to 1
    assert rolling_shingle_hashes(np.empty(0, dtype=np.uint64), 5).shape[0] == 0


def test_minhash_jaccard_estimate_close():
    a, b = minhash_params(128, 42)
    rng = np.random.default_rng(0)
    s1 = rng.integers(0, 2**32, 500, dtype=np.uint64)
    # 80% overlap
    s2 = np.concatenate([s1[:400], rng.integers(0, 2**32, 100, dtype=np.uint64)])
    sig = minhash_signatures([s1, s2], a, b)
    est = (sig[0] == sig[1]).mean()
    true_j = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
    assert abs(est - true_j) < 0.12


def test_minhash_deterministic_across_calls():
    a, b = minhash_params(64, 7)
    s = np.arange(100, dtype=np.uint64)
    sig1 = minhash_signatures([s], a, b)
    sig2 = minhash_signatures([s, s[:50]], a, b)
    np.testing.assert_array_equal(sig1[0], sig2[0])


def test_band_keys_identical_for_identical_sigs():
    a, b = minhash_params(128, 42)
    s = np.arange(1000, dtype=np.uint64)
    sig = minhash_signatures([s, s], a, b)
    k = band_keys(sig, 32)
    np.testing.assert_array_equal(k[0], k[1])
    # band index occupies distinct top bits: no cross-band collisions
    assert len(set(int(x) >> 56 for x in k[0])) == 32


def test_levenshtein_ratio():
    a = np.array([1, 2, 3, 4], dtype=np.uint32)
    assert token_levenshtein_ratio(a, a) == 1.0
    assert token_levenshtein_ratio(a, a[:2]) == 0.5
    assert token_levenshtein_ratio(np.array([], np.uint32), np.array([], np.uint32)) == 1.0
    b = np.array([1, 2, 9, 4], dtype=np.uint32)
    assert token_levenshtein_ratio(a, b) == 0.75


def test_sig_jaccard_matrix_diag():
    sigs = np.random.default_rng(1).integers(0, 100, (3, 16)).astype(np.uint32)
    m = sig_jaccard_matrix(sigs)
    np.testing.assert_allclose(np.diag(m), 1.0)


def test_simhash_similar_inputs_close():
    t1 = token_hashes("the quick brown fox jumps over the lazy dog " * 20)
    t2 = token_hashes("the quick brown fox jumps over the lazy cat " * 20)
    t3 = token_hashes("completely different content entirely unrelated words " * 20)
    h1, h2, h3 = simhash64(t1), simhash64(t2), simhash64(t3)
    d12 = bin(h1 ^ h2).count("1")
    d13 = bin(h1 ^ h3).count("1")
    assert d12 < d13


def test_splitmix_deterministic():
    x = np.array([1, 2, 3], dtype=np.uint64)
    np.testing.assert_array_equal(splitmix64(x), splitmix64(x))
    assert len(set(splitmix64(np.arange(1000, dtype=np.uint64)).tolist())) == 1000


def test_oph_jaccard_estimate_and_determinism():
    from entity_linking_ray.functions.hashing import oph_signatures

    rng = np.random.default_rng(0)
    s1 = rng.integers(0, 2**32, 500, dtype=np.uint64)
    s2 = np.concatenate([s1[:400], rng.integers(0, 2**32, 100, dtype=np.uint64)])
    sig = oph_signatures([s1, s2], 128, 42)
    est = (sig[0] == sig[1]).mean()
    true_j = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
    assert abs(est - true_j) < 0.12
    # per-row result independent of batch composition
    solo = oph_signatures([s2], 128, 42)
    np.testing.assert_array_equal(sig[1], solo[0])
    # identical sets -> identical signatures
    again = oph_signatures([s1, s1], 128, 42)
    np.testing.assert_array_equal(again[0], again[1])


def test_oph_densification_short_rows():
    from entity_linking_ray.functions.hashing import oph_signatures

    # 3 shingles over 128 bins: most bins empty -> densification must fill
    # every bin deterministically, and identical sets must still agree
    s = np.array([7, 9, 11], dtype=np.uint64)
    sig = oph_signatures([s, s, np.empty(0, dtype=np.uint64)], 128, 1)
    assert (sig[0] != 0xFFFFFFFF).all()
    np.testing.assert_array_equal(sig[0], sig[1])
    # zero-shingle rows keep the sentinel (featurize never emits them)
    assert (sig[2] == 0xFFFFFFFF).all()
