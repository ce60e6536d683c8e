"""T2-T5: numpy bi-encoder backend == the reference's pooling + head math.

The expected values are computed INDEPENDENTLY in the test with the literal
formulas from /root/reference/src/bi_encoder.py:39-83 (CLS pooling :44,67;
masked-mean pooling with the 1e-9 clamp :47-50,70-76; Linear head :36-37)."""

import numpy as np
import pytest

from entity_linking_ray.stages.encoder import NumpyBiEncoder


@pytest.fixture(scope="module")
def fixed():
    rng = np.random.default_rng(7)
    hidden, dim, vocab, L, n = 16, 8, 50, 10, 4
    w = {
        "tok_emb": rng.standard_normal((vocab, hidden)).astype(np.float32),
        "pos_emb": rng.standard_normal((L, hidden)).astype(np.float32),
        "head_w": rng.standard_normal((dim, hidden)).astype(np.float32),
        "head_b": rng.standard_normal(dim).astype(np.float32),
    }
    ids = rng.integers(0, vocab, (n, L))
    mask = np.zeros((n, L), dtype=np.int64)
    for i, k in enumerate((3, 10, 1, 7)):
        mask[i, :k] = 1
    return w, ids, mask, (hidden, dim, vocab, L)


def _expected(w, ids, mask, pooling):
    seq = w["tok_emb"][ids] + w["pos_emb"][None]
    if pooling == "cls":
        pooled = seq[:, 0]  # bi_encoder.py:44 last_hidden_state[:, 0]
    else:
        m = mask.astype(np.float32)[:, :, None]
        # bi_encoder.py:47-50: sum(seq*mask) / clamp(sum(mask), min=1e-9)
        pooled = (seq * m).sum(1) / np.maximum(m.sum(1), 1e-9)
    return pooled @ w["head_w"].T + w["head_b"]  # the fc_* Linear


@pytest.mark.parametrize("pooling", ["cls", "mean"])
def test_pooling_and_head_match_reference_formula(fixed, pooling):
    w, ids, mask, (hidden, dim, vocab, L) = fixed
    enc = NumpyBiEncoder(dim=dim, hidden=hidden, vocab_size=vocab, seq_len=L,
                         pooling=pooling, weights=w, normalize=False)
    np.testing.assert_allclose(
        enc.forward(ids, mask), _expected(w, ids, mask, pooling),
        rtol=1e-5, atol=1e-5,
    )


def test_all_pad_row_clamp(fixed):
    """A fully-masked-out row exercises the reference's 1e-9 clamp (a plain
    mean would divide by zero)."""
    w, ids, _, (hidden, dim, vocab, L) = fixed
    mask = np.zeros_like(ids)
    enc = NumpyBiEncoder(dim=dim, hidden=hidden, vocab_size=vocab, seq_len=L,
                         pooling="mean", weights=w, normalize=False)
    out = enc.forward(ids, mask)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, np.broadcast_to(w["head_b"], out.shape),
                               rtol=1e-4, atol=1e-4)


def test_weights_parquet_roundtrip(fixed, tmp_path):
    w, ids, mask, (hidden, dim, vocab, L) = fixed
    enc = NumpyBiEncoder(dim=dim, hidden=hidden, vocab_size=vocab, seq_len=L,
                         pooling="mean", weights=w)
    p = str(tmp_path / "weights.parquet")
    enc.save_weights(p)
    enc2 = NumpyBiEncoder.from_weights(p, pooling="mean")
    np.testing.assert_array_equal(enc.forward(ids, mask), enc2.forward(ids, mask))


def test_featurize_adapter_contract():
    """embed_token_hashes: unit-norm rows, deterministic, dot == cosine —
    the contract FeaturizeStage relies on for any encoder backend."""
    enc = NumpyBiEncoder(dim=8, hidden=16, vocab_size=64, seq_len=12)
    rows = [np.array([1, 2, 3], dtype=np.uint64),
            np.array([], dtype=np.uint64),
            np.arange(40, dtype=np.uint64)]  # longer than seq_len: truncates
    out = enc.embed_token_hashes(rows)
    assert out.shape == (3, 8)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(out, enc.embed_token_hashes(rows))


def test_numpy_bi_linkage_end_to_end(ray_session):
    """The flagship pipeline runs green with the numpy bi-encoder backend
    (pluggable-backend surface, SURVEY §2.10)."""
    import ray.data as rd

    from entity_linking_ray.config import LinkageConfig
    from entity_linking_ray.pipelines.evaluate import pairwise_f1
    from entity_linking_ray.pipelines.linkage import link_dataset
    from entity_linking_ray.sources.synthetic import SynthSpec, generate_corpus

    corpus, _, pairs = generate_corpus(SynthSpec(n_clusters=20))
    cfg = LinkageConfig(shuffle_partitions=4, encoder="numpy_bi")
    out = link_dataset(rd.from_arrow(corpus), cfg).materialize()
    assert out.count() == corpus.num_rows
    res = pairwise_f1(out, pairs, cfg)
    assert res["f1"] >= 0.99, res
