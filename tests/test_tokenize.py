"""M11/T1: token-id encode + pad + attention mask.

Reproduces the reference test suite's sequence invariants
(/root/reference/test/test_zeshel_dataset.py:26-60): CLS first; a short
mention context ends in PAD while a long entity text ends in SEP; fixed
length; mask covers exactly the real tokens."""

import numpy as np

from entity_linking_ray.functions.window import (
    MENTION_END,
    MENTION_START,
    entity_text_compose,
    mention_context_window,
)
from entity_linking_ray.stages.tokenize import (
    CLS_ID,
    ENT_TITLE_ID,
    MENTION_END_ID,
    MENTION_START_ID,
    N_SPECIAL,
    PAD_ID,
    SEP_ID,
    HashTokenizer,
)


def test_mention_sequence_invariants():
    tok = HashTokenizer(vocab_size=1000, seq_len=64)
    words = mention_context_window(
        " ".join(f"w{i}" for i in range(40)), 10, 12, context_size=16
    )
    ids, mask = tok.encode_pad(words)
    assert ids.shape == (64,) and mask.shape == (64,)
    # test_zeshel_dataset.py:30-31: [CLS] first, [PAD] last (short context)
    assert ids[0] == CLS_ID
    assert ids[-1] == PAD_ID and mask[-1] == 0
    n_real = len(words) + 2
    assert ids[n_real - 1] == SEP_ID
    assert mask[:n_real].all() and not mask[n_real:].any()
    # the mention markers land inside the sequence with their reserved ids
    assert MENTION_START_ID in ids and MENTION_END_ID in ids
    assert list(ids).index(MENTION_START_ID) == 1 + words.index(MENTION_START)


def test_entity_sequence_ends_in_sep_when_truncated():
    tok = HashTokenizer(vocab_size=1000, seq_len=32)
    words = entity_text_compose("Long Title", " ".join(f"t{i}" for i in range(100)),
                                max_words=200)
    ids, mask = tok.encode_pad(words)
    # test_zeshel_dataset.py:33-34: entity (long text) ends in [SEP], not pad
    assert ids[0] == CLS_ID and ids[-1] == SEP_ID
    assert mask.all()
    # the '|' title separator maps to the reserved entity-title id
    assert ENT_TITLE_ID in ids


def test_vocab_hash_ids_deterministic_and_in_range():
    tok = HashTokenizer(vocab_size=500, seq_len=8)
    a = tok.token_id("hello")
    assert a == tok.token_id("hello")
    assert N_SPECIAL <= a < 500
    import hashlib

    expect = N_SPECIAL + int(hashlib.md5(b"hello").hexdigest()[:8], 16) % (500 - N_SPECIAL)
    assert a == expect


def test_tokenize_pad_stage_flat_layout(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from entity_linking_ray.stages.tokenize import TokenizePadStage

    docs = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["Alpha beta GAMMA", ""]),
    })
    out = rd.from_arrow(docs).map_batches(
        TokenizePadStage, batch_format="pyarrow",
        fn_constructor_kwargs={"seq_len": 6}, concurrency=1,
    ).to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    assert len(out) == 12
    row0 = out[out.doc_id == 1]
    assert row0.token_id.tolist()[0] == CLS_ID
    assert row0.token_id.tolist()[4] == SEP_ID
    assert row0["mask"].tolist() == [1, 1, 1, 1, 1, 0]
    empty = out[out.doc_id == 2]
    assert empty.token_id.tolist()[:2] == [CLS_ID, SEP_ID]
    assert empty["mask"].tolist() == [1, 1, 0, 0, 0, 0]


def test_special_token_placement_per_family():
    """Reproduces the reference's placement invariants for all three model
    families (test/test_zeshel_dataset.py:26-60): mention inputs start with
    the family's cls token and, for a short context, end with its pad token;
    entity inputs (long text, budget exhausted) start with cls and end with
    sep. BERT wraps mentions in [unused0]/[unused1]; the RoBERTa families
    wrap in '|' (zeshel_dataset.py:39-48)."""
    from entity_linking_ray.stages.tokenize import BaseModelType, get_tokenizer

    text = "the quick brown fox jumps over the lazy dog"
    long_entity_text = " ".join(f"word{i}" for i in range(200))
    expect = {
        BaseModelType.BERT_BASE: ("[CLS]", "[SEP]", "[PAD]", "[unused0]", "[unused1]"),
        BaseModelType.ROBERTA_BASE: ("<s>", "</s>", "<pad>", "|", "|"),
        BaseModelType.DECLUTR_BASE: ("<s>", "</s>", "<pad>", "|", "|"),
    }
    for family, (cls, sep, pad, mstart, mend) in expect.items():
        tok = get_tokenizer(family, seq_len=32)
        m_ids, m_mask = tok.encode_mention(text, 2, 3, context_size=16)
        m_toks = tok.convert_ids_to_tokens(m_ids)
        assert m_toks[0] == cls, (family, m_toks[0])
        assert m_toks[-1] == pad, (family, m_toks[-1])
        assert mstart in m_toks and mend in m_toks
        # mention words sit between the markers
        i0 = m_toks.index(mstart)
        assert m_toks[i0 + 1] == f"tok_{tok.token_id('brown')}"
        e_ids, e_mask = tok.encode_entity("Fox", long_entity_text)
        e_toks = tok.convert_ids_to_tokens(e_ids)
        assert e_toks[0] == cls, (family, e_toks[0])
        assert e_toks[-1] == sep, (family, e_toks[-1])
        assert int(e_mask.sum()) == tok.seq_len  # no padding: text fills budget
        assert int(m_mask[0]) == 1 and int(m_mask[-1]) == 0


def test_family_invariant_ids():
    """The families differ only in token STRINGS; the encoded id matrices are
    identical (shared reserved id slots + shared vocab-hash), so tokenize_pad's
    SQL oracle is family-invariant."""
    import numpy as np

    from entity_linking_ray.stages.tokenize import BaseModelType, get_tokenizer

    words = "Alpha beta gamma delta".lower().split()
    mats = []
    for family in BaseModelType.ALL:
        tok = get_tokenizer(family, seq_len=12)
        ids, mask = tok.encode_pad(words)
        mats.append((ids, mask))
    for ids, mask in mats[1:]:
        assert np.array_equal(ids, mats[0][0])
        assert np.array_equal(mask, mats[0][1])


def test_get_tokenizer_rejects_unknown_family():
    import pytest

    from entity_linking_ray.stages.tokenize import get_tokenizer

    with pytest.raises(RuntimeError, match="Invalid base model type"):
        get_tokenizer("GPT2_BASE")


def test_encode_pad_batch_equals_per_row_loop():
    """The vectorized factorize+scatter batch encoder is exactly the per-row
    encode_pad loop — with and without the cross-batch word cache, across
    families, including empty / truncated / special-token word lists."""
    import numpy as np

    from entity_linking_ray.stages.tokenize import BaseModelType, get_tokenizer

    for family in BaseModelType.ALL:
        tok = get_tokenizer(family, vocab_size=1000, seq_len=12)
        lists = [
            [],
            ["hello", "world"],
            ["dup", "dup", "dup"],
            ["w%d" % i for i in range(40)],  # truncates at seq_len - 2
            [tok.cls_token, "x", tok.sep_token, "|"],  # specials mid-sequence
            ["ümläut", "中文", "a" * 100],
        ]
        exp_ids = np.stack([tok.encode_pad(ws)[0] for ws in lists])
        exp_mask = np.stack([tok.encode_pad(ws)[1] for ws in lists])
        got_ids, got_mask = tok.encode_pad_batch(lists)
        assert (got_ids == exp_ids).all() and (got_mask == exp_mask).all()
        cache: dict = {}
        c_ids, c_mask = tok.encode_pad_batch(lists, word_cache=cache)
        assert (c_ids == exp_ids).all() and (c_mask == exp_mask).all()
        # warm-cache second pass identical
        c_ids2, _ = tok.encode_pad_batch(lists, word_cache=cache)
        assert (c_ids2 == exp_ids).all() and len(cache) > 0
