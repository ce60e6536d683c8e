"""Token-id encode + pad + attention mask (SURVEY.md M11, T1).

Mirrors the reference's sequence construction exactly
(/root/reference/src/zeshel_dataset.py:78-90,100-109): tokens are truncated to
``seq_len - 2``, wrapped as ``[CLS] ... [SEP]``, converted to ids, an
attention mask of 1s is laid over the real tokens, and both are padded to the
fixed ``seq_len`` with the pad id / 0 (the reference asserts the 512 cap at
:85,109; here the cap is the configured ``seq_len``). The reference's special
tokens map to fixed low ids; its WordPiece vocabulary is replaced by a
deterministic VOCAB-HASH tokenizer (id = N_SPECIAL + md5(word)[:8] %
(vocab_size - N_SPECIAL)) so the whole encoding is reproducible in plain SQL
(DuckDB md5) and needs no vocabulary artifact — the tokenizer-factory analog
of /root/reference/src/tokenization.py:8-13.

The per-actor stage class compiles nothing heavier than a regex, but follows
the same actor-pool contract as the encoder stages: construct once per worker,
vectorize per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# special-token id block (reference analog: [PAD]=0 and low reserved ids in
# the BERT vocab; [unused0]/[unused1] are the mention markers, constants.py:1-3)
PAD_ID = 0
CLS_ID = 1
SEP_ID = 2
MENTION_START_ID = 3
MENTION_END_ID = 4
ENT_TITLE_ID = 5
N_SPECIAL = 6

_SPECIAL = {
    "[CLS]": CLS_ID,
    "[SEP]": SEP_ID,
    "[PAD]": PAD_ID,
    "[unused0]": MENTION_START_ID,
    "[unused1]": MENTION_END_ID,
    "[unused2]": ENT_TITLE_ID,
    "|": ENT_TITLE_ID,  # roberta-style entity title separator (zeshel_dataset.py:99)
    # RoBERTa/DeCLUTR-family specials map onto the same reserved id slots
    # (the reference swaps the token STRINGS per family, enums.py:4-7 +
    # zeshel_dataset.py:39-48; the id-slot layout is ours)
    "<s>": CLS_ID,
    "</s>": SEP_ID,
    "<pad>": PAD_ID,
}


class BaseModelType:
    """The reference's closed model-family enum (enums.py:4-7), dispatched in
    its tokenizer factory (tokenization.py:6-15) and special-token selection
    (zeshel_dataset.py:39-48)."""

    BERT_BASE = "BERT_BASE"
    ROBERTA_BASE = "ROBERTA_BASE"
    DECLUTR_BASE = "DECLUTR_BASE"
    ALL = (BERT_BASE, ROBERTA_BASE, DECLUTR_BASE)


# per-family special-token STRINGS, exactly zeshel_dataset.py:39-48: BERT
# wraps mentions in [unused0]/[unused1] (constants.py:1-3) and uses
# [CLS]/[SEP]/[PAD]; the RoBERTa families wrap mentions in '|' and use
# <s>/</s>/<pad>
_FAMILY_TOKENS = {
    BaseModelType.BERT_BASE: {
        "cls": "[CLS]", "sep": "[SEP]", "pad": "[PAD]",
        "mention_start": "[unused0]", "mention_end": "[unused1]",
    },
    BaseModelType.ROBERTA_BASE: {
        "cls": "<s>", "sep": "</s>", "pad": "<pad>",
        "mention_start": "|", "mention_end": "|",
    },
    BaseModelType.DECLUTR_BASE: {
        "cls": "<s>", "sep": "</s>", "pad": "<pad>",
        "mention_start": "|", "mention_end": "|",
    },
}


def get_tokenizer(base_model_type: str, vocab_size: int = 30000,
                  seq_len: int = 64) -> "HashTokenizer":
    """Tokenizer factory keyed by the model-family enum — the analog of
    tokenization.py:6-15 (which loads the matching HF vocab per family; here
    every family shares the deterministic vocab-hash id function and differs
    in its special-token strings, like the reference's special-token
    placement tests require, test/test_zeshel_dataset.py:26-60)."""
    if base_model_type not in BaseModelType.ALL:
        raise RuntimeError(f"Invalid base model type: {base_model_type}")
    return HashTokenizer(vocab_size=vocab_size, seq_len=seq_len,
                         base_model_type=base_model_type)


class HashTokenizer:
    """Deterministic vocab-hash tokenizer: word -> id in [N_SPECIAL, vocab)."""

    def __init__(self, vocab_size: int = 30000, seq_len: int = 64,
                 base_model_type: str = BaseModelType.BERT_BASE):
        assert vocab_size > N_SPECIAL
        self.vocab_size = vocab_size
        self.seq_len = seq_len
        self._slots = vocab_size - N_SPECIAL
        self.base_model_type = base_model_type
        toks = _FAMILY_TOKENS[base_model_type]
        self.cls_token = toks["cls"]
        self.sep_token = toks["sep"]
        self.pad_token = toks["pad"]
        self.mention_start_tag = toks["mention_start"]
        self.mention_end_tag = toks["mention_end"]
        self.cls_id = _SPECIAL[self.cls_token]
        self.sep_id = _SPECIAL[self.sep_token]
        self.pad_id = _SPECIAL[self.pad_token]

    def token_id(self, word: str) -> int:
        sp = _SPECIAL.get(word)
        if sp is not None:
            return sp
        h = int(hashlib.md5(word.encode("utf-8", "surrogatepass")).hexdigest()[:8], 16)
        return N_SPECIAL + h % self._slots

    def convert_ids_to_tokens(self, ids) -> list[str]:
        """Inverse mapping for the reserved id slots, rendered with THIS
        family's token strings (the reference analog is the HF tokenizer's
        same-named method, used by its placement tests,
        test/test_zeshel_dataset.py:28-60). Vocab-hash ids are not invertible;
        they render as ``tok_<id>`` placeholders."""
        rev = {
            self.cls_id: self.cls_token,
            self.sep_id: self.sep_token,
            self.pad_id: self.pad_token,
            MENTION_START_ID: self.mention_start_tag,
            MENTION_END_ID: self.mention_end_tag,
            ENT_TITLE_ID: "|",
        }
        return [rev.get(int(i), f"tok_{int(i)}") for i in ids]

    def encode_pad(self, words: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """words -> (input_ids, attention_mask), both int32 of len seq_len.

        Exactly zeshel_dataset.py:77-90: truncate to seq_len - 2, wrap with
        cls/sep, mask 1 over real tokens, pad with the pad id / 0. The
        family's cls/sep/pad STRINGS differ but map to the same reserved id
        slots, so the encoded ids (and the SQL oracle) are family-invariant.
        """
        core = [self.cls_id] + [self.token_id(w) for w in words[: self.seq_len - 2]] + [self.sep_id]
        n = len(core)
        assert n <= self.seq_len  # the reference's :85/:109 assert
        ids = np.full(self.seq_len, self.pad_id, dtype=np.int32)
        ids[:n] = core
        mask = np.zeros(self.seq_len, dtype=np.int32)
        mask[:n] = 1
        return ids, mask

    def encode_mention(self, text: str, start_index: int, end_index: int,
                       context_size: int = 32) -> tuple[np.ndarray, np.ndarray]:
        """Mention-in-context encode (zeshel_dataset.py:62-90): window the
        mention with THIS family's start/end marker tags, then wrap/pad."""
        from ..functions.window import mention_context_window

        words = mention_context_window(
            text, start_index, end_index, context_size=context_size,
            start_tag=self.mention_start_tag, end_tag=self.mention_end_tag,
        )
        return self.encode_pad(words)

    def encode_entity(self, title: str, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Entity encode (zeshel_dataset.py:93-109): lowercase title + '|' +
        text, truncated to seq_len - 2, then wrap/pad."""
        from ..functions.window import entity_text_compose

        words = entity_text_compose(title, text, max_words=self.seq_len - 2)
        return self.encode_pad(words)

    def encode_pad_batch(self, word_lists: list[list[str]],
                         word_cache: dict | None = None) -> tuple[np.ndarray, np.ndarray]:
        """(n, seq_len) id + mask matrices for a batch of word lists.

        Vectorized: the batch's words are FACTORIZED (pandas' C hash) so the
        md5 id function runs once per DISTINCT word — natural-language batches
        repeat most words — and the wrap/pad layout is one numpy scatter
        instead of a per-row Python pass. ``word_cache`` (optional, owned by
        the calling actor) carries distinct-word ids ACROSS batches, so a
        long-lived actor converges to pure cache hits. Exactly equals a
        per-row ``encode_pad`` loop (invariance-tested)."""
        import pandas as pd

        n = len(word_lists)
        ids = np.full((n, self.seq_len), self.pad_id, dtype=np.int32)
        mask = np.zeros((n, self.seq_len), dtype=np.int32)
        if n == 0:
            return ids, mask
        trunc = [ws[: self.seq_len - 2] for ws in word_lists]
        lens = np.fromiter((len(ws) for ws in trunc), dtype=np.int64, count=n)
        total = int(lens.sum())
        if total:
            flat = np.empty(total, dtype=object)
            pos = 0
            for ws in trunc:
                flat[pos: pos + len(ws)] = ws
                pos += len(ws)
            codes, uniques = pd.factorize(flat)
            uniques = uniques.tolist()
            if word_cache is None:
                uid = np.fromiter(
                    (self.token_id(w) for w in uniques),
                    dtype=np.int32, count=len(uniques),
                )
            else:
                uid = np.empty(len(uniques), dtype=np.int32)
                for k, w in enumerate(uniques):
                    v = word_cache.get(w)
                    if v is None:
                        v = self.token_id(w)
                        if len(word_cache) < 1_000_000:
                            word_cache[w] = v
                    uid[k] = v
            tok_ids = uid[codes]
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            cols = (np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(lens) - lens, lens) + 1)
            ids[rows, cols] = tok_ids
            mask[rows, cols] = 1
        ids[:, 0] = self.cls_id
        ids[np.arange(n), lens + 1] = self.sep_id
        mask[:, 0] = 1
        mask[np.arange(n), lens + 1] = 1
        return ids, mask


class TokenizePadStage:
    """Actor-pool map_batches callable: text column -> flat positional
    (id_col, pos, token_id, mask) rows.

    The flat layout (one row per sequence position) is what makes the op
    exactly SQL-comparable; a list<int32> layout of the same data is one
    ``numpy reshape`` away for model consumers.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 vocab_size: int = 30000, seq_len: int = 32):
        import re

        self.tok = HashTokenizer(vocab_size=vocab_size, seq_len=seq_len)
        self.word = re.compile(r"\S+")  # reference: .lower().split()
        self.text_col = text_col
        self.id_col = id_col
        # distinct-word -> id cache, per actor: md5 runs once per word over
        # the actor's lifetime, not once per occurrence per batch
        self._word_cache: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        ids_m, mask_m = self.tok.encode_pad_batch(
            [self.word.findall(s.lower()) for s in texts],
            word_cache=self._word_cache,
        )
        n, L = ids_m.shape
        rid = t.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: pa.array(np.repeat(rid, L)),
            "pos": pa.array(np.tile(np.arange(L, dtype=np.int64), n)),
            "token_id": pa.array(ids_m.ravel().astype(np.int64)),
            "mask": pa.array(mask_m.ravel().astype(np.int64)),
        })
