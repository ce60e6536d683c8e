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
}


class HashTokenizer:
    """Deterministic vocab-hash tokenizer: word -> id in [N_SPECIAL, vocab)."""

    def __init__(self, vocab_size: int = 30000, seq_len: int = 64):
        assert vocab_size > N_SPECIAL
        self.vocab_size = vocab_size
        self.seq_len = seq_len
        self._slots = vocab_size - N_SPECIAL

    def token_id(self, word: str) -> int:
        sp = _SPECIAL.get(word)
        if sp is not None:
            return sp
        h = int(hashlib.md5(word.encode("utf-8", "surrogatepass")).hexdigest()[:8], 16)
        return N_SPECIAL + h % self._slots

    def encode_pad(self, words: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """words -> (input_ids, attention_mask), both int32 of len seq_len.

        Exactly zeshel_dataset.py:77-90: truncate to seq_len - 2, wrap with
        [CLS]/[SEP], mask 1 over real tokens, pad with PAD_ID / 0.
        """
        core = [CLS_ID] + [self.token_id(w) for w in words[: self.seq_len - 2]] + [SEP_ID]
        n = len(core)
        assert n <= self.seq_len  # the reference's :85/:109 assert
        ids = np.full(self.seq_len, PAD_ID, dtype=np.int32)
        ids[:n] = core
        mask = np.zeros(self.seq_len, dtype=np.int32)
        mask[:n] = 1
        return ids, mask

    def encode_pad_batch(self, word_lists: list[list[str]]) -> tuple[np.ndarray, np.ndarray]:
        """(n, seq_len) id + mask matrices for a batch of word lists."""
        n = len(word_lists)
        ids = np.full((n, self.seq_len), PAD_ID, dtype=np.int32)
        mask = np.zeros((n, self.seq_len), dtype=np.int32)
        for i, ws in enumerate(word_lists):
            ids[i], mask[i] = self.encode_pad(ws)
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

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        ids_m, mask_m = self.tok.encode_pad_batch(
            [self.word.findall(s.lower()) for s in texts]
        )
        n, L = ids_m.shape
        rid = t.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: pa.array(np.repeat(rid, L)),
            "pos": pa.array(np.tile(np.arange(L, dtype=np.int64), n)),
            "token_id": pa.array(ids_m.ravel().astype(np.int64)),
            "mask": pa.array(mask_m.ravel().astype(np.int64)),
        })
