"""Text normalization and tokenization kernels.

Mirrors the reference's normalization semantics — lowercase + whitespace
tokenization (reference src/zeshel_dataset.py:65-66) — specialized for source
code: identifiers/numbers/operators become tokens, whitespace is normalization-
insensitive (so indentation-only edits are near-duplicates).
"""

from __future__ import annotations

import re

import numpy as np

from .hashing import crc32_tokens

# identifiers / numbers, or any single non-space symbol (operators, braces).
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")


def tokenize(text: str, lowercase: bool = True) -> list[str]:
    """Code-aware tokenization; lowercase mirrors zeshel_dataset.py:65-66."""
    if lowercase:
        text = text.lower()
    return _TOKEN_RE.findall(text)


def token_hashes(text: str, lowercase: bool = True) -> np.ndarray:
    """uint64(crc32) per token — the numeric representation every downstream
    kernel (shingles, MinHash, hashing-encoder, token-Levenshtein) consumes."""
    toks = tokenize(text, lowercase=lowercase)
    return crc32_tokens([t.encode("utf-8", "surrogatepass") for t in toks])
