"""Text normalization and tokenization kernels.

Mirrors the reference's normalization semantics — lowercase + whitespace
tokenization (reference src/zeshel_dataset.py:65-66) — specialized for source
code: identifiers/numbers/operators become tokens, whitespace is normalization-
insensitive (so indentation-only edits are near-duplicates).
"""

from __future__ import annotations

import re

import numpy as np

# identifiers / numbers, or any single non-space symbol (operators, braces).
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")


def tokenize(text: str, lowercase: bool = True) -> list[str]:
    """Code-aware tokenization; lowercase mirrors zeshel_dataset.py:65-66."""
    if lowercase:
        text = text.lower()
    return _TOKEN_RE.findall(text)


# per-process token -> crc32 memo. Code-corpus tokens are Zipfian (keywords,
# operators, common identifiers dominate), so the dict-hit path replaces the
# per-token encode+crc32 for the vast majority of occurrences — measured
# ~25-40% off the tokenize+hash wall on the bench corpus with identical
# output values. Bounded: past the cap the head of the distribution is
# already resident and inserts stop (no eviction churn).
_CRC_CACHE: dict[str, int] = {}
_CRC_CACHE_MAX = 262_144


def token_hashes(text: str, lowercase: bool = True) -> np.ndarray:
    """uint64(crc32) per token — the numeric representation every downstream
    kernel (shingles, MinHash, hashing-encoder, token-Levenshtein) consumes.
    Values are exactly crc32(utf-8 token); the memo never changes them."""
    toks = tokenize(text, lowercase=lowercase)
    cache = _CRC_CACHE
    vals = list(map(cache.get, toks))
    if None in vals:
        import zlib

        room = len(cache) < _CRC_CACHE_MAX
        for i, v in enumerate(vals):
            if v is None:
                tok = toks[i]
                v = zlib.crc32(tok.encode("utf-8", "surrogatepass"))
                if room:
                    cache[tok] = v
                vals[i] = v
    return np.array(vals, dtype=np.uint64)
