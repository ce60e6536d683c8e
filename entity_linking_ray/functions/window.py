"""Mention-context windowing — reference-parity kernel (SURVEY.md M10).

Reproduces the reference's context extraction semantics
(/root/reference/src/zeshel_dataset.py:62-76): the mention is addressed by
INCLUSIVE word offsets into the whitespace-split source text, lowercased, the
mention is wrapped in start/end marker tokens, and the surrounding context
budget ``context_size - 2 - len(mention)`` words is split evenly with the
remainder going right.
"""

from __future__ import annotations

MENTION_START = "[unused0]"
MENTION_END = "[unused1]"


def mention_context_window(
    text: str,
    start_index: int,
    end_index: int,
    context_size: int = 64,
    start_tag: str = MENTION_START,
    end_tag: str = MENTION_END,
) -> list[str]:
    """Words of the windowed mention-in-context, mention wrapped in tags.

    Mirrors zeshel_dataset.py:62-76: lowercase (:65), whitespace split (:66),
    inclusive end offset (:70 uses end+1), and the exact reference budget —
    ``keep_left = (context_size - 2 - len(mention_tokens)) // 2`` where
    ``mention_tokens`` INCLUDES the two marker tags (:68,73), remainder going
    right (:74). Two deliberate divergences from the reference, both asserted
    in tests/test_retrieval_parity.py:
    - the budget is clamped at 0: the reference's ``left_tokens[-keep_left:]``
      with ``keep_left == 0`` keeps the ENTIRE left context (the ``[-0:]``
      Python bug), and negative budgets index nonsensically; here an exhausted
      budget keeps nothing,
    - out-of-range mention offsets are clamped instead of slicing to empty.
    """
    words = text.lower().split()
    start_i = max(0, start_index)
    end_i = min(len(words) - 1, end_index) if words else -1
    mention = words[start_i : end_i + 1]
    # reference counts the two marker tags inside mention_tokens
    budget = max(0, context_size - 2 - (len(mention) + 2))
    keep_left = budget // 2
    keep_right = budget - keep_left
    left = words[max(0, start_i - keep_left) : start_i]
    right = words[end_i + 1 : end_i + 1 + keep_right]
    return left + [start_tag] + mention + [end_tag] + right


def entity_text_compose(title: str, text: str, max_words: int = 64) -> list[str]:
    """Entity-side composition (zeshel_dataset.py:93-99): lowercase title and
    text joined by a '|' separator token, truncated to the word budget."""
    words = title.lower().split() + ["|"] + text.lower().split()
    return words[:max_words]
