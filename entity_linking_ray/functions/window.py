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
    inclusive end offset (:70 uses end+1), keep_left = (ctx - 2 - len_m) // 2
    with the remainder on the right.
    """
    words = text.lower().split()
    start_i = max(0, start_index)
    end_i = min(len(words) - 1, end_index) if words else -1
    mention = words[start_i : end_i + 1]
    budget = max(0, context_size - 2 - len(mention))
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
