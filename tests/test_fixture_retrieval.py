"""Measured retrieval on the reference's own fixture data (not just contract
parity): each fixture mention's windowed context is embedded and must
retrieve its label entity from the fixture entity set — the zero-shot
candidate-retrieval measurement of eval_zeshel.py:38-53 run end-to-end
through this engine's windower + tokenizer + encoder on real reference data.

The reference's published rates (generate_plots.py:8-10) come from trained
transformer checkpoints that cannot exist in this sandbox; this pins the
deterministic-encoder retrieval on the same fixture inputs instead, so any
regression in windowing/tokenization/embedding shows up as a rate change."""

import json

import numpy as np

from entity_linking_ray.functions.window import (
    entity_text_compose,
    mention_context_window,
)
from entity_linking_ray.stages.encoder import HashingEncoder
from entity_linking_ray.functions.text import token_hashes

FIXTURE = "/root/reference/test/data/mentions_train.json"


def test_fixture_mentions_retrieve_their_label_entity():
    with open(FIXTURE) as f:
        mentions = list(json.load(f).values())
    assert len(mentions) == 3

    enc = HashingEncoder()
    ent_ids, ent_vecs = [], []
    seen = set()
    for m in mentions:
        doc = m["label_document"]
        if doc["document_id"] in seen:
            continue
        seen.add(doc["document_id"])
        words = entity_text_compose(doc["title"], doc["text"], max_words=64)
        ent_ids.append(doc["document_id"])
        ent_vecs.append(enc.embed_token_hashes([token_hashes(" ".join(words))])[0])
    ee = np.stack(ent_vecs)

    hits = 0
    for m in mentions:
        win = mention_context_window(
            m["source_document"]["text"], m["start_index"], m["end_index"],
            context_size=64,
        )
        me = enc.embed_token_hashes([token_hashes(" ".join(win))])[0]
        scores = ee @ me
        pred = ent_ids[int(np.argmax(scores))]
        hits += pred == m["label_document_id"]

    # deterministic encoder, fixed fixture: the rate is exact and pinned
    assert hits == 3, f"retrieval@1 on the reference fixture dropped to {hits}/3"
