"""Entry-point-1 parity: the mention/entity transform pipeline reproduces the
reference's own fixture output (/root/reference/test/data/mentions_train.json
is the OUTPUT of transform_zeshel.py over raw Zeshel inputs; we reconstruct
the raw inputs from it, run the Ray pipeline, and assert the denormalization
matches the fixture exactly)."""

import json
import os

import pytest

import ray

from entity_linking_ray.pipelines.transform import (
    combine_entities,
    read_documents_json,
    read_mentions_json,
    split_overlap,
    tiny_split,
    transform_mentions,
)

FIXTURE = "/root/reference/test/data/mentions_train.json"

RAW_FIELDS = (
    "mention_id", "corpus", "context_document_id", "label_document_id",
    "start_index", "end_index", "text", "category",
)


@pytest.fixture(scope="module")
def raw_inputs(tmp_path_factory):
    """Reconstruct raw mentions JSONL + per-corpus documents JSONL from the
    reference's transformed fixture."""
    with open(FIXTURE) as f:
        fixture = json.load(f)
    d = tmp_path_factory.mktemp("zeshel_raw")
    corpora: dict[str, dict[str, dict]] = {}
    with open(d / "mentions.jsonl", "w") as mf:
        for m in fixture.values():
            raw = {k: m[k] for k in RAW_FIELDS}
            mf.write(json.dumps(raw) + "\n")
            for doc in (m["source_document"], m["label_document"]):
                corpora.setdefault(m["corpus"], {})[doc["document_id"]] = doc
    doc_paths, names = [], []
    for corpus, docs in sorted(corpora.items()):
        p = d / f"{corpus}.jsonl"
        with open(p, "w") as df:
            for doc in docs.values():
                df.write(json.dumps(
                    {k: doc[k] for k in ("document_id", "title", "text")}
                ) + "\n")
        doc_paths.append(str(p))
        names.append(corpus)
    return str(d / "mentions.jsonl"), doc_paths, names, fixture


@pytest.fixture(scope="module")
def transformed(raw_inputs):
    mentions_path, doc_paths, names, _ = raw_inputs
    mentions = read_mentions_json(mentions_path)
    documents = read_documents_json(doc_paths, names)
    return transform_mentions(mentions, documents).materialize()


def test_denormalization_matches_reference_fixture(raw_inputs, transformed):
    _, _, _, fixture = raw_inputs
    rows = {r["mention_id"]: r for r in transformed.take_all()}
    assert len(rows) == len(fixture) == 3
    for mid, expected in fixture.items():
        got = rows[mid]
        for k in RAW_FIELDS:
            assert got[k] == expected[k], (mid, k)
        for side in ("source_document", "label_document"):
            for f in ("document_id", "title", "text"):
                assert got[side][f] == expected[side][f], (mid, side, f)


def test_transform_plan_agreement(raw_inputs):
    """The broadcast and join plans resolve identical rows (flat + struct)."""
    mentions_path, doc_paths, names, _ = raw_inputs
    mentions = read_mentions_json(mentions_path)
    documents = read_documents_json(doc_paths, names)
    a = transform_mentions(mentions, documents, plan="broadcast").take_all()
    b = transform_mentions(mentions, documents, plan="join", npart=4).take_all()
    ka = {r["mention_id"]: r for r in a}
    kb = {r["mention_id"]: r for r in b}
    assert set(ka) == set(kb) and len(ka) == 3
    for mid in ka:
        for col in ("src_title", "src_text", "label_title", "label_text",
                    "source_document", "label_document", *RAW_FIELDS):
            assert ka[mid][col] == kb[mid][col], (mid, col)


def test_transform_drops_missing_docs(raw_inputs, tmp_path):
    """A mention referencing an absent document is dropped (counted via
    count_dropped), not crashed on — documented divergence from the
    reference's KeyError."""
    import json as _json

    from entity_linking_ray.pipelines.transform import count_dropped

    mentions_path, doc_paths, names, fixture = raw_inputs
    bad = dict(next(iter(fixture.values())))
    bad = {k: bad[k] for k in RAW_FIELDS}
    bad["mention_id"] = "MISSING01"
    bad["context_document_id"] = "nope_nope_nope_1"
    p = tmp_path / "mentions_bad.jsonl"
    with open(mentions_path) as f, open(p, "w") as g:
        g.write(f.read())
        g.write(_json.dumps(bad) + "\n")
    mentions = read_mentions_json(str(p))
    documents = read_documents_json(doc_paths, names)
    out = transform_mentions(mentions, documents).materialize()
    assert out.count() == 3
    assert count_dropped(mentions, out) == 1


def test_combine_entities_dedups_label_docs(raw_inputs, transformed):
    _, _, _, fixture = raw_inputs
    ents = combine_entities(transformed).materialize()
    expected = {m["label_document"]["document_id"]: m["label_document"]
                for m in fixture.values()}
    got = {r["document_id"]: r for r in ents.take_all()}
    assert set(got) == set(expected)
    for did, doc in expected.items():
        assert got[did]["title"] == doc["title"]
        assert got[did]["text"] == doc["text"]


def test_split_overlap_and_tiny(raw_inputs, transformed):
    ents = combine_entities(transformed).materialize()
    assert split_overlap(ents, ents) == ents.count()
    tiny = tiny_split(transformed, n=2).materialize()
    assert tiny.count() == 2
    ids = [r["mention_id"] for r in tiny.take_all()]
    assert ids == sorted(ids)


def test_write_transformed_json_roundtrip(raw_inputs, transformed, tmp_path):
    from entity_linking_ray.pipelines.transform import write_transformed

    ents = combine_entities(transformed)
    write_transformed(transformed, ents, str(tmp_path))
    import ray.data as rd

    back = rd.read_json(os.path.join(str(tmp_path), "mentions"))
    assert back.count() == transformed.count()


def test_split_overlap_plan_agreement(raw_inputs, transformed):
    """sets and join plans agree on overlapping and disjoint inputs."""
    import pyarrow as pa
    import ray.data as rd

    ents = combine_entities(transformed).materialize()
    n = ents.count()
    assert split_overlap(ents, ents, plan="sets") == n
    assert split_overlap(ents, ents, plan="join") == n
    other = rd.from_arrow(pa.table({
        "document_id": pa.array(["zzz1", "zzz2"]),
        "title": pa.array(["t1", "t2"]),
        "text": pa.array(["x", "y"]),
    }))
    assert split_overlap(ents, other, plan="sets") == 0
    assert split_overlap(ents, other, plan="join") == 0
