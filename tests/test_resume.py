"""Checkpoint / resume contract: kill-and-resume produces byte-identical
clusters; config changes invalidate stale checkpoints."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

import ray.data as rd

from entity_linking_ray.config import LinkageConfig
from entity_linking_ray.pipelines.linkage import link_dataset
from entity_linking_ray.sources.synthetic import SynthSpec, generate_corpus


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume")
    corpus, _, _ = generate_corpus(SynthSpec(n_clusters=30))
    p = str(d / "corpus.parquet")
    pq.write_table(corpus, p)
    return p


def _clusters(out):
    return sorted((r["row_id"], r["cluster"]) for r in out.materialize().take_all())


def test_full_and_partial_resume_identical(corpus_path, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    cfg = LinkageConfig(shuffle_partitions=4)
    base = _clusters(link_dataset(corpus_path, cfg, checkpoint_dir=ckpt))
    manifests = sorted(os.listdir(ckpt))
    assert manifests == ["clusters", "edges", "features", "linked"]
    for stage in manifests:
        assert os.path.exists(os.path.join(ckpt, stage, "_MANIFEST.json"))

    # full resume: all stages loaded from manifests
    again = _clusters(link_dataset(corpus_path, cfg, checkpoint_dir=ckpt))
    assert again == base

    # kill-and-resume: wipe the tail stages, recompute only those
    shutil.rmtree(os.path.join(ckpt, "clusters"))
    shutil.rmtree(os.path.join(ckpt, "linked"))
    resumed = _clusters(link_dataset(corpus_path, cfg, checkpoint_dir=ckpt))
    assert resumed == base

    # interrupted write: a dangling tmp dir must not be mistaken for a stage
    os.makedirs(os.path.join(ckpt, "edges.tmp"), exist_ok=True)
    resumed2 = _clusters(link_dataset(corpus_path, cfg, checkpoint_dir=ckpt))
    assert resumed2 == base


def test_config_change_invalidates_checkpoint(corpus_path, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    cfg = LinkageConfig(shuffle_partitions=4)
    _clusters(link_dataset(corpus_path, cfg, checkpoint_dir=ckpt))
    import json

    with open(os.path.join(ckpt, "features", "_MANIFEST.json")) as f:
        m1 = json.load(f)
    assert m1["config_hash"].startswith(cfg.config_hash())

    cfg2 = LinkageConfig(shuffle_partitions=4, tau_jaccard=0.7)
    _clusters(link_dataset(corpus_path, cfg2, checkpoint_dir=ckpt))
    with open(os.path.join(ckpt, "features", "_MANIFEST.json")) as f:
        m2 = json.load(f)
    assert m2["config_hash"].startswith(cfg2.config_hash())
    assert m2["config_hash"] != m1["config_hash"]


def test_partitioned_sink_skips_finished_partitions(tmp_path):
    """run_partitioned: one subdir + manifest per key; a re-run recomputes
    ONLY the partitions whose manifest is gone (the resumable-output
    contract for keyed 100-TB writes)."""
    import pyarrow as pa

    from entity_linking_ray.state.checkpoint import CheckpointManager

    tbl = pa.table({
        "doc_id": pa.array(range(30), type=pa.int64()),
        "lang": pa.array([("en", "de", "fr")[i % 3] for i in range(30)]),
    })
    ds = rd.from_arrow(tbl)
    mgr = CheckpointManager(str(tmp_path / "out"), "cfgh")
    calls = []

    def for_key(v):
        calls.append(v)
        return ds.filter(lambda r: r["lang"] == v)

    parts = mgr.run_partitioned("by_lang", "lang", ["en", "de", "fr"], for_key)
    assert sorted(calls) == ["de", "en", "fr"]
    assert {v: p.count() for v, p in parts.items()} == {"en": 10, "de": 10, "fr": 10}

    # finished partitions skipped; only the wiped one recomputes
    calls.clear()
    shutil.rmtree(str(tmp_path / "out" / "by_lang" / "lang=de"))
    parts2 = mgr.run_partitioned("by_lang", "lang", ["en", "de", "fr"], for_key)
    assert calls == ["de"]
    assert {v: p.count() for v, p in parts2.items()} == {"en": 10, "de": 10, "fr": 10}


def test_curation_split_resume_identical(tmp_path):
    """Kill-and-resume over a representative CURATION pipeline (the
    train/valid/test split write of q_split_assign, one resumable directory
    per split via run_partitioned): the interrupted run recomputes ONLY the
    killed partition — finished manifests are not rewritten — and the
    resumed output equals the uninterrupted run's exactly."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from entity_linking_ray.state.checkpoint import CheckpointManager

    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    t_cut, v_cut = int(0.8 * 65536), int(0.9 * 65536)

    def for_split(split):
        def assign(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            u = np.fromiter(
                (int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
                 for i in ids),
                dtype=np.int64, count=len(ids),
            )
            s = np.where(u < t_cut, "train",
                         np.where(u < v_cut, "valid", "test"))
            return t.filter(pa.array(s == split))
        return docs.map_batches(assign, batch_format="pyarrow")

    def run(root):
        mgr = CheckpointManager(root, "cfg-split")
        return mgr.run_partitioned("splits", "split",
                                   ["train", "valid", "test"], for_split)

    full = run(str(tmp_path / "A"))

    # interrupted run: test partition dies after train+valid landed
    root_b = str(tmp_path / "B")
    run(root_b)
    shutil.rmtree(os.path.join(root_b, "splits", "split=test"))
    mpath = lambda s: os.path.join(root_b, "splits", f"split={s}",
                                   "_MANIFEST.json")
    before = {s: os.path.getmtime(mpath(s)) for s in ("train", "valid")}
    resumed = run(root_b)
    after = {s: os.path.getmtime(mpath(s)) for s in ("train", "valid")}
    assert before == after  # finished partitions skipped, never rewritten

    total = 0
    for s in ("train", "valid", "test"):
        a = full[s].to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = resumed[s].to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        total += len(a)
    assert total == docs.count()  # partition of the corpus, nothing lost


def test_input_change_invalidates_checkpoint(tmp_path):
    """Re-pointing a checkpoint dir at CHANGED input data must recompute,
    not silently return the stale clusters (the input fingerprint is part of
    the checkpoint gate for path corpora)."""
    import pyarrow as pa

    ckpt = str(tmp_path / "ckpt3")
    p = str(tmp_path / "corpus.parquet")
    cfg = LinkageConfig(shuffle_partitions=4)

    corpus, _, _ = generate_corpus(SynthSpec(n_clusters=10))
    pq.write_table(corpus, p)
    base = _clusters(link_dataset(p, cfg, checkpoint_dir=ckpt))

    bigger, _, _ = generate_corpus(SynthSpec(n_clusters=12))
    pq.write_table(bigger, p)  # same path, different content
    fresh = _clusters(link_dataset(p, cfg, checkpoint_dir=str(tmp_path / "ckptF")))
    resumed = _clusters(link_dataset(p, cfg, checkpoint_dir=ckpt))
    assert resumed == fresh
    assert len(resumed) == bigger.num_rows != len(base)
