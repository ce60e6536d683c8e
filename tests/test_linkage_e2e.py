"""End-to-end linkage pipeline tests: pairwise F1 >= 0.99, sha256 invariant,
exact-dup clustering, determinism across runs.

Mirrors the reference's evaluation contract (retrieval-quality assertions,
/root/reference/src/eval_zeshel.py:38-53) generalized to cluster F1 per
BASELINE.json.
"""

import numpy as np
import pytest

import ray
import ray.data as rd

from entity_linking_ray.config import LinkageConfig
from entity_linking_ray.pipelines.evaluate import pairwise_f1
from entity_linking_ray.pipelines.linkage import link_dataset, verify_sha256
from entity_linking_ray.sources.synthetic import SynthSpec, generate_corpus

CFG = LinkageConfig(shuffle_partitions=4)


@pytest.fixture(scope="module")
def small_corpus():
    return generate_corpus(SynthSpec(n_clusters=40))


@pytest.fixture(scope="module")
def linked(small_corpus):
    corpus, gold, pairs = small_corpus
    out = link_dataset(rd.from_arrow(corpus), CFG).materialize()
    return out


def test_row_count_preserved(small_corpus, linked):
    corpus, _, _ = small_corpus
    assert linked.count() == corpus.num_rows


def test_pairwise_f1_meets_target(small_corpus, linked):
    _, _, pairs = small_corpus
    res = pairwise_f1(linked, pairs, CFG)
    assert res["f1"] >= 0.99, res
    assert res["precision"] >= 0.99, res
    assert res["recall"] >= 0.99, res


def test_sha256_invariant_end_to_end(small_corpus, linked):
    corpus, _, _ = small_corpus
    assert verify_sha256(linked, rd.from_arrow(corpus), CFG) == 0


def test_exact_duplicates_share_cluster(linked):
    import collections

    rows = linked.take_all()
    by_sha = collections.defaultdict(set)
    for r in rows:
        by_sha[r["sha256"]].add(r["cluster"])
    for sha, clusters in by_sha.items():
        assert len(clusters) == 1, f"sha {sha} split across clusters {clusters}"


def test_gold_clusters_recovered(small_corpus, linked):
    """Predicted partition must equal the planted partition on >=99% of rows
    (measured pairwise over gold clusters)."""
    corpus, gold, _ = small_corpus
    pred = {r["row_id"]: r["cluster"] for r in linked.take_all()}
    gold_map = dict(zip(gold.column("row_id").to_pylist(), gold.column("gold_cluster").to_pylist()))
    import collections

    gold_groups = collections.defaultdict(list)
    for rid, gc in gold_map.items():
        gold_groups[gc].append(rid)
    mismatch = total = 0
    for members in gold_groups.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                total += 1
                if pred[members[i]] != pred[members[j]]:
                    mismatch += 1
    assert total > 0
    assert mismatch / total <= 0.01, f"{mismatch}/{total} intra-gold pairs split"


def test_deterministic_across_runs(small_corpus, linked):
    corpus, _, _ = small_corpus
    again = link_dataset(rd.from_arrow(corpus), CFG).materialize()
    a = {r["row_id"]: r["cluster"] for r in linked.take_all()}
    b = {r["row_id"]: r["cluster"] for r in again.take_all()}
    assert a == b


def test_scale_plans_match_broadcast_plans(small_corpus, linked):
    """Force every size-gated SCALE plan (shuffle-join scoring, exact-collapse
    join, join-based cluster attach) by zeroing the broadcast gates; cluster
    output must be identical to the broadcast plans' (mirrors the driver-vs-
    distributed CC parametrization)."""
    corpus, _, _ = small_corpus
    cfg = LinkageConfig(
        shuffle_partitions=4,
        broadcast_feature_rows=0,
        broadcast_key_limit=0,
    )
    out = link_dataset(rd.from_arrow(corpus), cfg).materialize()
    a = {r["row_id"]: r["cluster"] for r in linked.take_all()}
    b = {r["row_id"]: r["cluster"] for r in out.take_all()}
    assert a == b


def test_compact_pack_matches_default(small_corpus, linked):
    """cfg.compact_pack (uint8 sig fingerprints + int8 affine embedding
    codes in the broadcast score pack) quantizes scores by ~1e-3 — far
    inside borderline_margin — so clusters and F1 must match the default
    full-precision plan exactly on the planted corpus."""
    corpus, _, pairs = small_corpus
    cfg = LinkageConfig(shuffle_partitions=4, compact_pack=True)
    out = link_dataset(rd.from_arrow(corpus), cfg).materialize()
    a = {r["row_id"]: r["cluster"] for r in linked.take_all()}
    b = {r["row_id"]: r["cluster"] for r in out.take_all()}
    assert a == b
    f1 = pairwise_f1(out, pairs, cfg)
    assert f1["f1"] >= 0.99, f1
