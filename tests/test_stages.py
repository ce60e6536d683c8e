"""Stage-level unit tests: fingerprint, featurize, exact collapse, blocking
(incl. hot-block salting), pair scoring, connected components."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from entity_linking_ray.config import LinkageConfig
from entity_linking_ray.stages.blocking import (
    block_stats,
    candidate_pairs,
    explode_bands,
    filter_and_salt,
)
from entity_linking_ray.stages.cluster import connected_components
from entity_linking_ray.stages.exact import exact_collapse
from entity_linking_ray.stages.featurize import FeaturizeStage, featurize
from entity_linking_ray.stages.fingerprint import fingerprint

CFG = LinkageConfig(shuffle_partitions=4)


def _corpus_tbl(rows):
    return pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array(["0" * 40 for _ in rows]),
            "lang": pa.array(["py" for _ in rows]),
            "content": pa.array([r[2] for r in rows]),
        }
    )


def test_fingerprint_columns_and_determinism():
    t = _corpus_tbl([("r1", "a.py", "x = 1"), ("r2", "b.py", "x = 1")])
    out = fingerprint(rd.from_arrow(t)).take_all()
    assert {r["sha256"] for r in out} == {out[0]["sha256"]}  # same content, same sha
    assert out[0]["row_id"] != out[1]["row_id"]  # different key, different id
    assert all(r["node"] >= 0 for r in out)


def test_featurize_stage_drops_content_and_caches():
    cfg = LinkageConfig()
    stage = FeaturizeStage(cfg)
    t = fingerprint(
        rd.from_arrow(_corpus_tbl([("r1", "a.py", "def f(x):\n  return x + 1\n" * 10)]))
    ).take_all()
    batch = pa.table({k: [v] for k, v in t[0].items()})
    out = stage(batch)
    assert "content" not in out.column_names
    assert len(out.column("sig")[0].as_py()) == cfg.num_perm * 4
    assert len(out.column("emb")[0].as_py()) == cfg.embed_dim * 4
    # identical content hits the sha-keyed cache -> identical features
    out2 = stage(batch)
    assert out.column("sig").to_pylist() == out2.column("sig").to_pylist()


def test_exact_collapse_reps_and_edges():
    t = _corpus_tbl(
        [("r1", "a.py", "same"), ("r2", "b.py", "same"), ("r3", "c.py", "other")]
    )
    feats = featurize(fingerprint(rd.from_arrow(t)), CFG).materialize()
    tagged, reps, edges = exact_collapse(feats, CFG)
    assert reps.count() == 2  # two distinct contents
    e = edges.take_all()
    assert len(e) == 1 and e[0]["kind"] == "exact" and e[0]["score"] == 1.0


def test_blocking_identical_rows_collide():
    content = "def f(a, b):\n  return a * b + a - b\n" * 8
    t = _corpus_tbl([("r1", "a.py", content), ("r2", "b.py", content + "\n# x")])
    feats = featurize(fingerprint(rd.from_arrow(t)), CFG).materialize()
    band_rows = explode_bands(feats, CFG).materialize()
    assert band_rows.count() == 2 * CFG.bands
    stats = block_stats(band_rows).materialize()
    # near-identical rows share nearly all bands -> most blocks have 2 members
    sizes = [r["n_members"] for r in stats.take_all()]
    assert max(sizes) == 2 and sizes.count(2) >= CFG.bands // 2


def test_salting_splits_hot_block_and_keeps_rep():
    cfg = LinkageConfig(shuffle_partitions=4, max_block_size=8, salt_shard_size=4)
    # 30 near-identical rows (distinct contents) -> hot blocks
    rows = [("r%d" % i, "f%d.py" % i, "def g(x):\n  return x * 2\n" * 6 + f"# v{i}") for i in range(30)]
    feats = featurize(fingerprint(rd.from_arrow(_corpus_tbl(rows))), cfg).materialize()
    band_rows = explode_bands(feats, cfg).materialize()
    stats = block_stats(band_rows).materialize()
    hot_exists = any(r["n_members"] > cfg.max_block_size for r in stats.take_all())
    assert hot_exists, "test corpus failed to create a hot block"
    salted, n_hot = filter_and_salt(band_rows, stats, cfg)
    salted = salted.materialize()
    assert n_hot > 0
    out_stats = block_stats(salted).materialize()
    sizes = {r["band_key"]: r["n_members"] for r in out_stats.take_all()}
    # salted shards stay near shard_size (hash variance allowed; the hard
    # guarantee is candidate_pairs' per-block cap), far below the hot size 30
    assert max(sizes.values()) <= cfg.max_block_size * 2
    # connectivity: pairs must still link all 30 rows transitively via reps
    pairs = candidate_pairs(salted, cfg).materialize()
    import collections

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.take_all():
        parent[find(r["src"])] = find(r["dst"])
    nodes = [r["node"] for r in feats.take_all()]
    roots = {find(n) for n in nodes}
    assert len(roots) == 1, f"salting broke block connectivity: {len(roots)} comps"


def test_candidate_pairs_unique_and_ordered():
    content = "def f(a):\n  return a + 1\n" * 8
    rows = [("r%d" % i, "f%d.py" % i, content + f"# {i}") for i in range(4)]
    feats = featurize(fingerprint(rd.from_arrow(_corpus_tbl(rows))), CFG).materialize()
    band_rows = explode_bands(feats, CFG).materialize()
    stats = block_stats(band_rows).materialize()
    salted, _ = filter_and_salt(band_rows, stats, CFG)
    pairs = candidate_pairs(salted, CFG).take_all()
    seen = set()
    for r in pairs:
        assert r["src"] < r["dst"]
        assert (r["src"], r["dst"]) not in seen
        seen.add((r["src"], r["dst"]))
    assert len(pairs) == 6  # all 4-choose-2 near-dup pairs survive band dedup


def test_lsh_pair_plans_identical():
    """The block-descriptor plan and the direct pair plan emit the SAME
    unique pair set with the SAME minimum band keys (hot blocks included so
    salting goes through both paths)."""
    import dataclasses

    from entity_linking_ray.stages.blocking import lsh_candidate_pairs
    from entity_linking_ray.stages.exact import exact_collapse

    content = "def f(a):\n  return a + 1\n" * 10
    rows = [("r%d" % i, "f%d.py" % i, content + f"# v{i % 7}") for i in range(40)]
    cfg = dataclasses.replace(CFG, max_block_size=8, salt_shard_size=4)
    feats = featurize(fingerprint(rd.from_arrow(_corpus_tbl(rows))), cfg).materialize()
    _, reps, _ = exact_collapse(feats, cfg)
    reps = reps.materialize()

    def pair_set(plan):
        c = dataclasses.replace(cfg, pair_plan=plan)
        return {
            (r["src"], r["dst"], r["block_key"])
            for r in lsh_candidate_pairs(reps, c).take_all()
        }

    a = pair_set("blocks")
    b = pair_set("pairs")
    assert a and a == b


@pytest.mark.parametrize(
    "cfg",
    [CFG, LinkageConfig(shuffle_partitions=4, driver_cc_edge_limit=0)],
    ids=["driver-uf", "distributed-rounds"],
)
def test_connected_components_chain_and_star(cfg):
    edges = pa.table(
        {
            "src": pa.array([10, 20, 30, 100, 100], type=pa.int64()),
            "dst": pa.array([20, 30, 40, 101, 102], type=pa.int64()),
        }
    )
    out = connected_components(rd.from_arrow(edges), cfg).take_all()
    labels = {r["node"]: r["cluster"] for r in out}
    assert labels[10] == labels[20] == labels[30] == labels[40] == 10
    assert labels[100] == labels[101] == labels[102] == 100


def test_connected_components_plans_agree():
    """Driver union-find and distributed min-label rounds produce identical
    component labels on a random graph."""
    rng = np.random.default_rng(3)
    src = rng.integers(0, 300, 400).astype(np.int64)
    dst = rng.integers(0, 300, 400).astype(np.int64)
    keep = src != dst
    edges = pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})
    a = connected_components(rd.from_arrow(edges), CFG).take_all()
    b = connected_components(
        rd.from_arrow(edges), LinkageConfig(shuffle_partitions=4, driver_cc_edge_limit=0)
    ).take_all()
    assert {(r["node"], r["cluster"]) for r in a} == {(r["node"], r["cluster"]) for r in b}


def test_hash_exchange_bucket_guard_trips_on_wide_rows():
    """The compact-row contract is ENFORCED: a reduce bucket whose shards
    exceed max_bucket_bytes fails loud (pointing at partitions_for_bytes)
    instead of silently staging the payload in plasma."""
    from entity_linking_ray.stages.common import hash_exchange

    wide = pa.table({
        "__part": pa.array([0, 1] * 4, type=pa.int64()),
        "payload": pa.array([b"x" * 100_000] * 8, type=pa.binary()),
    })
    with pytest.raises(Exception, match="max_bucket_bytes"):
        # from_arrow_refs fetches block schemas eagerly, so the reduce-task
        # error can surface inside hash_exchange itself or at consumption
        hash_exchange(
            rd.from_arrow(wide), "__part", 2, lambda t: t, max_bucket_bytes=1000
        ).take_all()


def test_partitions_for_bytes_sizing():
    from entity_linking_ray.stages.common import partitions_for_bytes

    # 10^8 rows x 512 B = 51.2 GB -> ceil(51.2 GB / 256 MB) = 191 buckets
    assert partitions_for_bytes(100_000_000, 512, 16) == 191
    # small corpora keep the caller's base partition count
    assert partitions_for_bytes(10_000, 512, 16) == 16
    # capped: past this raise refs_per_task too (object-count bound)
    assert partitions_for_bytes(10**12, 512, 16) == 4096


def test_exact_collapse_scale_plan_matches_broadcast():
    """The hash_exchange-based scale plan (broadcast gate zeroed) produces
    the same reps and exact edges as the broadcast plan."""
    import dataclasses

    from entity_linking_ray.stages.featurize import featurize as _feat

    t = _corpus_tbl(
        [("r1", "a.py", "same"), ("r2", "b.py", "same"), ("r3", "c.py", "other"),
         ("r4", "d.py", "same"), ("r5", "e.py", "other")]
    )
    feats = _feat(fingerprint(rd.from_arrow(t)), CFG).materialize()
    _, reps_b, edges_b = exact_collapse(feats, CFG)
    scale_cfg = dataclasses.replace(CFG, broadcast_feature_rows=0)
    _, reps_s, edges_s = exact_collapse(feats, scale_cfg)
    rb = sorted(r["node"] for r in reps_b.take_all())
    rs = sorted(r["node"] for r in reps_s.take_all())
    assert rb == rs and len(rb) == 2
    eb = sorted((r["src"], r["dst"]) for r in edges_b.take_all())
    es = sorted((r["src"], r["dst"]) for r in edges_s.take_all())
    assert eb == es and len(eb) == 3
