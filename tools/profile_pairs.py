"""Sub-stage timing of the blocking path (exact_collapse + lsh pair gen).

    python tools/profile_pairs.py 32 [corpus]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import pyarrow as pa
import ray


def main(ncpu: int, corpus: str) -> None:
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import dataclasses

    from entity_linking_ray.config import LinkageConfig
    from entity_linking_ray.pipelines.linkage import read_corpus
    from entity_linking_ray.stages.blocking import (
        explode_bands_parted, lsh_candidate_pairs, part_pairs,
    )
    from entity_linking_ray.stages.common import default_partitions, partitioned_aggregate
    from entity_linking_ray.stages.exact import exact_collapse
    from entity_linking_ray.stages.featurize import featurize
    from entity_linking_ray.stages.fingerprint import fingerprint
    from entity_linking_ray.functions.hashing import band_keys, splitmix64

    cfg = LinkageConfig(shuffle_partitions=default_partitions(32))
    out: dict = {"ncpu": ncpu}

    feats = featurize(fingerprint(read_corpus(corpus)), cfg).materialize()
    n_rows = feats.count()
    eff_parts = max(4, min(cfg.shuffle_partitions, -(-n_rows // 20_000)))
    cfg = dataclasses.replace(cfg, shuffle_partitions=eff_parts)
    P = cfg.shuffle_partitions
    out["parts"] = P

    t0 = time.time()
    tagged, reps, exact_edges = exact_collapse(feats, cfg)
    out["exact_collapse"] = round(time.time() - t0, 2)
    t0 = time.time()
    reps = reps.materialize()
    out["reps_mat"] = round(time.time() - t0, 2)
    out["n_reps"] = reps.count()

    # --- explode only ---
    t0 = time.time()
    band_rows = reps.map_batches(
        lambda t: explode_bands_parted(t, cfg, P),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    out["explode_mat"] = round(time.time() - t0, 2)
    out["n_band_rows"] = band_rows.count()

    # --- groupby + identity ---
    t0 = time.time()
    band_rows.groupby("__part").map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    ).materialize()
    out["groupby_ident"] = round(time.time() - t0, 2)

    # --- full pair gen (groupby + kernel), no dedup ---
    t0 = time.time()
    pairs_raw = band_rows.groupby("__part").map_groups(
        lambda t: part_pairs(t.drop_columns(["__part"]), cfg),
        batch_format="pyarrow",
    ).materialize()
    out["pairs_nodedup"] = round(time.time() - t0, 2)
    out["n_pairs_raw"] = pairs_raw.count()

    # --- dedup pagg only ---
    t0 = time.time()
    partitioned_aggregate(
        pairs_raw, ["src", "dst"], [("band_key", "min", "__bk")],
        num_partitions=P,
    ).materialize()
    out["dedup_pagg"] = round(time.time() - t0, 2)

    # --- full fused path for reference ---
    t0 = time.time()
    p = lsh_candidate_pairs(reps, cfg).materialize()
    out["lsh_full"] = round(time.time() - t0, 2)
    out["n_pairs"] = p.count()

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    ncpu = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/elr_bench/scaling_100000_s6"
    main(ncpu, corpus)
