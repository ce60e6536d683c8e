"""Isolate exact_collapse + explode_bands slowdown at high num_cpus.

    python tools/micro_exact.py 8
    python tools/micro_exact.py 32
"""
import json
import sys
import time

import ray


def main(ncpu: int) -> None:
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import dataclasses
    from entity_linking_ray.config import LinkageConfig
    from entity_linking_ray.pipelines.linkage import read_corpus
    from entity_linking_ray.stages.blocking import explode_bands
    from entity_linking_ray.stages.exact import exact_collapse
    from entity_linking_ray.stages.featurize import featurize
    from entity_linking_ray.stages.fingerprint import fingerprint
    from entity_linking_ray.stages.common import default_partitions

    cfg = LinkageConfig(shuffle_partitions=default_partitions(32))
    out = {"ncpu": ncpu}

    t0 = time.time()
    feats = featurize(fingerprint(read_corpus(
        "/tmp/elr_bench/scaling_100000_s6")), cfg).materialize()
    out["featurize"] = round(time.time() - t0, 2)
    out["feat_blocks"] = feats.num_blocks()
    cfg = dataclasses.replace(cfg, shuffle_partitions=8)

    t0 = time.time()
    tagged, reps, exact_edges = exact_collapse(feats, cfg)
    reps = reps.materialize()
    out["reps_mat"] = round(time.time() - t0, 2)
    out["reps_blocks"] = reps.num_blocks()
    t0 = time.time()
    exact_edges = exact_edges.materialize()
    out["edges_mat"] = round(time.time() - t0, 2)

    t0 = time.time()
    band_rows = explode_bands(reps, cfg).materialize()
    out["explode"] = round(time.time() - t0, 2)
    out["band_blocks"] = band_rows.num_blocks()
    stats_str = band_rows.stats()
    print(json.dumps(out))
    sys.stderr.write(stats_str[-4000:] + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
