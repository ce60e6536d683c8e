"""Per-stage wall-time profile of the flagship linkage pipeline (fused path).

    python tools/profile_linkage.py 32 /tmp/elr_bench/scaling_100000_s6
    python tools/profile_linkage.py 8  /tmp/elr_bench/scaling_100000_s6

Barriers make the total slightly worse than the real pipeline (which overlaps
stages); the point is the per-stage breakdown, not the total.
"""

from __future__ import annotations

import json
import sys
import time

import ray


def main(ncpu: int, corpus: str) -> None:
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import dataclasses

    from entity_linking_ray.config import LinkageConfig
    from entity_linking_ray.pipelines.linkage import attach_clusters, read_corpus
    from entity_linking_ray.stages.blocking import lsh_candidate_pairs
    from entity_linking_ray.stages.cluster import connected_components
    from entity_linking_ray.stages.exact import exact_collapse
    from entity_linking_ray.stages.featurize import featurize
    from entity_linking_ray.stages.fingerprint import fingerprint
    from entity_linking_ray.stages.scoring import filter_edges, score_edges
    from entity_linking_ray.stages.common import default_partitions

    cfg = LinkageConfig(shuffle_partitions=default_partitions(32))
    timings: dict[str, float] = {}
    t_all = time.time()

    def timed(name, fn, drain=True):
        t0 = time.time()
        out = fn()
        if drain and hasattr(out, "materialize"):
            out = out.materialize()
        timings[name] = round(time.time() - t0, 2)
        return out

    ds = read_corpus(corpus)
    feats = timed("featurize", lambda: featurize(fingerprint(ds), cfg))
    n_rows = feats.count()
    eff_parts = max(4, min(cfg.shuffle_partitions, -(-n_rows // 20_000)))
    cfg = dataclasses.replace(cfg, shuffle_partitions=eff_parts)
    timings["parts"] = eff_parts

    t0 = time.time()
    tagged, reps, exact_edges = exact_collapse(feats, cfg)
    timings["exact_collapse"] = round(time.time() - t0, 2)
    pairs = timed("lsh_pairs", lambda: lsh_candidate_pairs(reps, cfg))
    timings["n_pairs"] = pairs.count()
    edges = timed("score_edges", lambda: filter_edges(
        exact_edges.union(score_edges(pairs, feats, cfg)), cfg))
    timings["n_edges"] = edges.count()
    clusters = timed("connected_components", lambda: connected_components(edges, cfg))
    keep = ["row_id", *[c for c in cfg.passthrough_cols], "sha256", "node"]
    slim = feats.map_batches(
        lambda t: t.select([c for c in keep if c in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)
    out = timed("attach_clusters", lambda: attach_clusters(slim, clusters, cfg))
    timings["total"] = round(time.time() - t_all, 2)
    timings["n_files"] = n_rows
    timings["ncpu"] = ncpu
    print(json.dumps(timings))
    ray.shutdown()


if __name__ == "__main__":
    ncpu = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/elr_bench/scaling_100000_s6"
    main(ncpu, corpus)
