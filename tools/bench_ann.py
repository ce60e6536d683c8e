"""ANN bench over the REAL featurize embeddings of the 375k-file corpus.

    python tools/bench_ann.py [ncpu] [corpus_dir]

Runs fingerprint+featurize over the scaling corpus (not timed), converts the
packed binary ``emb`` column to the list<float> layout the ANN stages take,
then times brute-force vs IVF top-10 for $ANN_QUERIES (default 200)
queries and reports IVF
recall@10 against the brute-force baseline. Records the VERDICT item "ANN on
the 375k-corpus embeddings benched".
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
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")

    from entity_linking_ray.config import LinkageConfig
    from entity_linking_ray.pipelines.linkage import read_corpus
    from entity_linking_ray.stages.ann import brute_force_topk, ivf_topk
    from entity_linking_ray.stages.featurize import featurize
    from entity_linking_ray.stages.fingerprint import fingerprint
    from entity_linking_ray.stages.scoring import _binary_blob

    cfg = LinkageConfig()
    dim = cfg.embed_dim

    def _to_list(t: pa.Table) -> pa.Table:
        blob, _ = _binary_blob(t.column("emb"))
        m = blob.view(np.float32).reshape(-1, dim).astype(np.float64)
        return pa.table({
            "vec_id": t.column("node"),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel()), dim
            ),
        })

    feats = featurize(fingerprint(read_corpus(corpus)), cfg)
    cands = feats.map_batches(
        lambda t: _to_list(t.select(["node", "emb"])), batch_format="pyarrow"
    ).materialize()
    n = cands.count()
    # deterministic query pick: block arrival order varies run to run, so
    # limit(200) would select a different query set each run — take the 200
    # smallest node ids instead
    import pyarrow.compute as pc

    import os

    nq = int(os.environ.get("ANN_QUERIES", "200"))
    qids = np.sort(np.concatenate([
        ray.get(r).column("vec_id").to_numpy()
        for r in cands.select_columns(["vec_id"]).to_arrow_refs()
    ]))[:nq]
    qref = ray.put(np.array(qids))
    queries = cands.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], pa.array(ray.get(qref)))),
        batch_format="pyarrow",
    ).materialize()

    t0 = time.time()
    brute = brute_force_topk(queries, cands, k=10).materialize()
    t_brute = round(time.time() - t0, 2)

    t0 = time.time()
    ivf = ivf_topk(queries, cands, k=10, n_cells=512, n_probe=32,
                   num_partitions=min(16, ncpu)).materialize()
    t_ivf = round(time.time() - t0, 2)

    from entity_linking_ray.stages.ann import autotune_lsh, lsh_topk

    n_bits, n_tables = autotune_lsh(n)
    t0 = time.time()
    lsh = lsh_topk(queries, cands, k=10, n_bits=n_bits, n_tables=n_tables,
                   num_partitions=min(16, ncpu)).materialize()
    t_lsh = round(time.time() - t0, 2)

    bt = brute.to_pandas()
    it = ivf.to_pandas()
    lt = lsh.to_pandas()
    bset = set(zip(bt["query_id"], bt["neighbor_id"]))
    iset = set(zip(it["query_id"], it["neighbor_id"]))
    lset = set(zip(lt["query_id"], lt["neighbor_id"]))
    recall = round(len(bset & iset) / max(1, len(bset)), 4)
    recall_lsh = round(len(bset & lset) / max(1, len(bset)), 4)

    print(json.dumps({
        "metric": "ann_375k", "n_candidates": n, "n_queries": nq, "k": 10,
        "brute_sec": t_brute, "ivf_sec": t_ivf, "ivf_recall_at_10": recall,
        "n_cells": 512, "n_probe": 32, "ncpu": ncpu,
        "lsh_sec": t_lsh, "lsh_recall_at_10": recall_lsh,
        "lsh_n_bits": n_bits, "lsh_n_tables": n_tables,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/elr_bench/scaling_100000_s6")
