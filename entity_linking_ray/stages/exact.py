"""Exact-duplicate collapse on sha256 — the short-circuit before LSH.

Code corpora are dominated by byte-identical files (vendored libraries, license
boilerplate). Collapsing them first (a) turns the hottest LSH blocks into
single representatives, (b) yields guaranteed-correct edges for free, and (c)
shrinks the candidate space the bi-encoder ever sees. Reference analog: exact
dedup by key via dict insertion (/root/reference/src/transform_zeshel.py:29-31,
SURVEY.md D1) — re-expressed as groupby-min + a hash-shuffle join.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Min

from ..config import LinkageConfig
from .common import partitioned_aggregate, safe_join, scrub_empty_blocks


def _edges_from_tagged(t: pa.Table) -> pa.Table:
    dup = t.filter(pc.not_equal(t["node"], t["rep_node"]))
    n = dup.num_rows
    return pa.table(
        {
            "src": dup.column("rep_node"),
            "dst": dup.column("node"),
            "score": pa.array([1.0] * n, type=pa.float64()),
            "kind": pa.array(["exact"] * n, type=pa.string()),
            "matched": pa.array([True] * n, type=pa.bool_()),
            "block_key": pa.array([0] * n, type=pa.int64()),
        }
    )


def exact_collapse(features, cfg: LinkageConfig):
    """features -> (tagged, reps, exact_edges).

    - tagged: features + ``rep_node`` — ONLY on the join (scale) plan; the
      broadcast plan returns None (nothing downstream needs it)
    - reps: one representative row per distinct sha256 (node == rep_node)
    - exact_edges: (src=rep_node, dst=node, score=1.0, kind='exact') for dups
    """
    def _sha_part(t: pa.Table):
        import numpy as np

        return np.array(
            [int(s[:12], 16) for s in t.column("sha256").to_pylist()], dtype=np.uint64
        )

    rep_tbl = scrub_empty_blocks(
        partitioned_aggregate(
            features.map_batches(
                lambda t: t.select(["sha256", "node"]), batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            ["sha256"],
            [("node", "min", "rep_node")],
            num_partitions=cfg.shuffle_partitions,
            part_from=_sha_part,
        )
    ).materialize()

    if rep_tbl.count() <= cfg.broadcast_feature_rows:
        # broadcast plan, two cheap passes instead of a join:
        # - reps: membership filter against the sorted rep-node array
        #   (numpy via plasma = zero-copy per task)
        # - exact edges: sha->rep dict built once per actor (AttachRep), rows
        #   with node != rep only
        import numpy as np

        import ray

        rep_refs = rep_tbl.to_arrow_refs()
        rep_nodes = np.sort(np.concatenate([
            t.column("rep_node").to_numpy()
            for t in (ray.get(r) for r in rep_refs) if t.num_rows
        ]))
        nref = ray.put(rep_nodes)

        def _is_rep(t: pa.Table) -> pa.Table:
            rn = ray.get(nref)
            node = t.column("node").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(rn, node)
            idx[idx >= rn.shape[0]] = 0
            return t.filter(pa.array(rn[idx] == node))

        reps = features.map_batches(_is_rep, batch_format="pyarrow", zero_copy_batch=True)

        class AttachRep:
            def __init__(self):
                m: dict[str, int] = {}
                for r in rep_refs:
                    t = ray.get(r)
                    if t.num_rows:
                        m.update(zip(t.column("sha256").to_pylist(),
                                     t.column("rep_node").to_pylist()))
                self.m = m

            def __call__(self, t: pa.Table) -> pa.Table:
                m = self.m
                reps_col = [m[s] for s in t.column("sha256").to_pylist()]
                return t.append_column("rep_node", pa.array(reps_col, type=pa.int64()))

        dup_tagged = features.map_batches(
            lambda t: t.select(["sha256", "node"]), batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(AttachRep, batch_format="pyarrow", concurrency=(1, 8))
        exact_edges = dup_tagged.map_batches(_edges_from_tagged, batch_format="pyarrow")
        return None, reps, exact_edges
    else:
        # scale plan: hash-shuffle join on sha256.
        # materialized either way: two consumers (reps filter + dup-edge
        # projection) would otherwise each re-execute; rows are compact.
        tagged = safe_join(
            features,
            rep_tbl,
            join_type="inner",
            num_partitions=cfg.shuffle_partitions,
            on=("sha256",),
        ).materialize()

    reps = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["node"], t["rep_node"])),
        batch_format="pyarrow",
    )
    exact_edges = tagged.map_batches(_edges_from_tagged, batch_format="pyarrow")
    return tagged, reps, exact_edges
