"""Exact-duplicate collapse on sha256 — the short-circuit before LSH.

Code corpora are dominated by byte-identical files (vendored libraries, license
boilerplate). Collapsing them first (a) turns the hottest LSH blocks into
single representatives, (b) yields guaranteed-correct edges for free, and (c)
shrinks the candidate space the bi-encoder ever sees. Reference analog: exact
dedup by key via dict insertion (/root/reference/src/transform_zeshel.py:29-31,
SURVEY.md D1) — re-expressed as a single hash-shuffled per-partition
group-min + in-process join emitting the rep mapping and dup edges at once.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import LinkageConfig
from .common import safe_join


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

    ONE hash shuffle of the 16-byte-payload (sha256, node) rows produces the
    full (rep_node, node) mapping directly — inside each partition a pyarrow
    ``group_by(min)`` + in-process hash join attach the per-sha rep to every
    row, so no second shuffle or per-actor dict build is needed. The rep
    membership filter over ``features`` is a broadcast sorted-numpy lookup
    below ``cfg.broadcast_feature_rows`` distinct shas, else a hash join on
    ``node`` (the scale plan).
    """
    import numpy as np

    import ray

    def _add_part(t: pa.Table) -> pa.Table:
        part = np.array(
            [int(s[:12], 16) % cfg.shuffle_partitions
             for s in t.column("sha256").to_pylist()],
            dtype=np.int64,
        )
        return t.append_column("__part", pa.array(part))

    def _rep_emit(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        rep = t.group_by(["sha256"]).aggregate([("node", "min")])
        j = t.join(rep, keys="sha256")
        return pa.table({"rep_node": j.column("node_min"), "node": j.column("node")})

    mapping = (
        features.map_batches(
            lambda t: _add_part(t.select(["sha256", "node"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("__part")
        .map_groups(_rep_emit, batch_format="pyarrow")
        .materialize()
    )
    exact_edges = mapping.map_batches(_edges_from_tagged, batch_format="pyarrow")

    n_rows = features.count()
    if n_rows <= cfg.broadcast_feature_rows:
        # broadcast plan: collect the distinct rep nodes (8 B each) and filter
        # features by a sorted-array membership test (numpy via plasma =
        # zero-copy mmap per task)
        parts = [
            t.column("rep_node").to_numpy()[
                t.column("rep_node").to_numpy() == t.column("node").to_numpy()
            ]
            for t in (ray.get(r) for r in mapping.to_arrow_refs())
            if t.num_rows
        ]
        rep_nodes = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        nref = ray.put(rep_nodes)

        def _is_rep(t: pa.Table) -> pa.Table:
            rn = ray.get(nref)
            node = t.column("node").to_numpy(zero_copy_only=False)
            if rn.shape[0] == 0:
                return t.slice(0, 0)
            idx = np.searchsorted(rn, node)
            idx[idx >= rn.shape[0]] = 0
            return t.filter(pa.array(rn[idx] == node))

        reps = features.map_batches(_is_rep, batch_format="pyarrow", zero_copy_batch=True)
        return None, reps, exact_edges

    # scale plan: hash-shuffle join on node (int64 — cheaper than the sha256
    # string key). materialized: two consumers (reps filter + dup-edge
    # projection) would otherwise each re-execute; rows are compact.
    tagged = safe_join(
        features,
        mapping,
        join_type="inner",
        num_partitions=cfg.shuffle_partitions,
        on=("node",),
    ).materialize()
    reps = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["node"], t["rep_node"])),
        batch_format="pyarrow",
    )
    return tagged, reps, exact_edges
