"""Distributed transitive clustering: iterative min-label propagation.

The union-find of the north rule, expressed entirely in Ray Data primitives —
a hash-partitioned edge list and repeated rounds of

    msgs   = edges ⋈ labels (on src)         # ship my current label to nbrs
    labels = (msgs ∪ labels).groupby(node).min(label)

until no label changes (checked via an exact join-count of changed nodes).
Labels only decrease, and each round propagates the component minimum one hop
(messages flow both directions because edges are symmetrized), so the loop
converges in <= diameter rounds — near-dup components are shallow (exact-dup
stars + LSH near-cliques), and ``max_cc_rounds`` bounds pathological chains.
Cluster id = the component's minimum node id: fully deterministic, independent
of partitioning/parallelism (the scaling-reproducibility requirement,
SURVEY.md §7.3).

Follows the logarithmic-round MapReduce connected-components literature
("Finding connected components in map-reduce in logarithmic rounds", ICDE
2013 — PAPERS.md); plain min-propagation is chosen over large-star/small-star
because dedup graphs are shallow and each round here is one join + one
pre-aggregated groupby over (node u64, label u64) rows — 16 bytes/row.

Duplicate edges are harmless (min is idempotent), so upstream stages never pay
an extra dedup shuffle for safety.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Min

from ..config import LinkageConfig
from .common import safe_join, scrub_empty_blocks


def _symmetrize(edges):
    def _fwd(t: pa.Table) -> pa.Table:
        return pa.table({"e_src": t.column("src"), "e_dst": t.column("dst")})

    def _rev(t: pa.Table) -> pa.Table:
        return pa.table({"e_src": t.column("dst"), "e_dst": t.column("src")})

    return edges.map_batches(_fwd, batch_format="pyarrow").union(
        edges.map_batches(_rev, batch_format="pyarrow")
    )


def connected_components(edges, cfg: LinkageConfig):
    """edges (src u64, dst u64, ...) -> Dataset(node u64, cluster u64).

    Only nodes that appear in an edge are returned; callers attach singleton
    clusters (cluster = own node) via a left-outer join.
    """
    import ray.data

    sym = _symmetrize(edges).materialize()  # reused every round; 16B/row
    if sym.count() == 0:
        # no edges at all: empty result WITH schema (a zero-block dataset
        # would lose its schema and break downstream joins)
        empty = pa.table(
            {"node": pa.array([], type=pa.int64()), "cluster": pa.array([], type=pa.int64())}
        )
        return ray.data.from_arrow(empty)

    labels = (
        sym.groupby("e_src")
        .aggregate(Min("e_dst", alias_name="nbr_min"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("e_src"),
                    "label": pa.array(
                        np.minimum(
                            t.column("e_src").to_numpy(zero_copy_only=False),
                            t.column("nbr_min").to_numpy(zero_copy_only=False),
                        )
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for _round in range(cfg.max_cc_rounds):
        msgs = safe_join(
            sym,
            labels,
            join_type="inner",
            num_partitions=cfg.shuffle_partitions,
            on=("e_src",),
            right_on=("node",),
        ).map_batches(
            lambda t: pa.table({"node": t.column("e_dst"), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        # materialize first, THEN scrub: scrubbing the lazy aggregate gets
        # fused into the shuffle and the degenerate empty blocks survive
        new_labels = scrub_empty_blocks(
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        ).materialize()
        changed = (
            safe_join(
                new_labels,
                labels.map_batches(
                    lambda t: t.rename_columns(["node", "old_label"]),
                    batch_format="pyarrow",
                ),
                join_type="inner",
                num_partitions=cfg.shuffle_partitions,
                on=("node",),
            )
            .map_batches(
                lambda t: t.filter(
                    pa.compute.not_equal(t["label"], t["old_label"])
                ),
                batch_format="pyarrow",
            )
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.map_batches(
        lambda t: t.rename_columns(["node", "cluster"]), batch_format="pyarrow"
    )
