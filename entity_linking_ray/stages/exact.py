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
from .common import safe_join, scrub_empty_blocks


def exact_collapse(features, cfg: LinkageConfig):
    """features -> (tagged, reps, exact_edges).

    - tagged: features + ``rep_node`` (min node of the row's sha256 group)
    - reps: one representative row per distinct sha256 (node == rep_node)
    - exact_edges: (src=rep_node, dst=node, score=1.0, kind='exact') for dups
    """
    rep_tbl = scrub_empty_blocks(
        features.groupby("sha256").aggregate(Min("node", alias_name="rep_node"))
    )
    tagged = safe_join(
        features,
        rep_tbl,
        join_type="inner",
        num_partitions=cfg.shuffle_partitions,
        on=("sha256",),
    )

    reps = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["node"], t["rep_node"])),
        batch_format="pyarrow",
    )

    def _edges(t: pa.Table) -> pa.Table:
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

    exact_edges = tagged.map_batches(_edges, batch_format="pyarrow")
    return tagged, reps, exact_edges
