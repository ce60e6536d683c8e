"""Shared stage utilities."""

from __future__ import annotations


def default_partitions(cap: int = 16) -> int:
    """Shuffle partition count sized to the session: hash-shuffle aggregator
    pools plus the stateful actor pools can starve each other when a single
    operator's partition count exceeds the CPU count (observed as a full
    pipeline deadlock at num_cpus=4 with 8 partitions)."""
    import ray

    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(cap, cpus))


def scrub_empty_blocks(ds, batch_size: int = 65536):
    """Work around a Ray Data 2.49 artifact: groupby-aggregate outputs fed by
    unions/joins can contain zero-column EMPTY blocks (``schema=[]``), and a
    downstream hash-shuffle join then fails inside Arrow acero with
    "No match or multiple matches for key field reference".

    An identity ``map_batches`` with an explicit ``batch_size`` re-batches
    across blocks and skips the degenerate empties (without ``batch_size`` Ray
    maps block->block 1:1 and the empty blocks survive). Apply to any
    aggregate output that feeds a join.
    """
    return ds.map_batches(lambda t: t, batch_format="pyarrow", batch_size=batch_size)


def safe_join(left, right, join_type: str, num_partitions: int, on, right_on=None):
    """``Dataset.join`` with both inputs scrubbed of degenerate empty blocks.

    Ray 2.49's hash-shuffle join crashes ("No match or multiple matches for
    key field reference ...") whenever an input contains the zero-column empty
    blocks that join/aggregate outputs can emit. Every join in this package
    goes through here; the scrub is one extra zero-copy-ish identity pass per
    side.
    """
    return scrub_empty_blocks(left).join(
        scrub_empty_blocks(right),
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )
