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


def partitioned_aggregate(ds, keys, aggs, num_partitions: int, part_from=None):
    """Vectorized high-cardinality grouped aggregate.

    Ray 2.49's ``groupby().aggregate()`` finalizes per DISTINCT KEY in Python —
    at ~10^6 groups it takes minutes for work pyarrow does in milliseconds. This
    helper shuffles on a low-cardinality bucket column (hash(key) % P, P =
    num_partitions) so Ray only sees P groups, then runs the real aggregation
    inside each bucket with the C++ ``pyarrow.Table.group_by`` kernel. Same
    result set as a direct groupby; any key's rows land in exactly one bucket.

    - keys: group-by column names.
    - aggs: list of (col, fn, out_name) with fn in pyarrow's group_by set
      ("count", "min", "max", "sum", ...).
    - part_from: optional callable(table) -> int64 ndarray of raw hash values
      (needed for non-integer keys, e.g. hex digests); defaults to mixing the
      integer key columns.
    """
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import splitmix64

    key_list = list(keys)
    agg_list = list(aggs)

    def _default_part(t: pa.Table) -> "np.ndarray":
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for k in key_list:
            col = t.column(k).to_numpy(zero_copy_only=False)
            h ^= splitmix64(col.astype(np.uint64) + np.uint64(0x9E37))
        return h

    part_fn = part_from or _default_part

    def _add_part(t: pa.Table) -> pa.Table:
        h = part_fn(t)
        return t.append_column(
            "__part", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def _agg_part(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        out = t.group_by(key_list).aggregate([(c, f) for c, f, _ in agg_list])
        # pyarrow names outputs "<col>_<fn>"; rename to the requested names
        rename = {f"{c}_{f}": name for c, f, name in agg_list}
        cols = [rename.get(c, c) for c in out.column_names]
        return out.rename_columns(cols)

    return (
        ds.map_batches(_add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_agg_part, batch_format="pyarrow")
    )


def bucketed_map_groups(ds, key_cols, kernel, num_partitions: int, part_from=None):
    """Vectorized high-cardinality grouped transform.

    ``groupby(key).map_groups(fn)`` pays a Python call per DISTINCT key —
    disastrous at ~10^5+ groups. This helper hash-buckets rows on the group
    key into ``num_partitions`` buckets (Ray shuffles P groups, not one per
    key) and runs ``kernel`` — a pyarrow-table function that must handle MANY
    complete groups at once with vectorized segment math — inside each
    bucket. Any key's rows land in exactly one bucket, so kernels that only
    need within-group context are exact.
    """
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import splitmix64

    key_list = list(key_cols)

    def _default_part(t: pa.Table) -> "np.ndarray":
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for k in key_list:
            col = t.column(k).to_numpy(zero_copy_only=False)
            h ^= splitmix64(col.astype(np.uint64) + np.uint64(0x9E37))
        return h

    part_fn = part_from or _default_part

    def _add_part(t: pa.Table) -> pa.Table:
        h = part_fn(t)
        return t.append_column(
            "__part", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    return (
        ds.map_batches(_add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda t: kernel(t.drop_columns(["__part"])), batch_format="pyarrow"
        )
    )


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
