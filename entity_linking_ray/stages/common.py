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


def effective_broadcast_rows(limit: int, bytes_per_row: int = 1300,
                             frac: float = 0.05) -> int:
    """Clamp a broadcast-plan row gate against the ACTUAL object-store size.

    The configured gate (``cfg.broadcast_feature_rows``) assumes a plasma
    store big enough to hold the packed feature arrays (~1.3 KB/row for the
    sig+emb+tokseq pack); on hosts with small object stores (Ray default:
    30% of RAM) a static 3M-row gate could pick the broadcast plan for a
    corpus whose pack spills or fails the ``ray.put``. The effective gate is
    ``min(limit, frac * min_per_node_object_store_bytes / bytes_per_row)``.

    The clamp uses the MINIMUM per-node store, not the cluster aggregate: a
    broadcast ``ray.put`` object is replicated into every node's plasma, so
    it must fit the smallest node — on an N-node cluster the aggregate would
    inflate the gate ~N-fold and stop protecting anything. On a homogeneous
    cluster min-per-node is the same on every node, so plan selection stays
    deterministic across parallelism levels. Both plans produce identical
    output (plan-agreement tested), so a clamp never changes results.
    """
    import ray

    if not ray.is_initialized():
        return limit
    per_node = [
        n.get("Resources", {}).get("object_store_memory")
        for n in ray.nodes()
        if n.get("Alive")
    ]
    per_node = [p for p in per_node if p]
    plasma = min(per_node) if per_node else ray.cluster_resources().get(
        "object_store_memory"
    )
    if not plasma:
        return limit
    return max(10_000, min(limit, int(plasma * frac / bytes_per_row)))


def collect_projected(ds, pack_fn):
    """Run ``pack_fn`` (Table -> compact Table) over ``ds`` as a Dataset map
    and collect the small outputs to the driver.

    The projection executes WHERE THE BLOCKS LIVE (node-local at multi-node
    scale) and only the packed columns cross the wire. Implemented as a
    Dataset ``map_batches`` rather than a raw ``ray.remote`` fan-out: a raw
    per-block task storm right after an actor-pool stage was measured at
    ~15 s for 200 trivial tasks at 16 CPUs (cold-worker churn), while the
    Data executor's warm pool does the same projection in ~2 s.

    Returns the list of non-empty packed Arrow tables."""
    import ray

    # batch_size=None maps block -> block with no rebatching copy of the wide
    # input columns; empty outputs are dropped after the driver collect
    proj = ds.map_batches(
        pack_fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return [t for t in ray.get(proj.to_arrow_refs()) if t.num_rows]


def _split_by(t, col: str, P: int):
    """Table -> P tables sliced by the int bucket column ``col`` (values must
    lie in [0, P)); the bucket column is dropped. One argsort + P slices."""
    import numpy as np

    pcol = t.column(col).to_numpy(zero_copy_only=False)
    order = np.argsort(pcol, kind="stable")
    ts = t.drop_columns([col]).take(order)
    counts = np.bincount(pcol[order], minlength=P)
    offs = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    return [ts.slice(offs[i], counts[i]) for i in range(P)]


def _concat_shards(tabs):
    """Concat block shards tolerating Ray 2.49's degenerate empty blocks
    (groupby/join outputs can emit 0-row blocks with ``schema=[]``, which an
    upstream ``_add_part`` turns into a ``__part``-only schema) and benign
    column-order drift between blocks."""
    import pyarrow as pa

    # streamed ref bundles hand over RAW blocks (no to_arrow_refs conversion
    # pass); every pipeline here emits Arrow, but a caller feeding a pandas-
    # formatted dataset still gets correct results
    tabs = [t if isinstance(t, pa.Table) else pa.Table.from_pandas(t) for t in tabs]
    live = [t for t in tabs if t.num_rows]
    if not live:
        # all empty: keep the widest schema so downstream column refs survive
        return max(tabs, key=lambda t: t.num_columns)
    if len(live) == 1:
        return live[0]
    names = live[0].column_names
    live = [t if t.column_names == names else t.select(names) for t in live]
    return pa.concat_tables(live)


def _exch_split(col, P, pre, *tabs):
    t = _concat_shards(tabs)
    # all-degenerate empties (0-column blocks from union/join outputs) carry
    # no schema for ``pre`` to read — skip straight to the no-rows route
    if pre is not None and t.num_columns > 0:
        t = pre(t)
    if col not in t.column_names:  # all-degenerate empties: no rows to route
        return [t] * P
    return _split_by(t, col, P)


def _exch_reduce(kernel, col2, P, max_bucket_bytes, *shards):
    if max_bucket_bytes is not None:
        got = sum(t.nbytes for t in shards if hasattr(t, "nbytes"))
        if got > max_bucket_bytes:
            raise ValueError(
                f"hash_exchange bucket holds {got} bytes > max_bucket_bytes="
                f"{max_bucket_bytes} (P={P}); the exchange stages every shard "
                "in plasma with no backpressure — raise num_partitions (use "
                "partitions_for_bytes) or keep wide payloads on Ray-native ops"
            )
    out = kernel(_concat_shards(shards))
    if col2 is None:
        return out
    return _split_by(out, col2, P)


def partitions_for_bytes(n_rows: int, bytes_per_row: int, base: int,
                         target_bucket_bytes: int = 256 << 20,
                         cap: int = 4096) -> int:
    """Partition count for a hash_exchange sized so each reduce bucket's
    concatenated shards stay under ``target_bucket_bytes`` of heap — the
    enforcement half of hash_exchange's compact-row contract. Returns
    ``max(base, ceil(total_bytes / target))`` capped at ``cap`` (object count
    scales with P x split tasks; past the cap raise ``refs_per_task`` too)."""
    need = -(-(n_rows * bytes_per_row) // target_bucket_bytes)
    return max(base, min(cap, int(need)))


def hash_exchange(ds, col, P, kernel, col2=None, kernel2=None, refs_per_task=4,
                  pre=None, max_bucket_bytes: int | None = 2 << 30):
    """Manual hash exchange: split every block by the int bucket column
    ``col`` (values in [0, P)), one reduce task per bucket runs
    ``kernel(concat_of_its_shards)``. Returns a Dataset of the reduce outputs.

    ``pre`` (Table -> Table, must emit ``col``) runs INSIDE each split task on
    the concatenated raw input blocks. Fusing the part-tagging / explode /
    projection map into the split wave removes one full plasma write of the
    exchange rows: ``ds.map_batches(add_part)`` would write every tagged row
    to the object store only for the split task to re-read it — with ``pre``
    the split task reads the (zero-copy) upstream blocks directly and the
    first bytes written are the shards themselves.

    ~4x faster than ``groupby(part).map_groups`` on compact rows: Ray's
    groupby physically RANGE-SORTS (boundary sampling + per-block sort + merge
    exchange) where an int bucket column only needs a bincount split and a
    concat (measured on the 375k-file bench corpus at 16 CPUs: 1.9 s vs 8.1 s
    for the two blocking exchanges).

    Contract:
    - rows must be compact (the exchange holds every shard in the object
      store at once with no streaming backpressure — fine for 16-32 B shuffle
      rows, wrong for wide payloads; keep those on Ray-native ops). ENFORCED:
      each reduce task checks its concatenated shard bytes against
      ``max_bucket_bytes`` (default 2 GiB) and fails loud with a pointer to
      ``partitions_for_bytes`` instead of silently staging tens of GB —
      callers with a known row width should pre-size P with that helper
      (see ivf_topk) so the guard never trips in a sized plan,
    - ``kernel`` must accept an empty table (buckets can be empty),
    - the bucket column is dropped before the kernel sees the table.

    When ``col2``/``kernel2`` are given, the first reduce's output is re-split
    by ``col2`` in the same task and a second reduce wave applies ``kernel2``
    — two shuffles for the price of one task round-trip.

    Multi-node note: object count is ``ceil(blocks / refs_per_task) * P``;
    raise ``refs_per_task`` when fanning out to hundreds of partitions so the
    object-store metadata stays bounded.

    The input blocks are consumed as a STREAM (``iter_internal_ref_bundles``),
    so split tasks launch while the upstream map wave is still producing
    blocks — the split wave overlaps the producing stage's tail instead of
    draining the whole pipeline first (the reduce wave is a true barrier
    either way: every bucket needs every block's shard).
    """
    import ray
    import ray.data

    split_t = ray.remote(num_cpus=1)(_exch_split)
    red_t = ray.remote(num_cpus=1)(_exch_reduce)

    if P == 1:
        refs = []
        for bundle in ds.iter_internal_ref_bundles():
            refs.extend(bundle.block_refs)
        if not refs:
            return ds

        def _k1(t, _kernel=kernel, _col=col, _pre=pre):
            if _pre is not None:
                t = _pre(t)
            return _kernel(t.drop_columns([_col]) if _col in t.column_names else t)

        one = red_t.remote(_k1, None, 1, max_bucket_bytes, *refs)
        if kernel2 is not None:
            def _k2(t, _kernel=kernel2, _col=col2):
                return _kernel(t.drop_columns([_col]) if _col in t.column_names else t)

            one = red_t.remote(_k2, None, 1, max_bucket_bytes, one)
        return ray.data.from_arrow_refs([one])

    shards = []
    group: list = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            group.append(ref)
            if len(group) >= refs_per_task:
                shards.append(split_t.options(num_returns=P).remote(col, P, pre, *group))
                group = []
    if group:
        shards.append(split_t.options(num_returns=P).remote(col, P, pre, *group))
    if not shards:
        return ds
    if col2 is None:
        outs = [
            red_t.remote(kernel, None, P, max_bucket_bytes, *[s[p] for s in shards])
            for p in range(P)
        ]
    else:
        mids = [
            red_t.options(num_returns=P).remote(
                kernel, col2, P, max_bucket_bytes, *[s[p] for s in shards]
            )
            for p in range(P)
        ]
        outs = [
            red_t.remote(kernel2, None, P, max_bucket_bytes, *[m[q] for m in mids])
            for q in range(P)
        ]
    return ray.data.from_arrow_refs(outs)


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


def default_key_hash(key_list):
    """Per-row uint64 hash over the key columns: integers through one
    splitmix pass, string/binary keys through crc32 first (a raw
    ``astype(uint64)`` on a string column raises). Shared default
    partitioner of partitioned_aggregate / bucketed_map_groups."""
    import zlib

    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import splitmix64

    def _hash(t: pa.Table) -> "np.ndarray":
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for k in key_list:
            f = t.schema.field(k).type
            if (pa.types.is_string(f) or pa.types.is_large_string(f)
                    or pa.types.is_binary(f) or pa.types.is_large_binary(f)):
                col = np.fromiter(
                    (zlib.crc32(s if isinstance(s, bytes) else s.encode())
                     for s in t.column(k).to_pylist()),
                    dtype=np.uint64, count=t.num_rows,
                )
            else:
                col = t.column(k).to_numpy(zero_copy_only=False).astype(np.uint64)
            h ^= splitmix64(col + np.uint64(0x9E37))
        return h

    return _hash


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

    part_fn = part_from or default_key_hash(key_list)

    def _add_part(t: pa.Table) -> pa.Table:
        h = part_fn(t)
        return t.append_column(
            "__part", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def _agg_part(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        out = t.group_by(key_list).aggregate([(c, f) for c, f, _ in agg_list])
        # pyarrow names outputs "<col>_<fn>"; rename to the requested names
        rename = {f"{c}_{f}": name for c, f, name in agg_list}
        cols = [rename.get(c, c) for c in out.column_names]
        return out.rename_columns(cols)

    return hash_exchange(ds, "__part", num_partitions, _agg_part, pre=_add_part)


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

    part_fn = part_from or default_key_hash(key_list)

    def _add_part(t: pa.Table) -> pa.Table:
        h = part_fn(t)
        return t.append_column(
            "__part", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    return hash_exchange(ds, "__part", num_partitions, kernel, pre=_add_part)


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
