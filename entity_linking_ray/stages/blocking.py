"""MinHash-LSH blocking: band explode → block stats → salted candidate pairs.

Replaces the reference's all-pairs dense score matrix (``np.matmul(me, ee.T)``,
/root/reference/src/eval_zeshel.py:44 — the scale killer, SURVEY.md §2.4 J3)
with LSH blocking so only same-block pairs are ever scored.

Scale design (band rows are TINY — (band_key u64, node u64) = 16 bytes — so the
all-to-all explode ships ~0.5 KB/row at 32 bands, not the multi-KB feature
payload):

1. **explode**: per rep row, 32 band keys from its 128-perm signature.
2. **stats pass**: ``groupby(band_key).count+min(node)`` — partial-aggregated
   shuffle over 16-byte rows. Singleton blocks (the vast majority) are
   discarded; keys hotter than ``max_block_size`` (vendored libs, license
   boilerplate) are collected driver-side (hot *distinct keys* are few even
   when their rows are many).
3. **salt**: hot keys are re-exploded as ``key ^ shard`` with shard =
   splitmix(node) % ceil(count/shard_size); the block's representative (min
   node) is emitted into every shard, so transitive connectivity across shards
   survives through scored rep↔member pairs — no false merges are possible
   because every emitted pair is still scored before it can become an edge.
4. **pair gen**: ``groupby(block_key).map_groups`` over multi-member blocks
   only; all intra-block pairs (a<b), deduped across bands via
   ``groupby(src,dst).min(block_key)``.

Membership filtering of band rows uses a broadcast numpy key set (``ray.put``
once, read per task) when the multi-member key count is small, else a
hash-shuffle semi-join — both paths implemented, chosen by
``cfg.broadcast_key_limit``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Min

from ..config import LinkageConfig
from ..functions.hashing import band_keys, splitmix64
from .common import hash_exchange, partitioned_aggregate, safe_join, scrub_empty_blocks

_HOT_COLLECT_LIMIT = 1_000_000


def _sig_matrix(sig_col, num_perm: int) -> np.ndarray:
    """(n, num_perm) uint32 matrix from a fixed-width Binary column.

    Accepts a pyarrow (Chunked)Array — flattened via Arrow buffers, no
    per-row python bytes — or a plain list[bytes] (legacy callers/tests)."""
    if isinstance(sig_col, (pa.ChunkedArray, pa.Array)):
        a = (
            sig_col.combine_chunks()
            if isinstance(sig_col, pa.ChunkedArray)
            else sig_col
        )
        if len(a) == 0:
            return np.empty((0, num_perm), dtype=np.uint32)
        off_dtype = np.int64 if pa.types.is_large_binary(a.type) else np.int32
        off = np.frombuffer(a.buffers()[1], dtype=off_dtype)[
            a.offset: a.offset + len(a) + 1
        ]
        data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
        flat = data[off[0]: off[-1]]
        if flat.shape[0] % (4 * num_perm):  # varying widths: fall back
            return np.frombuffer(
                b"".join(a.to_pylist()), dtype=np.uint32
            ).reshape(-1, num_perm)
        if flat.ctypes.data % 4:  # sliced chunk landed misaligned: copy
            flat = flat.copy()
        return flat.view(np.uint32).reshape(-1, num_perm)
    return np.frombuffer(b"".join(sig_col), dtype=np.uint32).reshape(-1, num_perm)


def explode_bands(reps, cfg: LinkageConfig):
    """reps (with sig) -> (band_key u64, node u64) rows, 1 per (row, band)."""

    def _explode(batch: pa.Table) -> pa.Table:
        sig = _sig_matrix(batch.column("sig"), cfg.num_perm)
        keys = band_keys(sig, cfg.bands)  # (n, bands)
        nodes = batch.column("node").to_numpy(zero_copy_only=False)
        n, b = keys.shape
        return pa.table(
            {
                "band_key": pa.array(keys.ravel()),
                "node": pa.array(np.repeat(nodes, b)),
            }
        )

    return reps.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)


def block_stats(band_rows, cfg: LinkageConfig | None = None):
    """(band_key, n_members, rep_node) per block — the skew histogram.

    Uses the partitioned vectorized aggregate: band_key cardinality is ~rows
    (mostly singletons), far past where Ray's per-key aggregate finalize is
    usable (see common.partitioned_aggregate)."""
    npart = cfg.shuffle_partitions if cfg is not None else 32
    return partitioned_aggregate(
        band_rows,
        ["band_key"],
        [("node", "count", "n_members"), ("node", "min", "rep_node")],
        num_partitions=npart,
    )


def _collect_hot(stats, cfg: LinkageConfig) -> dict[int, tuple[int, int]]:
    """Driver-side dict of hot keys {band_key: (count, rep_node)}.

    Hot *distinct* keys are rare by construction (a key is hot because many
    rows share it); the collect is capped and the overflow falls back to
    treating extras as normal blocks truncated at pair-gen time.
    """
    hot = stats.map_batches(
        lambda t: t.filter(pc.greater(t["n_members"], cfg.max_block_size)),
        batch_format="pyarrow",
    )
    out: dict[int, tuple[int, int]] = {}
    for row in hot.take(_HOT_COLLECT_LIMIT):
        out[int(row["band_key"])] = (int(row["n_members"]), int(row["rep_node"]))
    return out


def filter_and_salt(band_rows, stats, cfg: LinkageConfig):
    """Keep only multi-member blocks; split hot blocks into salted shards.

    Returns (salted_band_rows, hot_key_count). Salted key layout: hot keys are
    rewritten to ``splitmix(band_key) ^ (shard+1)`` (re-mixed so shards of one
    hot key spread across partitions); the rep node is added to every shard.
    """
    multi = stats.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_members"], 2)),
        batch_format="pyarrow",
    )
    hot_keys = _collect_hot(stats, cfg)
    hot_ref = ray.put(hot_keys)
    n_multi = multi.count()

    if n_multi <= cfg.broadcast_key_limit:
        keys_np = np.sort(
            np.array([r["band_key"] for r in multi.take_all()], dtype=np.int64)
        )
        keys_ref = ray.put(keys_np)

        def _filter(batch: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            if keys.shape[0] == 0:  # no multi-member blocks at all
                return batch.slice(0, 0)
            bk = batch.column("band_key").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(keys, bk)
            idx[idx >= keys.shape[0]] = 0
            mask = keys[idx] == bk
            return batch.filter(pa.array(mask))

        filtered = band_rows.map_batches(_filter, batch_format="pyarrow")
    else:
        # scale path: hash-shuffle semi-join on band_key
        filtered = safe_join(
            band_rows,
            multi.select_columns(["band_key"]),
            join_type="left_semi",
            num_partitions=cfg.shuffle_partitions,
            on=("band_key",),
        )

    shard_size = cfg.salt_shard_size

    def _salt(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        bk = batch.column("band_key").to_numpy(zero_copy_only=False)
        nodes = batch.column("node").to_numpy(zero_copy_only=False)
        if not hot:
            return batch
        # sorted lookup arrays built once per call from the (small) hot dict;
        # all per-row math below is vectorized (hot rows are the MANY ones)
        hkeys = np.sort(np.fromiter(hot.keys(), dtype=np.int64))
        hcounts = np.array([hot[int(k)][0] for k in hkeys], dtype=np.int64)
        hreps = np.array([hot[int(k)][1] for k in hkeys], dtype=np.int64)
        idx = np.searchsorted(hkeys, bk)
        idx[idx >= hkeys.shape[0]] = 0
        hot_mask = hkeys[idx] == bk
        if not hot_mask.any():
            return batch
        hidx = idx[hot_mask]
        hn = nodes[hot_mask]
        k2, n2 = _salt_rows(
            bk[hot_mask], hn, hcounts[hidx], hreps[hidx], shard_size
        )
        return pa.table(
            {
                "band_key": pa.array(np.concatenate([bk[~hot_mask], k2])),
                "node": pa.array(np.concatenate([nodes[~hot_mask], n2])),
            }
        )

    return filtered.map_batches(_salt, batch_format="pyarrow"), len(hot_keys)


_MASK63 = np.uint64((1 << 63) - 1)

_EMPTY_I64 = np.empty(0, dtype=np.int64)


def _pairs_kernel(k, n, cap):
    """All within-block (i < j) pairs over (key, id) rows — pure segment math.

    Sorts by (key, id) once, truncates every block to its ``cap`` smallest
    ids (deterministic), and emits each row paired with every EARLIER row of
    its block. Returns (src, dst, key) int64 arrays with src < dst.
    """
    order = np.lexsort((n, k))
    k, n = k[order], n[order]
    m = k.shape[0]
    if m < 2:
        return _EMPTY_I64, _EMPTY_I64, _EMPTY_I64
    new_block = np.empty(m, dtype=bool)
    new_block[0] = True
    np.not_equal(k[1:], k[:-1], out=new_block[1:])
    starts = np.flatnonzero(new_block)
    block_id = np.cumsum(new_block) - 1
    pos = np.arange(m) - starts[block_id]
    # hard cap: deterministic (id-sorted) truncation of oversize blocks
    keep = pos < cap
    if not keep.all():
        k, n = k[keep], n[keep]
        m = k.shape[0]
        new_block = np.empty(m, dtype=bool)
        new_block[0] = True
        np.not_equal(k[1:], k[:-1], out=new_block[1:])
        starts = np.flatnonzero(new_block)
        block_id = np.cumsum(new_block) - 1
        pos = np.arange(m) - starts[block_id]
    total = int(pos.sum())
    if total == 0:
        return _EMPTY_I64, _EMPTY_I64, _EMPTY_I64
    # row r at in-block position p pairs with the p earlier rows of its block
    later = np.repeat(np.arange(m), pos)
    seg_ofs = np.zeros(m, dtype=np.int64)
    np.cumsum(pos[:-1], out=seg_ofs[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_ofs, pos)
    earlier = np.repeat(starts[block_id], pos) + within
    return n[earlier], n[later], k[later]  # id-sorted => src < dst


def lsh_candidate_pairs(reps, cfg: LinkageConfig, pre_filter=None):
    """Fused single-shuffle blocking: band explode → per-partition
    stats + salting + pair generation → cross-band pair dedup.

    The staged path (explode_bands → block_stats → filter_and_salt →
    candidate_pairs) pays five sequential dataset executions plus a driver
    hot-key collect; on one node that fixed latency dominates the 16-byte
    band rows' actual compute. Here ONE hash shuffle on ``band_key`` brings
    every block's rows to a single partition, where block sizes, singleton
    drop, hot-block salting (same key layout as ``_salt_rows``) and pair
    generation are pure numpy segment math; pairs are pre-deduped within the
    partition and leave it already tagged with their (src, dst) hash bucket.
    The only other shuffle routes pairs to that bucket, where a numpy
    first-of-run pass (NOT a per-key aggregate) keeps each pair's minimum
    band key.

    Partitioning assumption (100-TB note): per-partition memory is the sum of
    its band keys' row counts. Exact-collapse has already folded identical
    files into single reps, hot keys are few by construction, and the
    per-block pair cap bounds the output; a key would need ~10^8 distinct
    near-identical reps to overwhelm a partition, which the salting+cap stack
    truncates deterministically.
    """
    P = cfg.shuffle_partitions

    # the band explode is FUSED into the exchange's split tasks (``pre``):
    # rep blocks are read zero-copy from plasma and the first bytes written
    # are the 16-byte band shards themselves — the tagged 24-byte band rows
    # (~bands x reps) are never materialized as an intermediate write wave.
    # ``pre_filter`` (Table -> rep rows, from exact_collapse's broadcast
    # plan) fuses the rep projection+filter in as well: ``reps`` is then the
    # RAW feature dataset and not even the (node, sig) rep rows are written —
    # the split tasks mmap the materialized feature blocks directly.
    band_rows = reps

    def _explode_pre(t: pa.Table) -> pa.Table:
        if pre_filter is not None:
            t = pre_filter(t)
        return explode_bands_parted(t, cfg, P)

    if cfg.pair_plan == "blocks":
        # block-descriptor plan: near-identical files form the SAME member
        # set in most of their 32 bands, so the raw pair stream duplicates
        # every true pair ~bands times. Emitting one descriptor per block
        # (set-hash, band key, packed members) and deduping IDENTICAL member
        # sets before pair expansion shrinks the widest exchange ~an order
        # of magnitude; only pairs from *distinct-but-overlapping* sets
        # reach the final (src, dst) dedup. The first hash_exchange fuses
        # desc build + expansion into one task round-trip.
        pairs = hash_exchange(
            band_rows, "__part", P,
            lambda t: part_block_descs(t, cfg, P),
            col2="__p2",
            kernel2=lambda t: expand_block_descs(t, cfg, P),
            pre=_explode_pre,
        )
        deduped = hash_exchange(pairs, "__p3", P, _dedup_min_band)
    else:
        # one fused exchange: band rows -> per-partition pair gen -> re-split
        # by (src, dst) bucket -> cross-partition min-band dedup
        deduped = hash_exchange(
            band_rows, "__part", P,
            lambda t: part_pairs(t, cfg, P),
            col2="__p2", kernel2=_dedup_min_band,
            pre=_explode_pre,
        )
    return scrub_empty_blocks(deduped)


def _dedup_min_band(t: pa.Table) -> pa.Table:
    """(src, dst, band_key) rows -> unique (src, dst, block_key=min band).

    One lexsort + adjacent-unique pass; replaces a per-key hash aggregate
    (pyarrow group_by spends seconds at 10^6 distinct pairs, this is
    milliseconds)."""
    src = t.column("src").to_numpy(zero_copy_only=False)
    dst = t.column("dst").to_numpy(zero_copy_only=False)
    bk = t.column("band_key").to_numpy(zero_copy_only=False)
    m = src.shape[0]
    if m == 0:
        return pa.table({
            "src": pa.array([], type=pa.int64()),
            "dst": pa.array([], type=pa.int64()),
            "block_key": pa.array([], type=pa.int64()),
        })
    order = np.lexsort((bk, dst, src))
    src, dst, bk = src[order], dst[order], bk[order]
    first = np.empty(m, dtype=bool)
    first[0] = True
    first[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
    return pa.table({
        "src": pa.array(src[first]),
        "dst": pa.array(dst[first]),
        "block_key": pa.array(bk[first]),
    })


def explode_bands_parted(batch: pa.Table, cfg: LinkageConfig, P: int) -> pa.Table:
    """reps batch -> (band_key, node, __part) rows, one per (row, band)."""
    sig = _sig_matrix(batch.column("sig"), cfg.num_perm)
    keys = band_keys(sig, cfg.bands)  # (n, bands)
    nodes = batch.column("node").to_numpy(zero_copy_only=False)
    n, b = keys.shape
    flat = keys.ravel()
    part = (splitmix64(flat.astype(np.uint64)) % np.uint64(P)).astype(np.int64)
    return pa.table({
        "band_key": pa.array(flat),
        "node": pa.array(np.repeat(nodes, b)),
        "__part": pa.array(part),
    })


def part_pairs(t: pa.Table, cfg: LinkageConfig, P: int | None = None) -> pa.Table:
    """One partition's band rows -> candidate pairs: block sizing, singleton
    drop, hot-block salting and pair generation as pure numpy segment math.
    Output is pre-deduped within the partition and, when ``P`` is given,
    tagged with ``__p2`` — the pair's (src, dst) hash bucket for the final
    cross-partition dedup shuffle."""
    empty = pa.table({
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64()),
        "band_key": pa.array([], type=pa.int64()),
        **({"__p2": pa.array([], type=pa.int64())} if P is not None else {}),
    })
    built = _salted_block_rows(t, cfg)
    if built is None:
        return empty
    keys_all, nodes_all = built
    src, dst, bk = _pairs_kernel(keys_all, nodes_all, cfg.max_block_size)
    if src.shape[0] == 0:
        return empty
    src, dst, bk = _pair_dedup_local(src, dst, bk)
    cols = {
        "src": pa.array(src),
        "dst": pa.array(dst),
        "band_key": pa.array(bk),
    }
    if P is not None:
        h = splitmix64(splitmix64(dst.astype(np.uint64)) ^ src.astype(np.uint64))
        cols["__p2"] = pa.array((h % np.uint64(P)).astype(np.int64))
    return pa.table(cols)


def _salted_block_rows(t: pa.Table, cfg: LinkageConfig):
    """Shared block construction for one band partition: singleton drop +
    hot-block salting. Returns post-salt (band_key, node) arrays or None."""
    k = t.column("band_key").to_numpy(zero_copy_only=False)
    n = t.column("node").to_numpy(zero_copy_only=False)
    order = np.lexsort((n, k))
    k, n = k[order], n[order]
    m = k.shape[0]
    if m < 2:
        return None
    new_block = np.empty(m, dtype=bool)
    new_block[0] = True
    np.not_equal(k[1:], k[:-1], out=new_block[1:])
    block_id = np.cumsum(new_block) - 1
    counts = np.bincount(block_id)
    row_count = counts[block_id]  # block size per row
    starts = np.flatnonzero(new_block)
    rep_per_row = np.repeat(n[starts], counts)  # block min node per row
    multi = row_count >= 2
    hot = row_count > cfg.max_block_size
    norm = multi & ~hot
    if hot.any():
        k2, n2 = _salt_rows(
            k[hot], n[hot], row_count[hot], rep_per_row[hot],
            cfg.salt_shard_size,
        )
        return np.concatenate([k[norm], k2]), np.concatenate([n[norm], n2])
    return k[norm], n[norm]


def _pair_dedup_local(src, dst, bk):
    """Within-partition (src, dst) dedup keeping the minimum band key."""
    order = np.lexsort((bk, dst, src))
    src, dst, bk = src[order], dst[order], bk[order]
    first = np.empty(src.shape[0], dtype=bool)
    first[0] = True
    first[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
    return src[first], dst[first], bk[first]


_DESC_EMPTY = pa.table({
    "mhash": pa.array([], type=pa.int64()),
    "band_key": pa.array([], type=pa.int64()),
    "members": pa.array([], type=pa.large_binary()),
    "__p2": pa.array([], type=pa.int64()),
})


def part_block_descs(t: pa.Table, cfg: LinkageConfig, P: int) -> pa.Table:
    """One band partition -> BLOCK DESCRIPTORS: (set-hash, band_key, packed
    sorted member ids), tagged with the set-hash bucket. Identical member
    sets (the same near-dup cluster colliding in many bands) collapse in the
    next stage BEFORE pair expansion, so the widest exchange carries one row
    per distinct block instead of ~bands copies of every pair."""
    built = _salted_block_rows(t, cfg)
    if built is None:
        return _DESC_EMPTY
    k, n = built
    order = np.lexsort((n, k))
    k, n = k[order], n[order]
    m = k.shape[0]
    if m < 2:
        return _DESC_EMPTY
    new_block = np.empty(m, dtype=bool)
    new_block[0] = True
    np.not_equal(k[1:], k[:-1], out=new_block[1:])
    starts = np.flatnonzero(new_block)
    block_id = np.cumsum(new_block) - 1
    pos = np.arange(m) - starts[block_id]
    keep = pos < cfg.max_block_size  # deterministic id-sorted truncation
    if not keep.all():
        k, n = k[keep], n[keep]
        m = k.shape[0]
        new_block = np.empty(m, dtype=bool)
        new_block[0] = True
        np.not_equal(k[1:], k[:-1], out=new_block[1:])
        starts = np.flatnonzero(new_block)
    sizes = np.diff(np.append(starts, m))
    multi = sizes >= 2
    if not multi.any():
        return _DESC_EMPTY
    # order-independent member-set hash: XOR of per-member mixes + size mix
    mixed = splitmix64(n.astype(np.uint64) + np.uint64(0xD1B5))
    xors = np.bitwise_xor.reduceat(mixed, starts)
    mh = (
        splitmix64(xors ^ splitmix64(sizes.astype(np.uint64))) & _MASK63
    ).astype(np.int64)
    s_multi = starts[multi]
    z_multi = sizes[multi]
    blobs = [n[s: s + z].tobytes() for s, z in zip(s_multi, z_multi)]
    mh = mh[multi]
    return pa.table({
        "mhash": pa.array(mh),
        "band_key": pa.array(k[s_multi]),
        "members": pa.array(blobs, type=pa.large_binary()),
        "__p2": pa.array((mh.astype(np.uint64) % np.uint64(P)).astype(np.int64)),
    })


def expand_block_descs(t: pa.Table, cfg: LinkageConfig, P: int) -> pa.Table:
    """One set-hash bucket of block descriptors -> locally-deduped pairs.

    Identical member blobs collapse to one block (minimum band key kept —
    identical sets always share mhash, so the collapse is complete); the
    surviving distinct blocks expand through the shared segment-math pairs
    kernel, and overlapping-but-distinct sets' duplicate pairs are deduped
    locally, tagged ``__p3`` for the final (src, dst) exchange."""
    empty = pa.table({
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64()),
        "band_key": pa.array([], type=pa.int64()),
        "__p3": pa.array([], type=pa.int64()),
    })
    if t.num_rows == 0:
        return empty
    bk = t.column("band_key").to_numpy(zero_copy_only=False)
    blobs = t.column("members").to_pylist()
    # distinct member sets, min band key: one sort over (blob, band)
    order = sorted(range(len(blobs)), key=lambda i: (blobs[i], bk[i]))
    keep_idx = []
    prev = None
    for i in order:
        if blobs[i] != prev:
            keep_idx.append(i)
            prev = blobs[i]
    sizes = np.array([len(blobs[i]) // 8 for i in keep_idx], dtype=np.int64)
    nodes = np.frombuffer(b"".join(blobs[i] for i in keep_idx), dtype=np.int64)
    block_ids = np.repeat(np.arange(len(keep_idx), dtype=np.int64), sizes)
    src, dst, kidx = _pairs_kernel(block_ids, nodes, cfg.max_block_size)
    if src.shape[0] == 0:
        return empty
    bands = bk[np.asarray(keep_idx, dtype=np.int64)][kidx]
    src, dst, bands = _pair_dedup_local(src, dst, bands)
    h = splitmix64(splitmix64(dst.astype(np.uint64)) ^ src.astype(np.uint64))
    return pa.table({
        "src": pa.array(src),
        "dst": pa.array(dst),
        "band_key": pa.array(bands),
        "__p3": pa.array((h % np.uint64(P)).astype(np.int64)),
    })


def _salt_rows(hk, hn, counts, reps, shard_size):
    """Vectorized hot-block salting (same key layout as the staged path).

    Inputs are PER-ROW arrays for rows belonging to hot blocks: band key,
    node, the block's member count and its representative (min) node. Each
    row is rewritten to ``splitmix(key)^(shard+1)`` with
    ``shard = splitmix(node) % ceil(count/shard_size)``; the rep row fans out
    into every shard so transitive connectivity across shards survives
    through scored rep↔member pairs. Returns (keys, nodes) int64 arrays.
    """
    mixed = (splitmix64(hk.astype(np.uint64)) & _MASK63).astype(np.int64)
    nshards = np.maximum(2, -(-counts // shard_size))
    shard = (
        splitmix64(hn.astype(np.uint64)) % nshards.astype(np.uint64)
    ).astype(np.int64)
    is_rep = hn == reps
    # non-rep rows: one salted row each
    k_member = mixed[~is_rep] ^ (shard[~is_rep] + 1)
    n_member = hn[~is_rep]
    # rep rows: fan out into ALL shards of their block
    rep_mixed = mixed[is_rep]
    rep_nsh = nshards[is_rep]
    rep_node = hn[is_rep]
    total = int(rep_nsh.sum())
    if total:
        seg_start = np.zeros(rep_nsh.shape[0], dtype=np.int64)
        np.cumsum(rep_nsh[:-1], out=seg_start[1:])
        shards = np.arange(total, dtype=np.int64) - np.repeat(seg_start, rep_nsh)
        k_rep = np.repeat(rep_mixed, rep_nsh) ^ (shards + 1)
        n_rep = np.repeat(rep_node, rep_nsh)
    else:
        k_rep = np.empty(0, dtype=np.int64)
        n_rep = np.empty(0, dtype=np.int64)
    return np.concatenate([k_member, k_rep]), np.concatenate([n_member, n_rep])


def candidate_pairs(salted_rows, cfg: LinkageConfig):
    """Unique candidate pairs (src < dst) via a band-key SELF-JOIN.

    A ``groupby(band_key).map_groups`` pair generator pays a Python call per
    block — at bench scale (~10^5 multi-member blocks) that was ~70% of the
    whole pipeline's wall time. The equivalent hash-shuffle self-join runs
    entirely in Arrow kernels: per block of size s it emits s^2 rows, the
    ``src < dst`` filter keeps each unordered pair once, and per-pair band
    collisions collapse in the ``groupby(src, dst).min(block_key)`` aggregate.
    Block sizes are already capped by salting, so s^2 stays bounded.
    """
    import ray.data

    salted_rows = salted_rows.materialize()
    if salted_rows.count() == 0:
        # no multi-member blocks at all: empty result WITH schema (scrubbed
        # zero-block datasets lose their schema inside joins)
        return ray.data.from_arrow(
            pa.table({
                "src": pa.array([], type=pa.int64()),
                "dst": pa.array([], type=pa.int64()),
                "block_key": pa.array([], type=pa.int64()),
            })
        )

    return bucketed_pairs(
        salted_rows, key_col="band_key", id_col="node",
        cap=cfg.max_block_size, num_partitions=cfg.shuffle_partitions,
        out_cols=("src", "dst", "block_key"),
    )


def bucketed_pairs(rows, key_col: str, id_col: str, cap: int, num_partitions: int,
                   out_cols=("src", "dst", "block_key")):
    """All within-block (i < j) unique pairs of ``rows (key, id)`` — the
    reusable vectorized pair generator behind candidate_pairs (see its
    docstring for the plan)."""
    P = num_partitions
    src_name, dst_name, bk_name = out_cols

    def _add_part(t: pa.Table) -> pa.Table:
        bk = t.column(key_col).to_numpy(zero_copy_only=False)
        part = (splitmix64(bk.astype(np.uint64)) % np.uint64(P)).astype(np.int64)
        return t.append_column("__part", pa.array(part))

    def _bucket_pairs(t: pa.Table) -> pa.Table:
        # all rows of every band key hashed to this bucket: sort once, then
        # generate all within-block (i < j) pairs with pure segment math —
        # zero Python per block; pre-deduped + tagged with the (src, dst)
        # hash bucket for the final dedup shuffle
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        n = t.column(id_col).to_numpy(zero_copy_only=False)
        src, dst, bk = _pairs_kernel(k, n, cap)
        if src.shape[0]:
            order = np.lexsort((bk, dst, src))
            src, dst, bk = src[order], dst[order], bk[order]
            first = np.empty(src.shape[0], dtype=bool)
            first[0] = True
            first[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
            src, dst, bk = src[first], dst[first], bk[first]
        h = splitmix64(splitmix64(dst.astype(np.uint64)) ^ src.astype(np.uint64))
        return pa.table({
            "src": pa.array(src),
            "dst": pa.array(dst),
            "band_key": pa.array(bk),
            "__p2": pa.array((h % np.uint64(P)).astype(np.int64)),
        })

    deduped = scrub_empty_blocks(
        hash_exchange(
            rows, "__part", P, _bucket_pairs,
            col2="__p2", kernel2=_dedup_min_band, pre=_add_part,
        )
    )
    return deduped.map_batches(
        lambda t: t.rename_columns([src_name, dst_name, bk_name]),
        batch_format="pyarrow",
    )
