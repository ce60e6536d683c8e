"""Exact-duplicate collapse on sha256 — the short-circuit before LSH.

Code corpora are dominated by byte-identical files (vendored libraries, license
boilerplate). Collapsing them first (a) turns the hottest LSH blocks into
single representatives, (b) yields guaranteed-correct edges for free, and (c)
shrinks the candidate space the bi-encoder ever sees. Reference analog: exact
dedup by key via dict insertion (/root/reference/src/transform_zeshel.py:29-31,
SURVEY.md D1).

Two plans, size-gated on ``cfg.broadcast_feature_rows``:

- broadcast plan (row count ≤ gate): the (sha256, node) projection is
  16 B/row after the shas are packed to four int64 words in the map tasks, so
  it is COLLECTED to the driver (≤40 MB at the 1M-row gate), the per-sha
  minimum node computed with one lexsort + segment pass, the dup edges emitted
  as an in-memory table, and the rep-node set broadcast as one sorted numpy
  array for a zero-shuffle membership filter. No all-to-all at all.
- scale plan: one hash shuffle of the packed rows computes the
  (rep_node, node) mapping per partition (pyarrow group_by(min) + in-process
  join), then a hash join attaches ``rep_node`` to every feature row.
"""

from __future__ import annotations

import numpy as np
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


def _pack_sha_batch(t: pa.Table) -> pa.Table:
    """(sha_k0..k3 | sha256 hex, node) -> (k0..k3 int64 words, node).

    Fingerprint already emits the digest as four 63-bit key words
    (``sha_k0..3`` — see functions.hashing.sha256_hex_and_words); grouping on
    all four is collision-free grouping on 252 bits of sha256. Falls back to
    parsing the hex column for inputs that lack the packed words."""
    if "sha_k0" in t.column_names:
        return pa.table({
            "k0": t["sha_k0"], "k1": t["sha_k1"],
            "k2": t["sha_k2"], "k3": t["sha_k3"],
            "node": t["node"],
        })
    shas = t.column("sha256").to_pylist()
    raw = b"".join(bytes.fromhex(s) for s in shas)
    if raw:
        m = (np.frombuffer(raw, dtype=np.uint64).reshape(-1, 4)
             & np.uint64((1 << 63) - 1)).astype(np.int64)
    else:
        m = np.empty((0, 4), dtype=np.int64)
    return pa.table({
        "k0": pa.array(m[:, 0]),
        "k1": pa.array(m[:, 1]),
        "k2": pa.array(m[:, 2]),
        "k3": pa.array(m[:, 3]),
        "node": t["node"],
    })


def _pack_group(*tabs) -> pa.Table:
    """Remote pack task: (sha words, node) projection for a group of blocks."""
    packed = [
        _pack_sha_batch(t.select(
            [c for c in ("sha_k0", "sha_k1", "sha_k2", "sha_k3", "sha256", "node")
             if c in t.column_names]
        ))
        for t in tabs if t.num_rows
    ]
    if not packed:
        packed = [pa.table({
            "k0": pa.array([], type=pa.int64()), "k1": pa.array([], type=pa.int64()),
            "k2": pa.array([], type=pa.int64()), "k3": pa.array([], type=pa.int64()),
            "node": pa.array([], type=pa.int64()),
        })]
    return pa.concat_tables(packed)


def _exact_split(P: int, t: pa.Table):
    """Packed rows -> P bucket slices by ``k0 % P`` (k0 is one 63-bit word of
    the sha digest — uniform). Any sha's rows land in exactly one bucket, so
    the per-bucket reduce's per-sha min is exact."""
    k0 = t.column("k0").to_numpy().astype(np.uint64)
    part = (k0 % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    ts = t.take(pa.array(order))
    counts = np.bincount(part[order], minlength=P)
    offs = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    return [ts.slice(offs[i], counts[i]) for i in range(P)]


def _merge_reps(*rep_arrays):
    """P per-bucket sorted rep arrays -> one sorted broadcast array (tiny:
    8 B per distinct sha)."""
    if not rep_arrays:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(rep_arrays))


def _exact_reduce(*tabs):
    """Remote reduce: packed (k0..k3, node) shards -> (exact-edge table,
    sorted rep-node array). One lexsort + segment pass; returned via
    ``num_returns=2`` so the edge table becomes a Dataset block and the rep
    set a broadcast array, with no driver copy of either."""
    ks = [
        np.concatenate([t.column(c).to_numpy() for t in tabs])
        for c in ("k0", "k1", "k2", "k3")
    ]
    node = np.concatenate([t.column("node").to_numpy() for t in tabs])
    if node.shape[0] == 0:  # empty bucket (sharded plan, tiny corpora)
        return (
            _edges_from_tagged(pa.table({
                "rep_node": pa.array([], type=pa.int64()),
                "node": pa.array([], type=pa.int64()),
            })),
            np.empty(0, dtype=np.int64),
        )
    order = np.lexsort((node, ks[3], ks[2], ks[1], ks[0]))
    node_s = node[order]
    first = np.empty(node_s.shape[0], dtype=bool)
    first[0] = True
    first[1:] = False
    for k in ks:
        k_s = k[order]
        first[1:] |= k_s[1:] != k_s[:-1]
    runs = np.cumsum(first) - 1
    rep = node_s[np.flatnonzero(first)][runs]  # per-row min node of its sha

    dup = node_s != rep
    edges = _edges_from_tagged(pa.table({
        "rep_node": pa.array(rep[dup]),
        "node": pa.array(node_s[dup]),
    }))
    return edges, np.sort(rep[~dup])  # reps == unique, sorted


def exact_collapse(features, cfg: LinkageConfig, rep_cols=None,
                   return_rep_filter: bool = False):
    """features -> (tagged, reps, exact_edges[, rep_filter]).

    - tagged: features + ``rep_node`` — ONLY on the join (scale) plan; the
      broadcast plan returns None (nothing downstream needs it)
    - reps: one representative row per distinct sha256 (node == rep_node)
    - exact_edges: (src=rep_node, dst=node, score=1.0, kind='exact') for dups
    - rep_cols: optional column projection applied BEFORE the rep filter;
      when the caller only consumes a slice of the rep rows (linkage's
      blocking reads just node+sig), projecting first keeps the multi-100-MB
      emb/tokseq payloads out of the filter's plasma copy entirely.
    - return_rep_filter: also return the block-level project+filter callable
      (Table -> Table) behind ``reps`` so a downstream exchange can FUSE it
      into its split tasks and read the feature blocks zero-copy with no
      intermediate rep-row write at all. Broadcast plan only — the scale
      plan's reps come out of a hash join, so the fourth element is None
      (callers fall back to consuming the ``reps`` dataset).
    """
    import ray
    import ray.data

    n_rows = features.count()

    def _pack_block(t: pa.Table) -> pa.Table:
        return _pack_sha_batch(t.select(
            [c for c in ("sha_k0", "sha_k1", "sha_k2", "sha_k3", "sha256", "node")
             if c in t.column_names]
        ))

    if n_rows == 0:
        empty_edges = ray.data.from_arrow(_edges_from_tagged(pa.table({
            "node": pa.array([], type=pa.int64()),
            "rep_node": pa.array([], type=pa.int64()),
        })))
        if return_rep_filter:
            return None, features, empty_edges, None
        return None, features, empty_edges

    from .common import effective_broadcast_rows

    if n_rows <= effective_broadcast_rows(cfg.broadcast_feature_rows):
        # fully remote broadcast plan: per-block-group pack tasks feed a
        # SHARDED reduce — each packed group is bucket-split on k0 % P and P
        # reduce tasks compute their buckets' per-sha min-node mapping,
        # dup-edge table and sorted rep set in parallel; a tiny merge task
        # concatenates the rep arrays (8 B per distinct sha) into the single
        # sorted broadcast array. The driver only holds ObjectRefs and never
        # blocks. (A single monolithic reduce re-faulting every packed page
        # ran at ~30 MB/s under this host's THP stalls — 5-7 s of critical
        # path at 10^6 rows, constant in num_cpus.)
        refs = features.to_arrow_refs()
        P = max(2, min(cfg.shuffle_partitions, -(-n_rows // 100_000)))
        pack_t = ray.remote(num_cpus=1)(_pack_group)
        split_t = ray.remote(num_cpus=1, num_returns=P)(_exact_split)
        red_t = ray.remote(num_cpus=1, num_returns=2)(_exact_reduce)
        groups = [refs[i: i + 8] for i in range(0, len(refs), 8)]
        packed = [pack_t.remote(*g) for g in groups]
        shards = [split_t.remote(P, p) for p in packed]
        if P == 1:
            shards = [[s] for s in shards]  # num_returns=1 yields a bare ref
        per = [red_t.remote(*[s[i] for s in shards]) for i in range(P)]
        nref = ray.remote(num_cpus=1)(_merge_reps).remote(*[r for _, r in per])
        exact_edges = ray.data.from_arrow_refs([e for e, _ in per])

        def _is_rep(t: pa.Table) -> pa.Table:
            if rep_cols is not None:
                # project BEFORE filtering so the wide emb/tokseq payloads
                # never pass through the filter's take copy
                t = t.select([c for c in rep_cols if c in t.column_names])
            rn = ray.get(nref)
            nd = t.column("node").to_numpy(zero_copy_only=False)
            if rn.shape[0] == 0:
                return t.slice(0, 0)
            idx = np.searchsorted(rn, nd)
            idx[idx >= rn.shape[0]] = 0
            return t.filter(pa.array(rn[idx] == nd))

        reps = features.map_batches(_is_rep, batch_format="pyarrow", zero_copy_batch=True)
        if return_rep_filter:
            return None, reps, exact_edges, _is_rep
        return None, reps, exact_edges

    # scale plan: ONE hash exchange of the packed rows -> (rep_node, node)
    # mapping (per-bucket group_by(min) + in-process join), then a hash
    # join on node (int64 — cheaper than the sha string) tags every row.
    # The pack + part-tag map is FUSED into the exchange's split tasks
    # (``pre=``): the 40 B packed rows are born inside the split wave and the
    # wide feature blocks are read zero-copy — no intermediate plasma write.
    # (Previously ``groupby("__part").map_groups`` — bounded at P groups so
    # correct, but paying Ray's range-sort exchange where the int bucket key
    # only needs the bincount split, measured ~4x slower; common.py.)
    from .common import hash_exchange

    def _pack_part(t: pa.Table) -> pa.Table:
        t = _pack_block(t)
        # cast BEFORE the modulo: int64 % uint64-scalar promotes to float64 in
        # numpy (silently computing on float-rounded keys); uint64 % uint64
        # stays exact integer math like the other _add_part implementations
        part = (
            t.column("k0").to_numpy().astype(np.uint64)
            % np.uint64(cfg.shuffle_partitions)
        ).astype(np.int64)
        return t.append_column("__part", pa.array(part))

    def _rep_emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "rep_node": pa.array([], type=pa.int64()),
                "node": pa.array([], type=pa.int64()),
            })
        rep = t.group_by(["k0", "k1", "k2", "k3"]).aggregate([("node", "min")])
        j = t.join(rep, keys=["k0", "k1", "k2", "k3"])
        return pa.table({"rep_node": j.column("node_min"), "node": j.column("node")})

    mapping = hash_exchange(
        features, "__part", cfg.shuffle_partitions, _rep_emit, pre=_pack_part
    ).materialize()
    exact_edges = mapping.map_batches(_edges_from_tagged, batch_format="pyarrow")
    # materialized: two consumers (reps filter + dup-edge projection) would
    # otherwise each re-execute; rows are compact.
    tagged = safe_join(
        features,
        mapping,
        join_type="inner",
        num_partitions=cfg.shuffle_partitions,
        on=("node",),
    ).materialize()
    def _rep_filter(t: pa.Table) -> pa.Table:
        if rep_cols is not None:
            t = t.select([c for c in (*rep_cols, "rep_node") if c in t.column_names])
        t = t.filter(pc.equal(t["node"], t["rep_node"]))
        return t.drop_columns(["rep_node"]) if rep_cols is not None else t

    reps = tagged.map_batches(_rep_filter, batch_format="pyarrow")
    if return_rep_filter:
        return tagged, reps, exact_edges, None
    return tagged, reps, exact_edges
