"""Similarity search over embedding columns: brute-force and IVF plans.

- ``brute_force_topk``: the baseline — candidate matrix broadcast once
  (``ray.put``), queries stream through a batched matmul + vectorized
  stable-argsort top-k. This is the reference's scoring shape
  (np.matmul(me, ee.T) + top-k, /root/reference/src/eval_zeshel.py:44,49)
  kept streaming.
- ``ivf_topk``: the scale path — candidates are bucketed by nearest coarse
  centroid (deterministic k-means on a seeded sample, built driver-side from
  a SMALL sample only), each query probes its ``n_probe`` nearest cells, and
  per-cell local top-k results merge per query. At 10^9+ vectors the cell
  assignment is a partitioned shuffle and each cell is scanned only by the
  queries that probe it.

Partitioning assumptions (100-TB note): one IVF cell's candidates plus its
probing queries must fit one task — cells are balanced by k-means and
``n_cells`` scales with the corpus; the per-query merge is hash-bucketed
(``bucketed_map_groups``), so no task ever sees more than its bucket's
(n_probe × k)-row slices. Embeddings travel between stages as
FixedSizeBinary columns built from ONE buffer per batch — never per-row
Python serialization.

Ties everywhere break by (score desc, id asc) — deterministic across
parallelism levels: candidates are pre-sorted by id, so a STABLE argsort on
-cos resolves ties toward the smaller id with zero per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _list_matrix(col) -> np.ndarray:
    """(Fixed-size) list<float> column -> (n, d) float64 matrix via the
    values buffer — one reshape, no per-row Python. ``np.stack`` over
    ``to_numpy``'s object array costs ~100 ms per 1k rows (measured 296 s
    driver-side on the 375k-embedding corpus before this path existed)."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(a.type):
        d = a.type.list_size
        vals = a.values
        flat = vals.to_numpy(zero_copy_only=False)
        flat = flat[a.offset * d: (a.offset + len(a)) * d]
        return flat.reshape(len(a), d).astype(np.float64)
    if pa.types.is_list(a.type) or pa.types.is_large_list(a.type):
        off = a.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(off)
        if len(a) and (widths == widths[0]).all():
            d = int(widths[0])
            flat = a.values.to_numpy(zero_copy_only=False)
            return flat[off[0]: off[-1]].reshape(len(a), d).astype(np.float64)
    # ragged / exotic layouts: slow path
    return np.stack(a.to_numpy(zero_copy_only=False)).astype(np.float64)


def _shard_matrix(id_col: str, emb_col: str, *tabs):
    """Remote shard-collect: a group of candidate blocks -> (ids ascending,
    L2-normalized float64 matrix) as ONE plasma shard. Parallel shard tasks
    replace the driver-side _collect_matrix + ray.put of the full matrix,
    which serially re-faulted every plasma page (~20 s for the 375k x 128
    corpus on this THP-stalling host)."""
    live = [t for t in tabs if t.num_rows]
    if not live:
        return np.empty(0, dtype=np.int64), np.empty((0, 1), dtype=np.float64)
    ids = np.concatenate([
        t.column(id_col).to_numpy(zero_copy_only=False) for t in live
    ]).astype(np.int64)
    emb = np.concatenate([_list_matrix(t.column(emb_col)) for t in live])
    order = np.argsort(ids)  # ascending ids: _topk_rows' tie-break contract
    return ids[order], _normalize(emb[order])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)


def _emb_fixed_bin(emb: np.ndarray, dtype=np.float32) -> pa.Array:
    """(n, d) floats -> FixedSizeBinary(d*itemsize) column from ONE buffer."""
    n, d = emb.shape
    w = np.dtype(dtype).itemsize
    return pa.Array.from_buffers(
        pa.binary(d * w), n,
        [None, pa.py_buffer(np.ascontiguousarray(emb, dtype=dtype).tobytes())],
    )


def _fixed_bin_matrix(col, dtype=np.float32) -> np.ndarray:
    """FixedSizeBinary column -> (n, width/itemsize) matrix, zero-copy-ish."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    w = a.type.byte_width
    data = np.frombuffer(a.buffers()[1], dtype=np.uint8)
    start = a.offset * w
    flat = data[start: start + len(a) * w]
    if flat.ctypes.data % np.dtype(dtype).itemsize:
        flat = flat.copy()
    return flat.view(dtype).reshape(len(a), w // np.dtype(dtype).itemsize)


def _topk_rows(qids, cids_sorted, cos, k):
    """Vectorized per-row top-k with (cos desc, id asc) tie-break: cids MUST
    be pre-sorted ascending so the stable argsort resolves ties by id."""
    kk = min(k, cos.shape[1])
    top = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
    nq = qids.shape[0]
    return (
        np.repeat(qids.astype(np.int64), kk),
        cids_sorted[top].ravel().astype(np.int64),
        np.tile(np.arange(1, kk + 1, dtype=np.int64), nq),
        np.take_along_axis(cos, top, axis=1).ravel(),
    )


def brute_force_topk(queries, candidates, k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     exclude_self: bool = True):
    """-> Dataset(query_id, neighbor_id, rank, cos). Candidates broadcast
    once as PARALLEL-built shards (one per ~8 blocks); each query batch runs
    one matmul per shard and merges the per-shard top-k exactly.

    Exactness of the merge: the global order is total (cos desc, id asc);
    every global top-k row is within its own shard's top-k under the same
    order (shard ids are pre-sorted ascending), so the union of per-shard
    top-k contains the global top-k and one lexsort recovers it."""
    refs = candidates.to_arrow_refs()
    shard_t = ray.remote(num_cpus=1)(_shard_matrix)
    groups = [refs[i: i + 8] for i in range(0, len(refs), 8)]
    shard_refs = ([shard_t.remote(id_col, emb_col, *g) for g in groups]
                  if groups else [shard_t.remote(id_col, emb_col)])

    empty = pa.table({
        "query_id": pa.array([], type=pa.int64()),
        "neighbor_id": pa.array([], type=pa.int64()),
        "rank": pa.array([], type=pa.int64()),
        "cos": pa.array([], type=pa.float64()),
    })

    def _topk(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return empty
        q = _normalize(_list_matrix(t.column(emb_col)))
        qids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        for ids_s, emb_s in ray.get(shard_refs):
            if ids_s.shape[0] == 0:
                continue
            cos = np.round(q @ emb_s.T, 6)
            if exclude_self:
                cos[ids_s[None, :] == qids[:, None]] = -np.inf
            oq, on, _orr, oc = _topk_rows(qids, ids_s, cos, k)
            parts.append((oq, on, oc))
        if not parts:
            return empty
        q_all = np.concatenate([p[0] for p in parts])
        n_all = np.concatenate([p[1] for p in parts])
        c_all = np.concatenate([p[2] for p in parts])
        order = np.lexsort((n_all, -c_all, q_all))
        q_s, n_s, c_s = q_all[order], n_all[order], c_all[order]
        new_q = np.empty(q_s.shape[0], dtype=bool)
        new_q[0] = True
        np.not_equal(q_s[1:], q_s[:-1], out=new_q[1:])
        starts = np.flatnonzero(new_q)
        rank = (np.arange(q_s.shape[0], dtype=np.int64)
                - starts[np.cumsum(new_q) - 1] + 1)
        keep = (rank <= k) & (c_s > -np.inf)
        return pa.table({
            "query_id": pa.array(q_s[keep]),
            "neighbor_id": pa.array(n_s[keep]),
            "rank": pa.array(rank[keep]),
            "cos": pa.array(c_s[keep]),
        })

    return queries.map_batches(_topk, batch_format="pyarrow", batch_size=2048)


def _kmeans_centroids(sample: np.ndarray, n_cells: int, seed: int, iters: int = 8):
    rng = np.random.default_rng(seed)
    idx = rng.choice(sample.shape[0], size=min(n_cells, sample.shape[0]), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            members = sample[assign == c]
            if members.shape[0]:
                m = members.mean(axis=0)
                cents[c] = m / max(float(np.linalg.norm(m)), 1e-300)
    return cents


def autotune_ivf(n_cand: int, n_cells: int | None = None,
                 n_probe: int | None = None) -> tuple[int, int]:
    """Corpus-sized IVF defaults: ``n_cells ~ sqrt(n)`` (the standard IVF
    operating point — per-cell scan cost and probe fan-out balance there),
    power-of-two-rounded and clamped to [8, 4096]; ``n_probe = n_cells / 8``
    (recall ~0.85-0.9 on the bench corpus). Explicit values pass through."""
    if n_cells is None:
        import math

        target = max(1.0, math.sqrt(max(1, n_cand)))
        n_cells = int(2 ** round(math.log2(target)))
        n_cells = max(8, min(4096, n_cells))
    if n_probe is None:
        n_probe = max(2, n_cells // 8)
    return n_cells, min(n_probe, n_cells)


def ivf_topk(queries, candidates, k: int = 10, n_cells: int | None = 16,
             n_probe: int | None = 4,
             id_col: str = "vec_id", emb_col: str = "embedding",
             exclude_self: bool = True, seed: int = 42, sample_rows: int = 20_000,
             num_partitions: int = 16, pack_dtype=np.float32):
    """IVF approximate top-k: centroids from a seeded sample; candidates
    bucketed per cell; queries probe their n_probe nearest cells; per-cell
    local top-k merged per query bucket. Recall < 1.0 by design — tested
    against the brute-force baseline. ``n_cells``/``n_probe`` = None
    autotunes from the candidate count (see autotune_ivf); ``n_probe ==
    n_cells`` makes the plan EXHAUSTIVE — exactly equal to brute force
    (oracle-checked as the ann_ivf_exhaustive query). ``pack_dtype``: wire
    dtype for embeddings through the cell exchange — float32 (default)
    halves the shuffle payload at ~1e-7 cosine error (fine approximate);
    the exhaustive oracle-checked variant packs float64 so its 6-dp
    rounding matches the DOUBLE-typed SQL.
    """
    # --- train coarse quantizer on a small DETERMINISTIC sample: rows whose
    # hashed id sorts lowest (block arrival order varies run-to-run under the
    # streaming executor, so "first N batches" would train different
    # centroids — and therefore different recall — on identical input) ---
    from ..functions.hashing import splitmix64
    from .common import collect_projected

    n_cand = candidates.count()
    n_cells, n_probe = autotune_ivf(n_cand, n_cells, n_probe)
    p = min(1.0, (sample_rows * 1.3) / max(1, n_cand))
    cut = np.uint64(min(int(p * 2**64), 2**64 - 1))

    def _samp(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(ids + np.uint64(seed))
        keep = h <= cut
        out = t.select([id_col, emb_col]).filter(pa.array(keep))
        return out.append_column("__h", pa.array(h[keep].astype(np.int64)))

    tabs = collect_projected(candidates, _samp)
    st = pa.concat_tables(tabs) if tabs else None
    if st is None or st.num_rows == 0:  # degenerate: tiny corpus — take all
        tabs = collect_projected(
            candidates, lambda t: t.select([id_col, emb_col])
        )
        st = pa.concat_tables(tabs)
        order = np.argsort(st.column(id_col).to_numpy())
    else:
        order = np.argsort(st.column("__h").to_numpy())
    st = st.take(order[:sample_rows])
    sample = _normalize(_list_matrix(st.column(emb_col)))
    cents = _kmeans_centroids(sample, n_cells, seed)
    cref = ray.put(cents)

    # --- candidate side: (cell, id, emb) rows, embeddings packed from one buffer ---
    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        emb = _normalize(_list_matrix(t.column(emb_col)))
        cell = np.argmax(emb @ c.T, axis=1).astype(np.int64)
        return pa.table({
            "cell": pa.array(cell),
            "__side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            "vec": t[id_col].cast(pa.int64()),
            "emb": _emb_fixed_bin(emb, dtype=pack_dtype),
        })

    cand_rows = candidates.map_batches(_assign, batch_format="pyarrow")

    # --- query side: one probe row per (query, probed cell) ---
    def _probe(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        emb = _normalize(_list_matrix(t.column(emb_col)))
        qids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(-(emb @ c.T), axis=1, kind="stable")[:, :n_probe]
        n, p = order.shape
        rep = np.repeat(np.arange(n), p)
        return pa.table({
            "cell": pa.array(order.ravel().astype(np.int64)),
            "__side": pa.array(np.ones(n * p, dtype=np.int8)),
            "vec": pa.array(np.repeat(qids.astype(np.int64), p)),
            "emb": _emb_fixed_bin(emb[rep], dtype=pack_dtype),
        })

    probe_rows = queries.map_batches(_probe, batch_format="pyarrow")

    dim_hint = sample.shape[1] if sample.ndim == 2 else 1
    return _ann_exchange_topk(cand_rows, probe_rows, k=k,
                              exclude_self=exclude_self, pack_dtype=pack_dtype,
                              n_cand_rows=n_cand, dim=dim_hint,
                              num_partitions=num_partitions, max_parts=n_cells)


def _ann_exchange_topk(cand_rows, probe_rows, *, k, exclude_self, pack_dtype,
                       n_cand_rows, dim, num_partitions, max_parts):
    """Shared tail of the bucketed ANN plans (IVF cells / LSH buckets): route
    (cell, __side, vec, emb) rows through ONE hash_exchange on cell % P, run
    the vectorized per-cell top-k kernel per cell segment inside each reduce
    bucket, then merge per query. P is auto-sized from the estimated staged
    bytes (the exchange has no backpressure — see hash_exchange's payload
    contract) and capped at the distinct-key bound ``max_parts``."""

    # --- per-cell local top-k (one vectorized kernel per cell) ---
    def _cell_topk(t: pa.Table) -> pa.Table:
        side = t.column("__side").to_numpy(zero_copy_only=False)
        vec = t.column("vec").to_numpy(zero_copy_only=False)
        emb = _fixed_bin_matrix(t.column("emb"), dtype=pack_dtype).astype(np.float64)
        is_q = side == 1
        qids, qemb = vec[is_q], emb[is_q]
        cids, cemb = vec[~is_q], emb[~is_q]
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "cos": pa.array([], type=pa.float64()),
        })
        if qids.shape[0] == 0 or cids.shape[0] == 0:
            return empty
        order = np.argsort(cids)  # id-asc for the stable tie-break
        cids, cemb = cids[order], cemb[order]
        cos = np.round(qemb @ cemb.T, 6)
        if exclude_self:
            cos[cids[None, :] == qids[:, None]] = -np.inf
        oq, on, _, oc = _topk_rows(qids, cids, cos, k)
        keep = oc > -np.inf
        return pa.table({
            "query_id": pa.array(oq[keep]),
            "neighbor_id": pa.array(on[keep]),
            "cos": pa.array(oc[keep]),
        })

    # cells route through the manual hash_exchange (int bucket = cell % P):
    # Ray's groupby physically range-sorts where a bincount split suffices
    # (measured ~4x on int keys, stages/common.py); each reduce task walks
    # its bucket's cell segments with one argsort and runs the vectorized
    # per-cell kernel per segment — Python cost is bounded by n_cells total,
    # not by Ray's per-group dispatch. Payload note: the exchange stages the
    # (emb fixed-bin) rows in plasma without backpressure — ~0.5 KB/row at
    # d=128 float32 — so P is AUTO-SIZED from the estimated total bytes
    # (partitions_for_bytes) to keep each reduce bucket's heap bounded; the
    # exchange's own max_bucket_bytes guard fails loud if an estimate is ever
    # beaten (e.g. a single cell past the bucket budget — n_cells must grow
    # with the corpus, see autotune_ivf).
    from .common import hash_exchange, partitions_for_bytes

    row_bytes = dim * np.dtype(pack_dtype).itemsize + 17  # emb + cell/side/vec
    P = max(2, min(max_parts,
                   partitions_for_bytes(n_cand_rows, row_bytes, num_partitions)))

    def _with_part(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__part", pa.array((cell % P).astype(np.int64))
        )

    def _bucket_topk(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "cos": pa.array([], type=pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        ts = t.take(pa.array(order)).drop_columns(["cell"])
        cs = cell[order]
        bounds = np.flatnonzero(np.diff(cs)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [cs.shape[0]]])
        outs = [_cell_topk(ts.slice(s, e - s)) for s, e in zip(starts, ends)]
        return pa.concat_tables(outs) if outs else empty

    local = hash_exchange(
        cand_rows.union(probe_rows), "__part", P, _bucket_topk, pre=_with_part,
    )

    # --- merge per query: hash-bucketed, one lexsort+segment kernel per bucket ---
    def _merge_bucket(t: pa.Table) -> pa.Table:
        q = t.column("query_id").to_numpy(zero_copy_only=False)
        if q.shape[0] == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "cos": pa.array([], type=pa.float64()),
                "rank": pa.array([], type=pa.int64()),
            })
        nid = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        cos = t.column("cos").to_numpy(zero_copy_only=False)
        # dedup (query, neighbor) — the same neighbor can surface from
        # several probed cells — keeping its best (they're equal anyway)
        o1 = np.lexsort((-cos, nid, q))
        q, nid, cos = q[o1], nid[o1], cos[o1]
        first = np.empty(q.shape[0], dtype=bool)
        first[0] = True
        first[1:] = (q[1:] != q[:-1]) | (nid[1:] != nid[:-1])
        q, nid, cos = q[first], nid[first], cos[first]
        # rank within query by (cos desc, id asc), keep rank <= k
        o2 = np.lexsort((nid, -cos, q))
        q, nid, cos = q[o2], nid[o2], cos[o2]
        newq = np.empty(q.shape[0], dtype=bool)
        newq[0] = True
        np.not_equal(q[1:], q[:-1], out=newq[1:])
        starts = np.flatnonzero(newq)
        rank = np.arange(q.shape[0], dtype=np.int64) - starts[np.cumsum(newq) - 1] + 1
        keep = rank <= k
        return pa.table({
            "query_id": pa.array(q[keep]),
            "neighbor_id": pa.array(nid[keep]),
            "cos": pa.array(cos[keep]),
            "rank": pa.array(rank[keep]),
        })

    from .common import bucketed_map_groups

    return bucketed_map_groups(local, ["query_id"], _merge_bucket, num_partitions)


_HYPERPLANES: dict[tuple, np.ndarray] = {}


def _hyperplanes(d: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    """(n_tables, n_bits, d) standard-normal hyperplanes — built lazily in
    WHATEVER process needs them (driver or worker) and cached per process:
    np.random.default_rng(seed) is deterministic given (seed, shape), so
    every task derives the identical planes with zero broadcast traffic."""
    key = (d, n_bits, n_tables, seed)
    h = _HYPERPLANES.get(key)
    if h is None:
        h = np.random.default_rng(seed).standard_normal(
            (n_tables, max(1, n_bits), d)
        )
        _HYPERPLANES[key] = h
    return h


def _lsh_codes(emb: np.ndarray, n_bits: int, n_tables: int, seed: int):
    """L2-normalized (n, d) matrix -> (n, n_tables) int64 bucket keys,
    key = (table << n_bits) | signbit-code. n_bits == 0 degenerates to one
    bucket per table (the exhaustive operating point)."""
    n = emb.shape[0]
    if n_bits == 0:
        return np.broadcast_to(
            np.arange(n_tables, dtype=np.int64)[None, :], (n, n_tables)
        ).copy()
    H = _hyperplanes(emb.shape[1], n_bits, n_tables, seed)
    weights = (np.int64(1) << np.arange(n_bits, dtype=np.int64))
    codes = np.empty((n, n_tables), dtype=np.int64)
    for t in range(n_tables):
        bits = (emb @ H[t].T) > 0
        codes[:, t] = bits @ weights + (np.int64(t) << n_bits)
    return codes


def autotune_lsh(n_cand: int, n_bits: int | None = None,
                 n_tables: int | None = None) -> tuple[int, int]:
    """Corpus-sized LSH defaults: ``n_bits ~ log2(n / 100)`` targets ~100
    candidates per bucket (measured on the 375k bench embeddings: the sqrt
    rule's n_bits=9 left ~730-row buckets and a 384 s scan at 10k queries;
    bucket~100 at n_bits=12 runs 60 s at recall@10 0.88), clamped to
    [2, 20]; ``n_tables = 8`` is the recall-first default (0.88 vs 0.71 at
    4 tables, which halves the time — pass n_tables explicitly to trade).
    IVF remains the recommended scale path (14 s / 0.86 on the same bench):
    LSH replicates every candidate n_tables-fold through the exchange while
    IVF ships each exactly once; LSH's edge is zero training pass and O(1)
    assignment."""
    if n_bits is None:
        import math

        n_bits = max(2, min(20, round(math.log2(max(2.0, n_cand / 100.0)))))
    if n_tables is None:
        n_tables = 8
    return n_bits, n_tables


def lsh_topk(queries, candidates, k: int = 10, n_bits: int | None = None,
             n_tables: int | None = None, flip_probes: bool = True,
             id_col: str = "vec_id", emb_col: str = "embedding",
             exclude_self: bool = True, seed: int = 42,
             num_partitions: int = 16, pack_dtype=np.float32):
    """Random-hyperplane (sign) LSH approximate cosine top-k — the bucketed
    alternative to IVF (Charikar 2002 SimHash rounding; the same family as
    the MinHash banding in stages/blocking.py, applied to dense vectors).

    Plan shape is identical to ivf_topk and shares its exchange/merge tail:
    candidates land in ``n_tables`` buckets each (key = table << n_bits |
    sign-code), queries probe their own bucket per table — plus, with
    ``flip_probes``, every radius-1 bit-flip bucket (multi-probe LSH: recall
    of many more tables at the probe-row cost, not the candidate-replication
    cost). All probe hits are exact-cosine re-ranked per bucket and merged
    per query with cross-table dedup.

    ``n_bits=0, n_tables=1`` is EXHAUSTIVE — one bucket, exactly brute force
    (the SQL-oracle anchor, ann_lsh_exhaustive). Tradeoff vs IVF: no
    training pass (no sample, no k-means) and O(1) bucket assignment, but
    candidates replicate n_tables-fold through the exchange; IVF ships each
    candidate once. Deterministic: hyperplanes derive from ``seed`` alone.
    """
    n_cand = candidates.count()
    n_bits, n_tables = autotune_lsh(n_cand, n_bits, n_tables)

    def _assign(t: pa.Table) -> pa.Table:
        emb = _normalize(_list_matrix(t.column(emb_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _lsh_codes(emb, n_bits, n_tables, seed)
        n = ids.shape[0]
        rep = np.repeat(np.arange(n), n_tables)
        return pa.table({
            "cell": pa.array(codes.ravel()),
            "__side": pa.array(np.zeros(n * n_tables, dtype=np.int8)),
            "vec": pa.array(np.repeat(ids, n_tables)),
            "emb": _emb_fixed_bin(emb[rep], dtype=pack_dtype),
        })

    cand_rows = candidates.map_batches(_assign, batch_format="pyarrow")

    def _probe(t: pa.Table) -> pa.Table:
        emb = _normalize(_list_matrix(t.column(emb_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _lsh_codes(emb, n_bits, n_tables, seed)  # (n, T)
        n = ids.shape[0]
        if flip_probes and n_bits > 0:
            # radius-1 multi-probe: the exact bucket + every 1-bit flip
            flips = codes[:, :, None] ^ (
                np.int64(1) << np.arange(n_bits, dtype=np.int64)
            )[None, None, :]
            codes = np.concatenate([codes[:, :, None], flips], axis=2)
        codes = codes.reshape(n, -1)
        p = codes.shape[1]
        rep = np.repeat(np.arange(n), p)
        return pa.table({
            "cell": pa.array(codes.ravel()),
            "__side": pa.array(np.ones(n * p, dtype=np.int8)),
            "vec": pa.array(np.repeat(ids, p)),
            "emb": _emb_fixed_bin(emb[rep], dtype=pack_dtype),
        })

    probe_rows = queries.map_batches(_probe, batch_format="pyarrow")

    # probe a one-row schema for dim: hyperplane shape needs d, but the
    # exchange sizing only needs an estimate — use 64 if unknown
    dim = 64
    try:
        sch = candidates.schema()
        f = sch.field(emb_col) if hasattr(sch, "field") else None
        if f is not None and pa.types.is_fixed_size_list(f.type):
            dim = f.type.list_size
    except Exception:
        pass
    return _ann_exchange_topk(
        cand_rows, probe_rows, k=k, exclude_self=exclude_self,
        pack_dtype=pack_dtype, n_cand_rows=n_cand * n_tables, dim=dim,
        num_partitions=num_partitions,
        max_parts=max(2, n_tables << min(n_bits, 20)),
    )
