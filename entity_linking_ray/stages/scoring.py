"""Pairwise scoring: bi-encoder dot product + MinHash-Jaccard + Levenshtein.

Mirrors the reference's scoring semantics — dense dot product between the two
towers' embeddings (/root/reference/src/bi_encoder.py:96,
src/eval_zeshel.py:44) — applied per candidate pair instead of all-pairs, plus
the north rule's token-level Jaccard and Levenshtein fallbacks.

Two-phase plan (shuffle-volume aware):

1. **bulk scoring**: candidate pairs are hash-joined twice against a SLIM
   feature projection (sig 512 B + emb 512 B — tokseq stays home), then scored
   fully vectorized per batch: ``dot`` via einsum, ``jac`` as mean
   equal-positions of the uint32 signatures. Pairs are decided here unless
   they fall within ``borderline_margin`` of a threshold.
2. **borderline resolution**: the (rare) borderline pairs alone are joined
   back to the token-prefix column and decided by banded token-sequence
   Levenshtein. This keeps the KB-scale ``tokseq`` payload out of the main
   all-to-all exchange — single-node shuffles are memory-bandwidth bound, so
   payload bytes, not CPU, set their wall time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import LinkageConfig
from ..functions.similarity import token_levenshtein_ratio
from .common import safe_join


def _rename(features, mapping: dict[str, str], keep: list[str]):
    def _m(t: pa.Table) -> pa.Table:
        t = t.select(keep)
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return features.map_batches(_m, batch_format="pyarrow", zero_copy_batch=True)


def join_pair_features(pairs, features, cfg: LinkageConfig, cols=("sig", "emb")):
    """pairs (src,dst,block_key) ⋈ features twice -> scored-pair input table.

    Only the columns in ``cols`` are shipped (default: signature + embedding;
    the Levenshtein token prefix is fetched later for borderline pairs only).
    """
    keep = ["node", *cols]
    fa = _rename(features, {"node": "src", **{c: f"{c}_a" for c in cols}}, keep)
    fb = _rename(features, {"node": "dst", **{c: f"{c}_b" for c in cols}}, keep)
    out = safe_join(pairs, fa, join_type="inner", num_partitions=cfg.shuffle_partitions, on=("src",))
    out = safe_join(out, fb, join_type="inner", num_partitions=cfg.shuffle_partitions, on=("dst",))
    return out


def _bulk_score(batch: pa.Table, cfg: LinkageConfig) -> pa.Table:
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "src": pa.array([], type=pa.int64()),
                "dst": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
                "kind": pa.array([], type=pa.string()),
                "matched": pa.array([], type=pa.bool_()),
                "borderline": pa.array([], type=pa.bool_()),
                "block_key": pa.array([], type=pa.int64()),
            }
        )
    sig_a = np.frombuffer(b"".join(batch.column("sig_a").to_pylist()), dtype=np.uint32).reshape(n, -1)
    sig_b = np.frombuffer(b"".join(batch.column("sig_b").to_pylist()), dtype=np.uint32).reshape(n, -1)
    emb_a = np.frombuffer(b"".join(batch.column("emb_a").to_pylist()), dtype=np.float32).reshape(n, -1)
    emb_b = np.frombuffer(b"".join(batch.column("emb_b").to_pylist()), dtype=np.float32).reshape(n, -1)
    jac = (sig_a == sig_b).mean(axis=1)
    dot = np.einsum("ij,ij->i", emb_a, emb_b).astype(np.float64)

    matched = (jac >= cfg.tau_jaccard) | (dot >= cfg.tau_dot)
    borderline = ~matched & (
        (jac >= cfg.tau_jaccard - cfg.borderline_margin)
        | (dot >= cfg.tau_dot - cfg.borderline_margin)
    )
    score = np.maximum(jac, dot)
    kind = np.where(jac >= dot, "jaccard", "dot")
    keep = matched | borderline | (score >= cfg.tau_emit)
    return pa.table(
        {
            "src": pa.array(batch.column("src").to_numpy(zero_copy_only=False)[keep]),
            "dst": pa.array(batch.column("dst").to_numpy(zero_copy_only=False)[keep]),
            "score": pa.array(score[keep]),
            "kind": pa.array(kind[keep].tolist(), type=pa.string()),
            "matched": pa.array(matched[keep]),
            "borderline": pa.array(borderline[keep]),
            "block_key": pa.array(batch.column("block_key").to_numpy(zero_copy_only=False)[keep]),
        }
    )


def _resolve_borderline(borderline, features, cfg: LinkageConfig):
    """Join tokseq for the (small) borderline set; decide by Levenshtein."""
    pf = join_pair_features(
        borderline.map_batches(
            lambda t: t.select(["src", "dst", "block_key"]), batch_format="pyarrow"
        ),
        features,
        cfg,
        cols=("tokseq",),
    )

    def _lev(t: pa.Table) -> pa.Table:
        ta = t.column("tokseq_a").to_pylist()
        tb = t.column("tokseq_b").to_pylist()
        lev = np.empty(len(ta))
        for i in range(len(ta)):
            lev[i] = token_levenshtein_ratio(
                np.frombuffer(ta[i], dtype=np.uint32), np.frombuffer(tb[i], dtype=np.uint32)
            )
        matched = lev >= cfg.tau_lev
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "score": pa.array(lev),
                "kind": pa.array(["lev"] * len(ta), type=pa.string()),
                "matched": pa.array(matched),
                "block_key": t["block_key"],
            }
        )

    return pf.map_batches(_lev, batch_format="pyarrow")


def _binary_blob(col) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a (chunked) Binary column into one uint8 blob + lengths,
    via direct Arrow buffer access — no per-row Python objects."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    blobs, lens = [], []
    for a in chunks:
        n = len(a)
        if n == 0:
            continue
        off_dtype = np.int64 if pa.types.is_large_binary(a.type) else np.int32
        offsets = np.frombuffer(a.buffers()[1], dtype=off_dtype)[
            a.offset: a.offset + n + 1
        ]
        data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
        blobs.append(data[offsets[0]: offsets[-1]])
        lens.append(np.diff(offsets).astype(np.int64))
    if not blobs:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    return np.concatenate(blobs), np.concatenate(lens)


def _shard_arrays(num_perm: int, embed_dim: int, compact: bool, *tabs):
    """Remote pack task: a group of feature blocks -> ONE plasma shard of
    contiguous numpy arrays (nodes, sig matrix, emb matrix, tok blob, tok
    starts, tok lens[, emb quant params, emb code sums]), assembled via
    zero-copy Arrow buffer access.

    The shards ARE the broadcast pack: no monolithic reduce ever concatenates
    them. A single build task re-copying ~GB of plasma pages ran at ~30 MB/s
    on this host (THP page-fault stalls are per-process and serial), turning
    the pack build into a 30-40 s critical-path stall on the 1.1M-file
    corpus, while the same bytes faulted across parallel pack tasks take ~2 s.
    Scoring tasks gather per shard (see _score_edges_broadcast).

    ``compact`` (cfg.compact_pack): sig positions stored as their LOW BYTE
    (uint8 keyed-splitmix output is uniform per byte; equality collisions add
    <= (1-jac)/256 to the jaccard estimate) and embeddings as per-row int8
    affine codes (params = (mn, scale) float64 per row, code_sum int64) so
    the scoring gathers move ~4x fewer bytes through the one shared memory
    system. The dequantized dot is computed exactly from the codes (see
    _compact_dot), so results are deterministic."""
    live = [t for t in tabs if t.num_rows]
    nodes = (np.concatenate([
        t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        for t in live
    ]) if live else np.empty(0, dtype=np.int64))
    sig_blob = (np.concatenate([_binary_blob(t.column("sig"))[0] for t in live])
                if live else np.empty(0, dtype=np.uint8))
    emb_blob = (np.concatenate([_binary_blob(t.column("emb"))[0] for t in live])
                if live else np.empty(0, dtype=np.uint8))
    toks = [_binary_blob(t.column("tokseq")) for t in live]
    tok_blob = (np.concatenate([b for b, _ in toks])
                if toks else np.empty(0, dtype=np.uint8))
    tok_lens = (np.concatenate([l for _, l in toks])
                if toks else np.empty(0, dtype=np.int64))
    tok_starts = np.zeros(tok_lens.shape[0], dtype=np.int64)
    if tok_lens.shape[0]:
        np.cumsum(tok_lens[:-1], out=tok_starts[1:])
    sig = sig_blob.view(np.uint32).reshape(-1, num_perm)
    emb = emb_blob.view(np.float32).reshape(-1, embed_dim)
    if not compact:
        return (nodes, sig, emb, tok_blob, tok_starts, tok_lens, None)
    sig8 = (sig & np.uint32(0xFF)).astype(np.uint8)
    m = emb.astype(np.float64)
    mn = m.min(axis=1) if m.shape[0] else np.empty(0)
    mx = m.max(axis=1) if m.shape[0] else np.empty(0)
    scale = (mx - mn) / 255.0
    safe = scale > 0
    codes = np.zeros(m.shape, dtype=np.uint8)
    if safe.any():
        codes[safe] = np.floor(
            (m[safe] - mn[safe, None]) / scale[safe, None] + 0.5
        ).astype(np.uint8)
    params = np.stack([mn, scale], axis=1)  # (n, 2) float64
    return (nodes, sig8, codes, tok_blob, tok_starts, tok_lens, params)


def _shard_index(*shards):
    """Remote index task: per-shard node arrays -> (sorted nodes, global
    arrival-order permutation, shard offsets). Touches ONLY the (tiny) node
    arrays of each shard — the sig/emb/tok pages stay cold until a scoring
    task actually gathers them."""
    ns = [s[0] for s in shards]
    sizes = np.array([n.shape[0] for n in ns], dtype=np.int64)
    offs = np.zeros(sizes.shape[0] + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    nodes = np.concatenate(ns) if ns else np.empty(0, dtype=np.int64)
    order = np.argsort(nodes, kind="stable")
    return nodes[order], order, offs


# per-worker-process record of broadcast shards already page-swept, keyed by
# the ObjectRef hex string (stable per shard; an id() key could be recycled
# after the cached deserialized object is GC'd and falsely skip the sweep)
_PREFAULTED: set[str] = set()


def prepare_score_pack(features, cfg: LinkageConfig):
    """Launch the broadcast score-pack build; returns (index_ref,
    [shard_ref, ...]) WITHOUT blocking the driver.

    One pack task per ~8 feature blocks builds one contiguous SHARD; a tiny
    index task sorts the concatenated node ids and records shard offsets.
    Everything runs in workers concurrently with whatever the pipeline does
    next — link_dataset calls this right before the LSH blocking section, so
    the pack lands while blocking computes.

    ``features`` should be materialized/checkpointed (it is, in link_dataset);
    on a lazy dataset ``to_arrow_refs`` would execute it here."""
    import ray

    refs = features.to_arrow_refs()
    pack_t = ray.remote(num_cpus=1)(_shard_arrays)
    groups = [refs[i: i + 8] for i in range(0, len(refs), 8)]
    compact = cfg.compact_pack
    shard_refs = ([pack_t.remote(cfg.num_perm, cfg.embed_dim, compact, *g)
                   for g in groups]
                  if groups else [pack_t.remote(cfg.num_perm, cfg.embed_dim,
                                                compact)])
    index_ref = ray.remote(num_cpus=1)(_shard_index).remote(*shard_refs)
    return index_ref, shard_refs


def _score_edges_broadcast(pairs, features, cfg: LinkageConfig, pack=None):
    """Zero-shuffle scoring: the compact feature arrays land in plasma ONCE
    (as parallel-built shards) and every scoring task looks pairs up by
    sorted node id, gathering per shard. Used whenever the feature table fits
    (cfg.broadcast_feature_rows); this is the single-node fast path — per-pair
    shuffle joins are memory-bandwidth bound and do not scale with cores."""
    import ray

    index_ref, shard_refs = (pack if pack is not None
                             else prepare_score_pack(features, cfg))

    def _gather(shards, col: int, sh, loc, out):
        """out[i] = shards[sh[i]][col][loc[i]] — one vectorized masked gather
        per shard, in ASCENDING row order: the gather indices are sorted so
        the big mmap'd shard is read near-sequentially (page/TLB-friendly;
        random fancy-indexing order was the memory-bandwidth hot spot of the
        whole scoring stage) and the results scattered back into the small
        cache-resident output block. Also sweeps each shard's pages
        sequentially on this worker's first touch (cold plasma mappings
        faulted in random order stall under this host's THP compaction)."""
        for s in np.unique(sh):
            arr = shards[s][col]
            m = np.flatnonzero(sh == s)
            ls = loc[m]
            o = np.argsort(ls, kind="stable")
            out[m[o]] = arr[ls[o]]
        return out

    def _score(batch: pa.Table) -> pa.Table:
        fnodes, fperm, offs = ray.get(index_ref)
        shards = ray.get(shard_refs)
        for si, s in enumerate(shard_refs):
            _pkey = s.hex()
            if _pkey not in _PREFAULTED:
                # touch one byte per page SEQUENTIALLY before the random pair
                # gathers (~16 MB/shard of sig+emb: cheap, and readahead-
                # friendly unlike the gathers' random fault order)
                shards[si][1].reshape(-1)[::1024].sum()
                shards[si][2].reshape(-1)[::1024].sum()
                _PREFAULTED.add(_pkey)
        n = batch.num_rows
        if n == 0:
            return pa.table({
                "src": pa.array([], type=pa.int64()),
                "dst": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
                "kind": pa.array([], type=pa.string()),
                "matched": pa.array([], type=pa.bool_()),
                "block_key": pa.array([], type=pa.int64()),
            })
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        ia = fperm[np.searchsorted(fnodes, src)]
        ib = fperm[np.searchsorted(fnodes, dst)]
        sh_a = np.searchsorted(offs, ia, side="right") - 1
        sh_b = np.searchsorted(offs, ib, side="right") - 1
        la, lb = ia - offs[sh_a], ib - offs[sh_b]
        num_perm, dim = cfg.num_perm, cfg.embed_dim
        compact = cfg.compact_pack
        sig_dt = np.uint8 if compact else np.uint32
        siga = _gather(shards, 1, sh_a, la, np.empty((n, num_perm), sig_dt))
        sigb = _gather(shards, 1, sh_b, lb, np.empty((n, num_perm), sig_dt))
        jac = (siga == sigb).mean(axis=1)
        if compact:
            # exact dequantized dot from int8 codes: with a_i = mn_a + s_a*ca_i
            # the dot expands to d*mn_a*mn_b + mn_a*s_b*Σcb + mn_b*s_a*Σca
            # + s_a*s_b*Σ(ca·cb); the code term is exact int32 arithmetic, so
            # the result is deterministic float64 — no float-matmul reorder.
            ca = _gather(shards, 2, sh_a, la,
                         np.empty((n, dim), np.uint8)).astype(np.int32)
            cb = _gather(shards, 2, sh_b, lb,
                         np.empty((n, dim), np.uint8)).astype(np.int32)
            pa_ = _gather(shards, 6, sh_a, la, np.empty((n, 2), np.float64))
            pb_ = _gather(shards, 6, sh_b, lb, np.empty((n, 2), np.float64))
            sa, sb = ca.sum(axis=1, dtype=np.int64), cb.sum(axis=1, dtype=np.int64)
            cc = np.einsum("ij,ij->i", ca, cb).astype(np.float64)
            dot = (dim * pa_[:, 0] * pb_[:, 0]
                   + pa_[:, 0] * pb_[:, 1] * sb
                   + pb_[:, 0] * pa_[:, 1] * sa
                   + pa_[:, 1] * pb_[:, 1] * cc)
        else:
            emba = _gather(shards, 2, sh_a, la, np.empty((n, dim), np.float32))
            embb = _gather(shards, 2, sh_b, lb, np.empty((n, dim), np.float32))
            dot = np.einsum("ij,ij->i", emba, embb).astype(np.float64)
        matched = (jac >= cfg.tau_jaccard) | (dot >= cfg.tau_dot)
        borderline = ~matched & (
            (jac >= cfg.tau_jaccard - cfg.borderline_margin)
            | (dot >= cfg.tau_dot - cfg.borderline_margin)
        )
        lev = np.zeros(n)
        if borderline.any():
            for i in np.flatnonzero(borderline):
                sa_sh, sb_sh = shards[sh_a[i]], shards[sh_b[i]]
                sa, la_i = sa_sh[4][la[i]], sa_sh[5][la[i]]
                sb, lb_i = sb_sh[4][lb[i]], sb_sh[5][lb[i]]
                a = np.ascontiguousarray(sa_sh[3][sa: sa + la_i]).view(np.uint32)
                b = np.ascontiguousarray(sb_sh[3][sb: sb + lb_i]).view(np.uint32)
                lev[i] = token_levenshtein_ratio(a, b)
            matched = matched | (borderline & (lev >= cfg.tau_lev))
        score = np.maximum(np.maximum(jac, dot), lev)
        kind = np.where(lev >= cfg.tau_lev, "lev", np.where(jac >= dot, "jaccard", "dot"))
        keep = matched | (score >= cfg.tau_emit)
        return pa.table({
            "src": pa.array(src[keep]),
            "dst": pa.array(dst[keep]),
            "score": pa.array(score[keep]),
            "kind": pa.array(kind[keep].tolist(), type=pa.string()),
            "matched": pa.array(matched[keep]),
            "block_key": pa.array(batch.column("block_key").to_numpy(zero_copy_only=False)[keep]),
        })

    # 32k pairs/batch: the per-batch overhead (two searchsorted probes into
    # the broadcast index) is negligible, and halving the batch doubles the
    # scoring task count -- 1.2M bench pairs yield ~38 tasks, enough to fill
    # 32 slots instead of capping at 19
    return pairs.map_batches(_score, batch_format="pyarrow", batch_size=32768)


def score_edges(pairs, features, cfg: LinkageConfig, pack=None):
    """Candidate pairs + feature table -> scored edge list (src, dst, score,
    kind, matched, block_key). Plan selection: broadcast lookup when the
    feature table fits (see _score_edges_broadcast), else the two-phase
    join plan below. ``pack``: pre-launched prepare_score_pack refs (implies
    the broadcast plan — the caller already sized the gate)."""
    from .common import effective_broadcast_rows

    if pack is not None or features.count() <= effective_broadcast_rows(
        cfg.broadcast_feature_rows
    ):
        return _score_edges_broadcast(pairs, features, cfg, pack=pack)
    scored = join_pair_features(pairs, features, cfg).map_batches(
        lambda t: _bulk_score(t, cfg), batch_format="pyarrow"
    ).materialize()

    clear = scored.map_batches(
        lambda t: t.filter(pc.invert(t["borderline"])).drop_columns(["borderline"]),
        batch_format="pyarrow",
    )
    borderline = scored.map_batches(
        lambda t: t.filter(t["borderline"]), batch_format="pyarrow"
    ).materialize()
    if borderline.count() == 0:
        return clear
    return clear.union(_resolve_borderline(borderline, features, cfg))


def filter_edges(edges, cfg: LinkageConfig):
    """Stateless edge filter: keep match-grade edges for clustering."""

    def _f(t: pa.Table) -> pa.Table:
        if "matched" in t.column_names:
            t = t.filter(t["matched"])
        return t

    return edges.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
