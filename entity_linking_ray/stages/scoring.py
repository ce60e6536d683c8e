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


def _pack_features(t: pa.Table) -> pa.Table:
    """One row per input batch: each feature column flattened to a single
    binary blob (sig/emb are fixed-width; tokseq carries its lengths)."""
    nodes = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    sig_blob, _ = _binary_blob(t.column("sig"))
    emb_blob, _ = _binary_blob(t.column("emb"))
    tok_blob, tok_lens = _binary_blob(t.column("tokseq"))
    return pa.table({
        "nodes": pa.array([nodes.tobytes()], type=pa.large_binary()),
        "sig": pa.array([sig_blob.tobytes()], type=pa.large_binary()),
        "emb": pa.array([emb_blob.tobytes()], type=pa.large_binary()),
        "tok_blob": pa.array([tok_blob.tobytes()], type=pa.large_binary()),
        "tok_lens": pa.array([tok_lens.tobytes()], type=pa.large_binary()),
    })


# per-worker-process record of broadcast packs already page-swept, keyed by
# the ObjectRef hex string (stable per broadcast; an id() key could be
# recycled after the cached deserialized object is GC'd and falsely skip the
# sweep for a NEW pack)
_PREFAULTED: set[str] = set()


def _pack_group(*tabs) -> pa.Table:
    """Remote pack task: flatten a group of feature blocks into packed rows
    (one row per block) via zero-copy Arrow buffer access."""
    packed = [_pack_features(t) for t in tabs if t.num_rows]
    if not packed:
        packed = [_pack_features(pa.table({
            "node": pa.array([], type=pa.int64()),
            "sig": pa.array([], type=pa.large_binary()),
            "emb": pa.array([], type=pa.large_binary()),
            "tokseq": pa.array([], type=pa.large_binary()),
        }))]
    return pa.concat_tables(packed)


def _build_pack(num_perm: int, embed_dim: int, *rows):
    """Remote reduce: packed rows -> the two broadcast lookup tuples.

    Returned (via ``num_returns=2``) as two separate plasma objects: every
    scoring task maps the (sig, emb) lookup, but the token blob — needed only
    for the borderline Levenshtein fallback — is mapped lazily, so most tasks
    never touch its pages."""
    allt = pa.concat_tables(rows)  # zero-copy; empty packed rows add 0 bytes

    def _col_np(name: str, dtype) -> np.ndarray:
        a = allt.column(name).combine_chunks()
        off = np.frombuffer(a.buffers()[1], dtype=np.int64)[: len(a) + 1]
        data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
        return data[off[0]: off[-1]].view(dtype)

    nodes = _col_np("nodes", np.int64)
    sig = _col_np("sig", np.uint32).reshape(-1, num_perm)
    emb = _col_np("emb", np.float32).reshape(-1, embed_dim)
    blob = _col_np("tok_blob", np.uint8)
    lens = _col_np("tok_lens", np.int64)
    # sig/emb/blob stay in ARRIVAL order — a 100s-of-MB gather into sorted
    # order costs a serial memcpy storm; instead ship the sorted node index
    # plus its permutation and let each (parallel) scoring task double-index
    order = np.argsort(nodes, kind="stable")
    starts = np.zeros(lens.shape[0], dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return (nodes[order], order, sig, emb), (blob, starts, lens)


def prepare_score_pack(features, cfg: LinkageConfig):
    """Launch the broadcast score-pack build as chained remote tasks; returns
    (ref, tok_ref) ObjectRefs WITHOUT blocking the driver.

    The build (per-block-group flatten -> one reduce that sorts the node
    index) runs in workers concurrently with whatever the pipeline does next —
    link_dataset calls this right before the LSH blocking section, so the pack
    lands while blocking computes. The old inline build held the driver for a
    flat ~2-3 s (collect + concat + ray.put of ~300 MB on the 375k-file
    corpus), constant in num_cpus — one of the three flat terms that pinned
    scaling efficiency.

    ``features`` should be materialized/checkpointed (it is, in link_dataset);
    on a lazy dataset ``to_arrow_refs`` would execute it here."""
    import ray

    refs = features.to_arrow_refs()
    pack_t = ray.remote(num_cpus=1)(_pack_group)
    groups = [refs[i: i + 8] for i in range(0, len(refs), 8)]
    packed = ([pack_t.remote(*g) for g in groups]
              if groups else [pack_t.remote()])
    build_t = ray.remote(num_cpus=1, num_returns=2)(_build_pack)
    return build_t.remote(cfg.num_perm, cfg.embed_dim, *packed)


def _score_edges_broadcast(pairs, features, cfg: LinkageConfig, pack=None):
    """Zero-shuffle scoring: the compact feature arrays land in plasma ONCE
    and every scoring task looks pairs up by sorted node id. Used whenever the
    feature table fits (cfg.broadcast_feature_rows); this is the single-node
    fast path — per-pair shuffle joins are memory-bandwidth bound and do not
    scale with cores."""
    import ray

    ref, tok_ref = pack if pack is not None else prepare_score_pack(features, cfg)
    import os
    import sys
    import time

    _trace = os.environ.get("ELR_TIMING") == "1"

    def _score(batch: pa.Table) -> pa.Table:
        _bt0 = time.time()
        fnodes, fperm, fsig, femb = ray.get(ref)
        _pkey = ref.hex()
        if _pkey not in _PREFAULTED:
            # touch one byte per page SEQUENTIALLY before the random pair
            # gathers: a cold plasma mapping faulted in random order stalls
            # for seconds under this host's THP compaction, while a
            # sequential sweep rides readahead (~0.05 s hot, ~0.3 s cold)
            fsig.reshape(-1)[::1024].sum()
            femb.reshape(-1)[::1024].sum()
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
        jac = (fsig[ia] == fsig[ib]).mean(axis=1)
        dot = np.einsum("ij,ij->i", femb[ia], femb[ib]).astype(np.float64)
        matched = (jac >= cfg.tau_jaccard) | (dot >= cfg.tau_dot)
        borderline = ~matched & (
            (jac >= cfg.tau_jaccard - cfg.borderline_margin)
            | (dot >= cfg.tau_dot - cfg.borderline_margin)
        )
        lev = np.zeros(n)
        if borderline.any():
            fblob, fstart, flen = ray.get(tok_ref)
            for i in np.flatnonzero(borderline):
                sa, la = fstart[ia[i]], flen[ia[i]]
                sb, lb = fstart[ib[i]], flen[ib[i]]
                a = np.ascontiguousarray(fblob[sa: sa + la]).view(np.uint32)
                b = np.ascontiguousarray(fblob[sb: sb + lb]).view(np.uint32)
                lev[i] = token_levenshtein_ratio(a, b)
            matched = matched | (borderline & (lev >= cfg.tau_lev))
        if _trace:
            sys.stderr.write(
                f"[score] batch n={n} border={int(borderline.sum())} "
                f"{time.time()-_bt0:.2f}s\n"
            )
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
    # scoring task count — 1.2M bench pairs yield ~38 tasks, enough to fill
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
