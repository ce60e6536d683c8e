"""Pairwise scoring: bi-encoder dot product + MinHash-Jaccard + Levenshtein.

Mirrors the reference's scoring semantics — dense dot product between the two
towers' embeddings (/root/reference/src/bi_encoder.py:96,
src/eval_zeshel.py:44) — applied per candidate pair instead of all-pairs, plus
the north rule's token-level Jaccard and Levenshtein fallbacks.

Plan shape: candidate pairs (src, dst, block_key) are hash-joined twice against
the compact feature table (sig/emb/tokseq — content was dropped at featurize),
then scored fully vectorized per batch:

- ``dot``      einsum over the two (n, d) embedding matrices' rows
- ``jac``      mean equal-positions of the two (n, num_perm) uint32 signatures
- ``lev``      banded token-sequence Levenshtein, computed ONLY for borderline
               pairs (within ``borderline_margin`` of a threshold) — the rare
               slow path never touches the bulk.

Match rule (an edge is emitted when score >= tau_emit; the final edge filter
applies the match thresholds): matched if jac >= tau_jaccard or
dot >= tau_dot, else if borderline then lev >= tau_lev.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import LinkageConfig
from ..functions.similarity import token_levenshtein_ratio
from .common import safe_join


def _rename(features, mapping: dict[str, str], keep: list[str]):
    def _m(t: pa.Table) -> pa.Table:
        t = t.select(keep)
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return features.map_batches(_m, batch_format="pyarrow", zero_copy_batch=True)


def join_pair_features(pairs, features, cfg: LinkageConfig):
    """pairs (src,dst,block_key) ⋈ features twice -> scored-pair input table."""
    keep = ["node", "sig", "emb", "tokseq"]
    fa = _rename(features, {"node": "src", "sig": "sig_a", "emb": "emb_a", "tokseq": "tokseq_a"}, keep)
    fb = _rename(features, {"node": "dst", "sig": "sig_b", "emb": "emb_b", "tokseq": "tokseq_b"}, keep)
    out = safe_join(pairs, fa, join_type="inner", num_partitions=cfg.shuffle_partitions, on=("src",))
    out = safe_join(out, fb, join_type="inner", num_partitions=cfg.shuffle_partitions, on=("dst",))
    return out


class ScorePairs:
    """Vectorized stateless scorer (plain function semantics; class only to
    precompute config-derived constants once per task via fn_constructor)."""

    def __init__(self, cfg: LinkageConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                    "kind": pa.array([], type=pa.string()),
                    "matched": pa.array([], type=pa.bool_()),
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
        lev = np.zeros(n)
        if borderline.any():
            ta = batch.column("tokseq_a").to_pylist()
            tb = batch.column("tokseq_b").to_pylist()
            for i in np.flatnonzero(borderline):
                a = np.frombuffer(ta[i], dtype=np.uint32)
                b = np.frombuffer(tb[i], dtype=np.uint32)
                lev[i] = token_levenshtein_ratio(a, b)
        matched |= borderline & (lev >= cfg.tau_lev)

        score = np.maximum(np.maximum(jac, dot), lev)
        kind = np.where(lev >= cfg.tau_lev, "lev", np.where(jac >= dot, "jaccard", "dot"))
        keep = matched | (score >= cfg.tau_emit)
        return pa.table(
            {
                "src": pa.array(batch.column("src").to_numpy(zero_copy_only=False)[keep]),
                "dst": pa.array(batch.column("dst").to_numpy(zero_copy_only=False)[keep]),
                "score": pa.array(score[keep]),
                "kind": pa.array(kind[keep].tolist(), type=pa.string()),
                "matched": pa.array(matched[keep]),
                "block_key": pa.array(batch.column("block_key").to_numpy(zero_copy_only=False)[keep]),
            }
        )


def score_pairs(pair_feats, cfg: LinkageConfig):
    return pair_feats.map_batches(
        ScorePairs, fn_constructor_args=(cfg,), batch_format="pyarrow", concurrency=(1, 8)
    )


def filter_edges(edges, cfg: LinkageConfig):
    """Stateless edge filter: keep match-grade edges for clustering."""
    import pyarrow.compute as pc

    def _f(t: pa.Table) -> pa.Table:
        if "matched" in t.column_names:
            t = t.filter(t["matched"])
        return t

    return edges.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
