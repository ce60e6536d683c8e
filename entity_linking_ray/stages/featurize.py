"""Featurization: content -> (MinHash signature, embedding, token prefix).

The heavy stateful stage — an actor-pool ``map_batches`` callable class. Per
actor ``__init__`` builds the encoder weights and MinHash coefficients ONCE
(the analog of loading the bi-encoder checkpoint once per process,
/root/reference/src/compute_embeddings.py:46-52) and keeps a bounded
sha256-keyed feature cache (the north star's "cached candidate embeddings"):
exact-duplicate content — rampant in code corpora — featurizes once per actor.

``content`` is DROPPED on output: downstream shuffles move only
(row_id, node, sha256, sig, emb, tokseq) — ~2 KB/row instead of multi-MB files
(SURVEY.md §7.3 "wide rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import LinkageConfig
from ..functions.hashing import (
    minhash_params,
    minhash_signatures,
    oph_signatures,
    rolling_shingle_hashes,
)
from ..functions.text import token_hashes
from .encoder import build_encoder

_CACHE_MAX = 65536


class FeaturizeStage:
    """Actor-pool callable: pa.Table in -> pa.Table out (content dropped)."""

    def __init__(self, cfg: LinkageConfig):
        self.cfg = cfg
        self.encoder = build_encoder(cfg.encoder, dim=cfg.embed_dim, seed=cfg.seed)
        self.a, self.b = minhash_params(cfg.num_perm, cfg.seed)
        self._cache: dict[str, tuple[bytes, np.ndarray, bytes, int]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch.column("content").to_pylist()
        shas = batch.column("sha256").to_pylist()
        n = len(contents)
        sigs: list[bytes | None] = [None] * n
        embs = np.empty((n, self.cfg.embed_dim), dtype=np.float32)
        tokseqs: list[bytes | None] = [None] * n
        ntoks = np.empty(n, dtype=np.int32)

        # cache pass: exact-dup content (keyed by sha) featurizes once per actor
        miss_idx: list[int] = []
        miss_sha_first: dict[str, int] = {}
        for i, sha in enumerate(shas):
            feats = self._cache.get(sha)
            if feats is not None:
                sigs[i], embs[i], tokseqs[i], ntoks[i] = feats
            elif sha in miss_sha_first:
                miss_idx.append(i)  # backfilled from the first occurrence below
            else:
                miss_sha_first[sha] = i
                miss_idx.append(i)

        # batched featurization of the distinct cache misses: ONE kernel call
        # per batch (per-row minhash calls pay 128 small-array passes each)
        uniq = list(miss_sha_first.items())
        if uniq:
            ths = [token_hashes(contents[i]) for _, i in uniq]
            shingles = []
            for th in ths:
                sh = rolling_shingle_hashes(th, self.cfg.shingle_w)
                if sh.shape[0] == 0:
                    sh = (th[:1] if th.shape[0] else np.zeros(1, dtype=np.uint64)) & np.uint64(0xFFFFFFFF)
                shingles.append(sh)
            if self.cfg.minhash == "oph":
                sig_m = oph_signatures(shingles, self.cfg.num_perm, self.cfg.seed)
            else:
                sig_m = minhash_signatures(shingles, self.a, self.b)
            emb_m = self.encoder.embed_token_hashes(ths)
            for k, (sha, i) in enumerate(uniq):
                feats = (
                    sig_m[k].tobytes(),
                    emb_m[k],
                    ths[k][: self.cfg.tokseq_cap].astype(np.uint32).tobytes(),
                    int(ths[k].shape[0]),
                )
                if len(self._cache) < _CACHE_MAX:
                    self._cache[sha] = feats
            sha_to_k = {s: k for k, (s, _) in enumerate(uniq)}
            for i in miss_idx:
                feats = self._cache.get(shas[i])
                if feats is None:  # cache full: reuse this batch's kernel output
                    k = sha_to_k[shas[i]]
                    feats = (
                        sig_m[k].tobytes(),
                        emb_m[k],
                        ths[k][: self.cfg.tokseq_cap].astype(np.uint32).tobytes(),
                        int(ths[k].shape[0]),
                    )
                sigs[i], embs[i], tokseqs[i], ntoks[i] = feats
        keep = [c for c in batch.column_names if c != "content"]
        out = batch.select(keep)
        out = out.append_column("sig", pa.array(sigs, type=pa.binary()))
        # emb stored as raw float32 bytes: Arrow acero hash joins reject
        # FixedSizeList payload columns, and binary round-trips zero-copy
        emb_bytes = [embs[i].tobytes() for i in range(len(contents))]
        out = out.append_column("emb", pa.array(emb_bytes, type=pa.binary()))
        out = out.append_column("tokseq", pa.array(tokseqs, type=pa.binary()))
        out = out.append_column("n_tokens", pa.array(ntoks))
        return out


def featurize(ds, cfg: LinkageConfig):
    """Attach features via an actor pool (fn_constructor_args keeps cfg on the
    actor, not re-shipped per batch)."""
    if cfg.featurize_concurrency is not None:
        concurrency = cfg.featurize_concurrency
    else:
        # eager pool sized to the session: autoscaling from 1 pays the actor
        # ramp serially at the head of every run; starting ~3/4 of the cores'
        # worth of actors immediately overlaps spin-up with the read
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        lo = max(1, (3 * cpus) // 4)
        concurrency = (lo, max(lo, cpus))
    return ds.map_batches(
        FeaturizeStage,
        batch_format="pyarrow",
        batch_size=cfg.featurize_batch_size,
        fn_constructor_args=(cfg,),
        num_cpus=1,
        concurrency=concurrency,
    )
