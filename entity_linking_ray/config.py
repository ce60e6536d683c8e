"""Pipeline configuration.

One dataclass carries every knob; its stable hash keys checkpoint manifests so
a resume only reuses stage output produced under an identical configuration.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class LinkageConfig:
    # --- determinism ---
    seed: int = 42

    # --- featurization (reference analog: tokenize + embed,
    #     zeshel_dataset.py:62-115 / bi_encoder.py:39-83) ---
    encoder: str = "hashing"  # "hashing" (deterministic, no deps) | "torch" (gated)
    embed_dim: int = 128  # reference projects 768 -> 128 (bi_encoder.py:36-37)
    shingle_w: int = 5  # tokens per shingle
    num_perm: int = 128  # MinHash permutations
    # "oph": one-permutation hashing + rotation densification (1 memory pass;
    # see functions.hashing.oph_signatures); "kmin": classic per-permutation
    # keyed mixers (num_perm passes — bandwidth-bound on one node)
    minhash: str = "oph"
    tokseq_cap: int = 256  # token-hash prefix kept for Levenshtein fallback

    # --- blocking (LSH) ---
    bands: int = 32  # 32 bands x 4 rows: s-curve threshold ~0.42, high recall
    max_block_size: int = 64  # salt blocks larger than this
    salt_shard_size: int = 32  # rows per salted shard (plus the representative)
    broadcast_key_limit: int = 2_000_000  # multi-key filter via broadcast below this
    # "pairs" (default): expand pairs per band partition, dedup (src, dst)
    # directly. "blocks": dedup identical member SETS (block descriptors)
    # BEFORE pair expansion — wins only when many bands share exactly the
    # same member set; after exact-collapse has removed identical files,
    # near-dup variants collide in DIFFERENT subsets per band, so measured
    # A/B on the 375k bench corpus: pairs ~15-17 s vs blocks ~19-21 s at 16
    # CPUs, identical output (test_lsh_pair_plans_identical). Kept as the
    # plan for corpora with massive identical-set clusters (e.g. no
    # exact-collapse stage upstream).
    pair_plan: str = "pairs"

    # --- scoring (reference analog: dot product eval_zeshel.py:44;
    #     fallbacks per the north rule) ---
    tau_jaccard: float = 0.62  # est-Jaccard match threshold
    tau_dot: float = 0.90  # embedding dot-product match threshold
    tau_emit: float = 0.35  # emit candidate edges above this (filtered later)
    borderline_margin: float = 0.08  # Levenshtein fallback band around thresholds
    tau_lev: float = 0.70  # token-Levenshtein ratio decision threshold

    # --- scoring plan selection ---
    # feature tables up to this many rows are broadcast once via ray.put and
    # pairs are scored with zero shuffle (lookup by sorted node id); larger
    # tables use hash-shuffle feature joins. ~1.3 KB/row -> ~4 GB at the
    # default gate: one zero-copy plasma mmap per NODE (not per worker), so
    # size this to ~5% of per-node object-store memory. Crossing the gate
    # costs ~5x on one box (the per-pair feature join ships KB-sized rows),
    # so prefer raising it as long as the packed features fit comfortably.
    # At runtime every gate site clamps this against the ACTUAL plasma size
    # (common.effective_broadcast_rows: 5% of object-store bytes / 1.3 KB),
    # so hosts with small object stores fall back to the join plan safely.
    broadcast_feature_rows: int = 3_000_000
    # compact the broadcast score pack 4x: MinHash positions to uint8
    # fingerprints (equality-test bias <= (1-jac)/256 ~ +0.004, far inside
    # borderline_margin) and embeddings to per-row int8 affine codes whose
    # dequantized dot is computed EXACTLY in integer arithmetic (elementwise
    # quantization error ~1e-3 on unit-norm vectors, also inside the margin).
    # The 32-CPU regime of the headline is memory-bandwidth-bound, so gather
    # bytes — not CPU — set the scoring stage's wall there. Off by default:
    # exactness of the 6-dp dot/jac values is part of several oracle checks.
    compact_pack: bool = False

    # --- clustering ---
    max_cc_rounds: int = 25
    # edge lists up to this size cluster with a driver-side union-find (the
    # contracted graph after exact-collapse + LSH filtering is tiny relative
    # to the corpus); above it, the iterative distributed min-label rounds
    # run. 0 disables the shortcut (tests force the distributed path).
    driver_cc_edge_limit: int = 5_000_000

    # --- execution ---
    featurize_concurrency: int | None = None  # None -> Ray autoscaling tasks
    featurize_batch_size: int = 256
    shuffle_partitions: int = 64  # num_partitions for joins / groupbys at bench scale

    passthrough_cols: tuple[str, ...] = ("repo", "path", "lang")

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]
