"""The flagship end-to-end record-linkage pipeline (SURVEY.md §7.0).

    read corpus (repo, path, commit, lang, content)
      → fingerprint            stateless map_batches: row_id / node / sha256
      → featurize              actor pool: MinHash sig + bi-encoder embedding
      → exact collapse         groupby(sha256) + join: reps + exact edges
      → LSH band explode       stateless, 16-byte band rows
      → block stats            pre-aggregated groupby (skew histogram)
      → filter + salt          singleton drop, hot-block salting + reps
      → candidate pairs        groupby(block_key).map_groups, pair dedup
      → feature joins          hash-shuffle joins (src, then dst)
      → score                  vectorized dot / sig-Jaccard / Levenshtein
      → edge filter            stateless
      → connected components   iterative min-label propagation
      → attach + verify        left-outer join, singleton fill, sha256 check
      → write_parquet + manifest

Every stage streams; nothing driver-side ever holds the corpus. With a
``checkpoint_dir``, each labeled stage persists atomically and a rerun resumes
from the last complete manifest.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..config import LinkageConfig
from ..stages.blocking import lsh_candidate_pairs
from ..stages.cluster import connected_components
from ..stages.exact import exact_collapse
from ..stages.featurize import featurize
from ..stages.fingerprint import fingerprint
from ..stages.common import safe_join
from ..stages.scoring import filter_edges, score_edges
from ..state.checkpoint import CheckpointManager


def read_corpus(path_or_ds, columns=("repo", "path", "commit", "lang", "content")):
    if isinstance(path_or_ds, str):
        return ray.data.read_parquet(path_or_ds, columns=list(columns))
    return path_or_ds


def attach_clusters(features, clusters, cfg: LinkageConfig):
    """features ⟕ clusters; rows in no component cluster to themselves.

    The cluster map holds one 16-byte row per CLUSTERED node — orders of
    magnitude smaller than the corpus — so below ``broadcast_key_limit`` it
    is broadcast as two sorted numpy arrays and attached with a zero-shuffle
    ``searchsorted`` lookup; above it, a left-outer hash join (scale plan).
    """
    n_clustered = clusters.count()
    if n_clustered == 0:
        # all-singletons corpus: a join against an empty right side crashes
        # acero (0-column partitions) — just label every row with itself
        return features.map_batches(
            lambda t: t.append_column("cluster", t.column("node")),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    if n_clustered <= cfg.broadcast_key_limit:
        import numpy as np

        import ray

        tabs = [
            t for t in (ray.get(r) for r in clusters.to_arrow_refs()) if t.num_rows
        ]
        nodes = np.concatenate([t.column("node").to_numpy() for t in tabs])
        labels = np.concatenate([t.column("cluster").to_numpy() for t in tabs])
        order = np.argsort(nodes)
        ref = ray.put((nodes[order], labels[order]))

        def _attach(t: pa.Table) -> pa.Table:
            cn, cl = ray.get(ref)
            node = t.column("node").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(cn, node)
            idx[idx >= cn.shape[0]] = 0
            hit = cn[idx] == node
            out = np.where(hit, cl[idx], node)
            return t.append_column("cluster", pa.array(out))

        return features.map_batches(_attach, batch_format="pyarrow", zero_copy_batch=True)

    out = safe_join(
        features,
        clusters,
        join_type="left_outer",
        num_partitions=cfg.shuffle_partitions,
        on=("node",),
    )

    def _fill(t: pa.Table) -> pa.Table:
        filled = pa.compute.coalesce(t["cluster"], t["node"].cast(t["cluster"].type))
        idx = t.column_names.index("cluster")
        return t.set_column(idx, "cluster", filled)

    return out.map_batches(_fill, batch_format="pyarrow")


def _input_fingerprint(corpus) -> str:
    """Cheap input identity for PATH corpora: file names + sizes + mtimes
    (metadata stat only, no data read). Folded into the checkpoint gate so a
    changed or extended input INVALIDATES existing checkpoints — resuming
    against different data and silently returning stale clusters is the
    failure mode this guards. For in-memory Datasets (lazy, no stable cheap
    identity) returns a constant: there the config hash alone gates, and the
    caller owns input identity."""
    import hashlib
    import os

    if not isinstance(corpus, str):
        return "ds"
    h = hashlib.sha256()
    if os.path.isdir(corpus):
        files = []
        for root, _, names in os.walk(corpus):
            files.extend(os.path.join(root, n) for n in names)
        files.sort()
    elif os.path.exists(corpus):
        files = [corpus]
    else:  # remote URI: no local stat — path identity only
        return hashlib.sha256(corpus.encode()).hexdigest()[:16]
    for f in files:
        st = os.stat(f)
        rel = os.path.relpath(f, corpus) if os.path.isdir(corpus) else f
        h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def link_dataset(corpus, cfg: LinkageConfig | None = None, checkpoint_dir: str | None = None):
    """Corpus Dataset/path -> Dataset(row_id, repo, path, lang, sha256, node, cluster).

    The returned Dataset is lazy; consume with write_parquet / iter_batches.
    """
    cfg = cfg or LinkageConfig()
    ckpt = CheckpointManager(
        checkpoint_dir, cfg.config_hash() + "-" + _input_fingerprint(corpus)
    )

    ds = read_corpus(corpus)
    feats = ckpt.run(
        "features", ["input"], lambda: featurize(fingerprint(ds), cfg)
    )

    # size shuffle partitions to the row volume (capped by
    # cfg.shuffle_partitions, which callers set to ~the CPU count): reduce
    # parallelism then grows with both data AND workers, while tiny inputs
    # avoid paying per-partition spin-up. (Partition count never affects
    # results — cluster ids are min-node.)
    import dataclasses

    n_rows = feats.count()
    # 10k rows/partition: at the 375k bench corpus this reaches the full
    # 32-CPU cap (20k capped reduce parallelism at 19 of 32 slots — the
    # exchange reduce wave was the stage pinning 8->32 scaling)
    eff_parts = max(4, min(cfg.shuffle_partitions, -(-n_rows // 10_000)))
    cfg = dataclasses.replace(cfg, shuffle_partitions=eff_parts)

    def _edges():
        # the whole blocking section lives INSIDE the closure so a resumed
        # run with a complete 'edges' checkpoint never re-executes pair
        # generation (historically ~70% of wall time)
        from ..stages.scoring import prepare_score_pack

        # blocking reads only (node, sig) from the rep rows — projecting at
        # the rep filter keeps the emb/tokseq payloads out of that copy; the
        # broadcast plan also hands back the filter itself so blocking can
        # fuse it into its exchange split tasks (zero intermediate writes
        # between the materialized feature blocks and the band shards)
        _tagged, reps, exact_edges, rep_filter = exact_collapse(
            feats, cfg, rep_cols=("node", "sig"), return_rep_filter=True
        )
        # launch the scoring broadcast-pack build NOW: it depends only on
        # feats, so its pack/sort tasks overlap the whole blocking section
        # instead of stalling the driver between pairs and scoring
        from ..stages.common import effective_broadcast_rows

        pack = (prepare_score_pack(feats, cfg)
                if n_rows <= effective_broadcast_rows(cfg.broadcast_feature_rows)
                else None)
        # pairs are compact (24 B/row); pinning lets us cheaply detect the
        # no-candidates case — a zero-block dataset entering a hash join
        # loses its schema and crashes acero with 0-column partitions
        pairs = (
            lsh_candidate_pairs(feats, cfg, pre_filter=rep_filter)
            if rep_filter is not None
            else lsh_candidate_pairs(reps, cfg)
        ).materialize()
        if pairs.count() == 0:
            return filter_edges(exact_edges, cfg)
        lsh_edges = score_edges(pairs, feats, cfg, pack=pack)
        return filter_edges(exact_edges.union(lsh_edges), cfg)

    edges = ckpt.run("edges", ["features"], _edges)

    clusters = ckpt.run(
        "clusters",
        ["edges"],
        lambda: connected_components(edges, cfg),
    )

    keep = ["row_id", *[c for c in cfg.passthrough_cols], "sha256", "node"]
    slim = feats.map_batches(
        lambda t: t.select([c for c in keep if c in t.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = attach_clusters(slim, clusters, cfg)
    if checkpoint_dir:
        out = ckpt.run("linked", ["features", "clusters"], lambda: out)
    return out


def verify_sha256(linked, corpus, cfg: LinkageConfig | None = None) -> int:
    """The end-to-end invariant: every output row's sha256 equals a fresh
    sha256(content) of its input row. Returns the number of violations (0 =
    pass); computed as a distributed join, never a driver materialization."""
    cfg = cfg or LinkageConfig()
    fresh = fingerprint(read_corpus(corpus)).map_batches(
        lambda t: t.select(["row_id", "sha256"]).rename_columns(["row_id", "sha256_fresh"]),
        batch_format="pyarrow",
    )
    joined = safe_join(
        linked, fresh, join_type="inner", num_partitions=cfg.shuffle_partitions, on=("row_id",)
    )
    return joined.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["sha256"], t["sha256_fresh"])),
        batch_format="pyarrow",
    ).count()
