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
from ..stages.blocking import block_stats, candidate_pairs, explode_bands, filter_and_salt
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
    """features ⟕ clusters; rows in no component cluster to themselves."""
    if clusters.count() == 0:
        # all-singletons corpus: a join against an empty right side crashes
        # acero (0-column partitions) — just label every row with itself
        return features.map_batches(
            lambda t: t.append_column("cluster", t.column("node")),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
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


def link_dataset(corpus, cfg: LinkageConfig | None = None, checkpoint_dir: str | None = None):
    """Corpus Dataset/path -> Dataset(row_id, repo, path, lang, sha256, node, cluster).

    The returned Dataset is lazy; consume with write_parquet / iter_batches.
    """
    cfg = cfg or LinkageConfig()
    ckpt = CheckpointManager(checkpoint_dir, cfg.config_hash())

    ds = read_corpus(corpus)
    feats = ckpt.run(
        "features", ["input"], lambda: featurize(fingerprint(ds), cfg)
    )

    # size shuffle partitions to the actual row volume: each hash-shuffle
    # partition costs an aggregator actor per operator, which dominates wall
    # time on small inputs; cfg.shuffle_partitions stays the ceiling at scale.
    # (Partition count never affects results — cluster ids are min-node.)
    import dataclasses

    n_rows = feats.count()
    eff_parts = max(4, min(cfg.shuffle_partitions, -(-n_rows // 50_000)))
    cfg = dataclasses.replace(cfg, shuffle_partitions=eff_parts)

    tagged, reps, exact_edges = exact_collapse(feats, cfg)

    # band rows and stats are consumed by several lazy consumers (stats pass,
    # broadcast filter, salting) — pin the tiny 16-byte rows once
    band_rows = explode_bands(reps, cfg).materialize()
    stats = block_stats(band_rows).materialize()
    salted, n_hot = filter_and_salt(band_rows, stats, cfg)
    # pairs are compact (24 B/row); pinning lets us cheaply detect the
    # no-candidates case — a zero-block dataset entering a hash join loses its
    # schema and crashes acero with 0-column partitions
    pairs = candidate_pairs(salted, cfg).materialize()

    def _edges():
        if pairs.count() == 0:
            return filter_edges(exact_edges, cfg)
        lsh_edges = score_edges(pairs, feats, cfg)
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
