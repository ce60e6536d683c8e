"""Ingest fingerprinting: row identity + the sha256 end-to-end invariant.

Stateless ``map_batches`` over zero-copy Arrow. Adds, per row:
- ``row_id``   16-hex stable id from (repo, path, commit) — the key column that
               travels through every stage (the reference instead relies on
               positional id<->vector alignment, compute_embeddings.py:64-75,
               which is forbidden here).
- ``node``     uint64 numeric id for clustering aggregates.
- ``sha256``   sha256(content) hex — preserved and re-verified at the sink.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.hashing import hex16_to_node, row_id_hex, sha256_hex_and_words


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    commits = batch.column("commit").to_pylist()
    contents = batch.column("content").to_pylist()
    rid = row_id_hex(repos, paths, commits)
    batch = batch.append_column("row_id", pa.array(rid, type=pa.string()))
    batch = batch.append_column("node", pa.array(hex16_to_node(rid)))
    # one digest pass yields both the hex invariant column and the packed
    # 63-bit key words exact_collapse groups on (no re-hash, no hex parse)
    sha_hex, words = sha256_hex_and_words(contents)
    batch = batch.append_column("sha256", pa.array(sha_hex, type=pa.string()))
    for i in range(4):
        batch = batch.append_column(f"sha_k{i}", pa.array(words[:, i]))
    return batch


def fingerprint(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
