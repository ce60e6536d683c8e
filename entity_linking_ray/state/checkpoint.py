"""Stage checkpointing: partitioned Parquet + per-stage manifest = resume.

Each checkpointed stage writes its output as a directory of Parquet part files
plus a ``_MANIFEST.json`` recording stage name, config hash, upstream lineage,
row count, per-file metrics and wall time. A rerun with the same config hash
skips the stage and reads the Parquet back (``read_parquet`` restores
file-level parallelism); any config change invalidates downstream manifests by
hash mismatch. Writes are atomic: data lands in ``<dir>.tmp`` and is renamed
into place before the manifest is written, so a killed run never leaves a
half-complete directory that looks finished — this is the kill-and-resume
contract tested in tests/test_resume.py.

Reference analog: the reference checkpoints only model weights
(/root/reference/src/train_zeshel.py:44-51); per-stage data checkpointing with
lineage is the north rule's addition.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data


MANIFEST = "_MANIFEST.json"


class CheckpointManager:
    def __init__(self, root: str | None, config_hash: str):
        self.root = root
        self.config_hash = config_hash

    def _dir(self, stage: str) -> str:
        assert self.root is not None
        return os.path.join(self.root, stage)

    def load(self, stage: str):
        """Return a Dataset for a completed stage, or None."""
        if self.root is None:
            return None
        d = self._dir(stage)
        mpath = os.path.join(d, MANIFEST)
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            manifest = json.load(f)
        if manifest.get("config_hash") != self.config_hash or not manifest.get("complete"):
            return None
        return ray.data.read_parquet(d, file_extensions=["parquet"])

    def save(self, stage: str, ds, upstream: list[str], metrics: dict | None = None):
        """Write ds to the stage dir atomically; return the re-read Dataset."""
        if self.root is None:
            return ds
        d = self._dir(stage)
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.time()
        ds.write_parquet(tmp)
        # only displace the previous complete checkpoint once the tmp write
        # has fully landed: a crash mid-write must leave the old stage dir
        # (and its manifest) reusable, not force a recompute
        shutil.rmtree(d, ignore_errors=True)
        os.replace(tmp, d)
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        import pyarrow.parquet as pq

        per_file = []
        total = 0
        for f in files:
            md = pq.read_metadata(os.path.join(d, f))
            per_file.append({"file": f, "rows": md.num_rows})
            total += md.num_rows
        manifest = {
            "stage": stage,
            "config_hash": self.config_hash,
            "upstream": upstream,
            "row_count": total,
            "partitions": per_file,
            "wall_time_sec": round(time.time() - t0, 3),
            "metrics": metrics or {},
            "complete": True,
        }
        with open(os.path.join(d, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
        return ray.data.read_parquet(d, file_extensions=["parquet"])

    def run_partitioned(self, stage: str, key_col: str, key_values,
                        fn_for_key):
        """Key-partitioned resumable sink: one subdirectory (and manifest)
        per key value — the '100-TB output contract': a failed run re-runs
        ONLY the partitions whose manifest is missing/incomplete, never the
        finished ones. ``fn_for_key(value) -> Dataset`` computes one
        partition; returns {value: Dataset} of all partitions (loaded or
        computed). Partition subdirs are plain Parquet: any reader can take
        the output without this engine."""
        out = {}
        for v in key_values:
            sub = f"{stage}/{key_col}={v}"
            cached = self.load(sub)
            if cached is not None:
                out[v] = cached
                continue
            out[v] = self.save(sub, fn_for_key(v), upstream=[stage])
        return out

    def run(self, stage: str, upstream: list[str], fn):
        """load-or-compute: the resume primitive every pipeline stage uses.

        Without a checkpoint root, the stage output is pinned in the object
        store instead (``materialize``): every checkpointed stage is a compact,
        multiply-consumed intermediate (features / edges / clusters — content
        is long gone), and leaving it lazy would re-execute the whole upstream
        DAG once per consumer.
        """
        cached = self.load(stage)
        if cached is not None:
            return cached
        out = fn()
        if self.root is None:
            return out.materialize()
        return self.save(stage, out, upstream)
