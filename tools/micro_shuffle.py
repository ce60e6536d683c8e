"""Micro-benchmark: why do shuffle/map stages slow down at higher num_cpus
on one node? Isolates three primitives over a synthetic 12M-row 16-byte table:

  map+mat   : map_batches(identity) -> materialize
  pagg      : partitioned_aggregate(count,min) -> materialize
  groupby   : groupby(__part).map_groups(identity) -> materialize

    python tools/micro_shuffle.py 8
    python tools/micro_shuffle.py 32
"""
import json
import sys
import time

import numpy as np
import pyarrow as pa
import ray


def main(ncpu: int) -> None:
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from entity_linking_ray.stages.common import partitioned_aggregate

    n = 12_000_000
    rng = np.random.default_rng(0)
    keys = rng.integers(0, n, n, dtype=np.int64)
    nodes = rng.integers(0, 1 << 62, n, dtype=np.int64)
    t = pa.table({"band_key": keys, "node": nodes})
    ds = ray.data.from_arrow(t).materialize()
    out = {"ncpu": ncpu, "blocks": ds.num_blocks()}

    t0 = time.time()
    m = ds.map_batches(lambda b: b, batch_format="pyarrow").materialize()
    out["map_mat"] = round(time.time() - t0, 2)
    out["map_blocks"] = m.num_blocks()

    t0 = time.time()
    partitioned_aggregate(
        ds, ["band_key"], [("node", "count", "c"), ("node", "min", "m")],
        num_partitions=8).materialize()
    out["pagg8"] = round(time.time() - t0, 2)

    t0 = time.time()
    ds.map_batches(
        lambda b: b.append_column(
            "__part", pa.array((b.column("band_key").to_numpy() % 8))),
        batch_format="pyarrow",
    ).groupby("__part").map_groups(
        lambda b: b, batch_format="pyarrow").materialize()
    out["groupby8"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
